package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the JPEG frame-header walk.
  *
  * PNG dimensions live at FIXED offsets (IHDR is mandated first), so
  * the declarative substr/hex/conv chain in
  * [[graft.ops.Multimodal.mediaHeaderDims]] covers them. JPEG puts its
  * SOF frame header behind a variable number of variable-length
  * segments — a DATA-DEPENDENT walk. Expressing that walk as an
  * unrolled nested-when blows up exponentially (each level re-inlines
  * the running offset ~7×; depth 16 ≈ 7¹⁶ nodes hung Catalyst
  * analysis), so the walk is what the custom-expression tier is FOR: a
  * tight compiled loop with `doGenCode`, whole-stage-codegen'd like
  * [[DotProduct]]. */
object MediaOps {

  /** [w, h] from the first JPEG SOF segment, NULL when `bin` is not a
    * JPEG or the walk fails (truncated/corrupt header). */
  def jpegSofDims(bin: Column): Column =
    GraftExpressionBridge.column(
      JpegSofDims(GraftExpressionBridge.expression(bin)))

  /** EXIF orientation (1–8) from a JPEG's APP1/Exif TIFF IFD0, NULL
    * when `bin` is not a JPEG, carries no Exif APP1, or the Exif holds
    * no orientation tag. Same compiled-walk tier as [[jpegSofDims]]:
    * the APP1 position is data-dependent AND the TIFF entry table
    * inside it is a second data-dependent walk (endianness switch +
    * variable IFD offset + entry scan), far past what an unrolled
    * when-chain can express. */
  def jpegExifOrientation(bin: Column): Column =
    GraftExpressionBridge.column(
      JpegExifOrientation(GraftExpressionBridge.expression(bin)))
}

/** The ITU T.81 segment walk: SOI, then [FF][marker][len₂][payload]
  * segments until a SOF marker (C0–CF minus DHT C4 / JPG C8 / DAC CC),
  * whose payload is len₂ | precision₁ | height₂ | width₂. Bounded at 64
  * segments — far past any real header — so a corrupt length field can
  * never loop. */
case class JpegSofDims(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_jpeg_sof"

  override protected def nullSafeEval(input: Any): Any = {
    val r = JpegSofDims.scan(input.asInstanceOf[Array[Byte]])
    if (r == null) null else new GenericArrayData(r)
  }

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val r = ctx.freshName("sof")
      s"""
         |long[] $r = graft.functions.JpegSofDims$$.MODULE$$.scan($x);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($r);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): JpegSofDims =
    copy(child = newChild)
}

/** The APP1/Exif orientation walk: JPEG segments to APP1, "Exif\0\0",
  * then the TIFF header (II/MM endianness + magic 42 + IFD0 offset)
  * and the IFD0 entry scan for tag 0x0112 (SHORT, count 1). An APP1
  * that is not Exif (XMP rides APP1 too), an Exif without the tag, or
  * a malformed TIFF inside an otherwise-valid JPEG all CONTINUE the
  * segment walk / fall through to NULL — only at SOS/EOI does the
  * search give up (Exif is defined to precede the scan data). Bounded
  * like [[JpegSofDims]]: 64 segments, 256 IFD entries. */
case class JpegExifOrientation(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_jpeg_exif_orientation"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    JpegExifOrientation.scan(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val r = ctx.freshName("ori")
      s"""
         |java.lang.Long $r = graft.functions.JpegExifOrientation$$.MODULE$$.scan($x);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): JpegExifOrientation =
    copy(child = newChild)
}

object JpegExifOrientation {
  /** Shared by eval and generated code: boxed orientation or null. */
  def scan(b: Array[Byte]): java.lang.Long = {
    @inline def u8(i: Int): Int = b(i) & 0xFF
    @inline def u16(i: Int): Int = ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
    if (b.length < 4 || u8(0) != 0xFF || u8(1) != 0xD8) return null
    var off = 2
    var steps = 0
    while (steps < 64 && off + 1 < b.length && u8(off) == 0xFF) {
      var m = off + 1
      while (m < b.length && u8(m) == 0xFF) m += 1 // T.81 fill bytes
      if (m >= b.length) return null
      val code = u8(m)
      if (code == 0x01 || (code >= 0xD0 && code <= 0xD8)) {
        off = m + 1 // standalone marker: no length field
      } else if (code == 0xD9 || code == 0x00 || code == 0xDA) {
        return null // EOI / stuffed byte / SOS: no Exif ahead of us
      } else {
        if (m + 2 >= b.length) return null
        val segLen = u16(m + 1)
        if (segLen < 2) return null
        val end = m + 1 + segLen // exclusive end of this segment
        if (code == 0xE1 && end <= b.length && segLen >= 2 + 6 + 8 + 2 &&
            u8(m + 3) == 'E' && u8(m + 4) == 'x' && u8(m + 5) == 'i' &&
            u8(m + 6) == 'f' && u8(m + 7) == 0 && u8(m + 8) == 0) {
          val ori = tiffOrientation(b, m + 9, end)
          if (ori != null) return ori
          // Exif without a (valid) orientation tag: keep walking — a
          // later APP1 cannot legally carry Exif, but falling through
          // to the loop's NULL is the same verdict either way
        }
        off = end
      }
      steps += 1
    }
    null
  }

  /** Orientation from the TIFF block at [t, end), or null. */
  private def tiffOrientation(b: Array[Byte], t: Int, end: Int): java.lang.Long = {
    @inline def u8(i: Int): Int = b(i) & 0xFF
    if (t + 8 > end) return null
    val le = u8(t) == 0x49 && u8(t + 1) == 0x49 // "II"
    val be = u8(t) == 0x4D && u8(t + 1) == 0x4D // "MM"
    if (!le && !be) return null
    @inline def u16e(i: Int): Int =
      if (le) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
    @inline def u32e(i: Int): Long =
      if (le) u8(i).toLong | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
      else (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) |
        (u8(i + 2).toLong << 8) | u8(i + 3).toLong
    if (u16e(t + 2) != 42) return null
    val ifdOff = u32e(t + 4)
    if (ifdOff < 8 || t + ifdOff + 2 > end) return null
    val ifd = t + ifdOff.toInt
    val n = math.min(u16e(ifd), 256)
    var e = 0
    while (e < n) {
      val ent = ifd + 2 + 12 * e
      if (ent + 12 > end) return null
      // tag 0x0112, type 3 (SHORT), count 1: value in the first two
      // bytes of the 4-byte value field, entry-local (no indirection)
      if (u16e(ent) == 0x0112 && u16e(ent + 2) == 3 && u32e(ent + 4) == 1L)
        return java.lang.Long.valueOf(u16e(ent + 8).toLong)
      e += 1
    }
    null
  }
}

object JpegSofDims {
  /** Shared by eval and generated code: Array(w, h) or null.
    *
    * Not every byte after an 0xFF is a length-prefixed segment (the r11
    * advice fix): T.81 §B.1.1.2 allows any number of 0xFF FILL bytes
    * before a marker code, and TEM (0x01), RST0–7 (0xD0–D7), and SOI
    * (0xD8) are STANDALONE markers with no length field — treating
    * either as length-prefixed misreads payload bytes as a length and
    * derails the walk, so a valid JPEG would return NULL and q75 would
    * silently fall back to its arithmetic stub. */
  def scan(b: Array[Byte]): Array[Long] = {
    @inline def u8(i: Int): Int = b(i) & 0xFF
    @inline def u16(i: Int): Int = ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
    if (b.length < 4 || u8(0) != 0xFF || u8(1) != 0xD8) return null
    var off = 2
    var steps = 0
    while (steps < 64 && off + 1 < b.length && u8(off) == 0xFF) {
      // skip spec-legal 0xFF fill/padding bytes: the marker code is the
      // first non-0xFF byte after the run
      var m = off + 1
      while (m < b.length && u8(m) == 0xFF) m += 1
      if (m >= b.length) return null
      val code = u8(m)
      val isSof = code >= 0xC0 && code <= 0xCF &&
        code != 0xC4 && code != 0xC8 && code != 0xCC
      if (isSof) {
        // SOF payload: len₂ | precision₁ | height₂ | width₂
        return if (m + 7 < b.length)
          Array(u16(m + 6).toLong, u16(m + 4).toLong)
        else null
      }
      if (code == 0x01 || (code >= 0xD0 && code <= 0xD8)) {
        off = m + 1 // standalone marker: no length field
      } else if (code == 0xD9 || code == 0x00) {
        return null // EOI before any SOF / stuffed byte: no frame header
      } else {
        if (m + 2 >= b.length) return null
        val segLen = u16(m + 1)
        if (segLen < 2) return null // corrupt length would stall the walk
        off = m + 1 + segLen
      }
      steps += 1
    }
    null
  }
}
