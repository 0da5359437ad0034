package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.chaining._
import graft.etl.Star.{round4, round4Sql}

/** Multimodal-column operators (driver-mandated north-star family,
  * SURVEY.md §7.6): media treated as opaque binary columns with typed
  * metadata, plus a typed imperative "decoder" path.
  *
  *  - q53: documents ⋈ embeddings — the text+vector multimodal join,
  *    exercising ArrayType access (dimension, L2 norm) alongside scalar
  *    metadata. At scale this is an equi-join on the id both tables are
  *    bucketed by.
  *  - q54: binary media metadata — the corpus text reinterpreted as an
  *    opaque binary payload: byte length, sha256 content fingerprint,
  *    64-byte frame count, and a "frame sample" (first 8 bytes of the
  *    first 3 frames, hex) — the deterministic stand-in for image/audio
  *    frame sampling (decode libs are absent by design; the Spark-side
  *    plumbing — binary column, per-row metadata, sampling shape — is real).
  *  - q55: the stubbed decoder as a *typed imperative* path: a
  *    `Dataset.mapPartitions` batch "feature extractor" (the Scala analog
  *    of a Pandas-UDF/mapInPandas stage — partition-at-a-time iterator,
  *    per-partition codec reuse), emitting an 8-dim fake feature vector
  *    derived from the payload's md5. Its DuckDB oracle recomputes the
  *    identical features declaratively, proving the imperative path
  *    equals the declarative spec.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  import org.apache.spark.sql.Column

  // -------------------------------------------------------------------------
  // Container-header parsing (r10 verdict item 5): real PNG/JPEG dimension
  // extraction as PURE Catalyst expressions over BinaryType — no UDF, no
  // decode library. Big-endian integer reads are substr+hex+conv chains
  // (codegen'd); the JPEG marker walk is a bounded unrolled when-chain.
  // -------------------------------------------------------------------------

  /** Big-endian u32 read from a binary column at 1-based `pos`
    * (substr+hex+conv — codegen'd builtins). */
  private def u32(bin: Column, pos: Int): Column =
    conv(hex(bin.substr(lit(pos), lit(4))), 16, 10).cast("long")

  private def u8(bin: Column, pos: Int): Column =
    conv(hex(bin.substr(lit(pos), lit(1))), 16, 10).cast("long")

  /** LITTLE-endian u16/u32 at 1-based `pos` — RIFF/WAV stores
    * multi-byte fields LE, so the reads compose from byte reads. */
  private def u16le(bin: Column, pos: Int): Column =
    u8(bin, pos) + u8(bin, pos + 1) * 256L
  private def u32le(bin: Column, pos: Int): Column =
    u8(bin, pos) + u8(bin, pos + 1) * 256L +
      u8(bin, pos + 2) * 65536L + u8(bin, pos + 3) * 16777216L

  /** Parse (fmt, sample_rate, channels, bits) from a canonical WAV
    * payload — RIFF at 0, WAVE at 8, and the `fmt ` chunk as the first
    * chunk (offset 12; channels LE u16 at 22, sample rate LE u32 at
    * 24, bits per sample LE u16 at 34 — all fixed offsets, so the
    * whole parse is declarative like the PNG IHDR read). NULL for
    * anything else, including a WAV whose first chunk isn't `fmt `
    * (the rare LIST-first layout would need a chunk walk — the
    * [[graft.functions.JpegSofDims]] tier; not planted here). The
    * audio rung of the multimodal header family: the corpus carries no
    * real audio, so the branch is proven on PLANTED RIFF bytes
    * (MediaHeaderSpec, the PII-regex precedent). */
  def mediaAudioMeta(media: Column): Column = {
    val isWav = length(media) >= 36 &&
      hex(media.substr(lit(1), lit(4))) === "52494646" && // "RIFF"
      hex(media.substr(lit(9), lit(4))) === "57415645" && // "WAVE"
      hex(media.substr(lit(13), lit(4))) === "666D7420" // "fmt "
    when(isWav, struct(lit("wav").as("fmt"),
      u32le(media, 25).as("sample_rate"),
      u16le(media, 23).as("channels"),
      u16le(media, 35).as("bits")))
      .otherwise(lit(null)
        .cast("struct<fmt:string,sample_rate:bigint,channels:bigint,bits:bigint>"))
  }

  /** Parse (fmt, us_per_frame, n_frames, duration_ms) from a canonical
    * AVI payload — the VIDEO rung of the multimodal header family
    * (r12 verdict item 7), declarative like the WAV parse because the
    * canonical layout is all fixed offsets: RIFF at 0, "AVI " at 8,
    * the mandated LIST/hdrl at 12, its first chunk `avih` at 24, then
    * dwMicroSecPerFrame (LE u32 at 32) and dwTotalFrames (LE u32 at
    * 48). duration_ms = usPerFrame·frames div 1000 — integer, both
    * engines agree exactly. NULL for anything else, including an AVI
    * whose hdrl isn't first (would need a chunk walk — the
    * [[graft.functions.JpegSofDims]] tier; not planted here). The
    * corpus carries no real video, so the branch is proven on PLANTED
    * RIFF bytes (MediaHeaderSpec, the WAV precedent). */
  def mediaVideoMeta(media: Column): Column = {
    val isAvi = length(media) >= 52 &&
      hex(media.substr(lit(1), lit(4))) === "52494646" && // "RIFF"
      hex(media.substr(lit(9), lit(4))) === "41564920" && // "AVI "
      hex(media.substr(lit(13), lit(4))) === "4C495354" && // "LIST"
      hex(media.substr(lit(21), lit(4))) === "6864726C" && // "hdrl"
      hex(media.substr(lit(25), lit(4))) === "61766968" // "avih"
    // exact integer division: subtract the remainder first so the
    // double division is of an exact multiple — valid only below 2^53,
    // so magic-spoofing junk whose u32 fields multiply past it (r13
    // review: 0xFFFFFFFF² wraps int64 AND breaks double exactness) is
    // rejected as malformed like any other corrupt header. The bound
    // is checked in double (exact enough for a threshold; the integer
    // product itself would already have wrapped). Real AVIs sit orders
    // of magnitude below it.
    val prod = u32le(media, 33) * u32le(media, 49)
    val prodInRange = u32le(media, 33).cast("double") *
      u32le(media, 49).cast("double") < 9.0e15
    when(isAvi && prodInRange, struct(lit("avi").as("fmt"),
      u32le(media, 33).as("us_per_frame"),
      u32le(media, 49).as("n_frames"),
      ((prod - pmod(prod, lit(1000L))) / lit(1000L)).cast("long")
        .as("duration_ms")))
      .otherwise(lit(null).cast(
        "struct<fmt:string,us_per_frame:bigint,n_frames:bigint,duration_ms:bigint>"))
  }

  /** Parse (fmt, w, h) from a media payload's container header:
    *  - PNG: 8-byte signature, then the IHDR chunk is mandated first —
    *    width/height are the big-endian u32s at FIXED byte offsets
    *    16/20, read declaratively.
    *  - GIF: "GIF87a"/"GIF89a" signature, then the logical screen
    *    descriptor's width/height as LITTLE-endian u16s at fixed
    *    offsets 6/8 — the one image format here whose dims are LE
    *    (the WAV/AVI byte-read composition, r13: verdict-item-7
    *    surface growth; proven on planted bytes like the others).
    *  - JPEG: FFD8 SOI, then the segment walk to the SOF frame header —
    *    data-dependent offsets, so it's the native compiled loop
    *    [[graft.functions.MediaOps.jpegSofDims]] (an unrolled
    *    when-chain grows exponentially; see that scaladoc).
    * NULL struct for anything else (including truncated headers): the
    * caller decides the fallback. This is the production path of the
    * q75 resize planner — header reads are a few hundred bytes of the
    * blob, so at 100 TB the planner touches headers, never pixels. */
  def mediaHeaderDims(media: Column): Column = {
    val isPng = length(media) >= 24 &&
      hex(media.substr(lit(1), lit(8))) === "89504E470D0A1A0A"
    val isGif = length(media) >= 10 &&
      hex(media.substr(lit(1), lit(4))) === "47494638" && // "GIF8"
      (hex(media.substr(lit(5), lit(2))) === "3761" || // "7a"
        hex(media.substr(lit(5), lit(2))) === "3961") // "9a"
    val sof = graft.functions.MediaOps.jpegSofDims(media)
    when(isPng, struct(lit("png").as("fmt"),
      u32(media, 17).as("w"), u32(media, 21).as("h")))
      .when(isGif, struct(lit("gif").as("fmt"),
        u16le(media, 7).as("w"), u16le(media, 9).as("h")))
      .when(sof.isNotNull, struct(lit("jpeg").as("fmt"),
        element_at(sof, 1).as("w"), element_at(sof, 2).as("h")))
      .otherwise(lit(null).cast("struct<fmt:string,w:bigint,h:bigint>"))
  }

  /** q53: multimodal join of text metadata with its embedding row. */
  val q53_multimodal_join: Q = (s, d) => {
    val docs = s.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val embs = s.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("label").cast("long").as("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("emb_dim", size(col("v")).cast("long"))
      .withColumn("emb_norm", round4(graft.functions.VectorOps.norm(col("v"))))
    docs.join(embs, col("doc_id") === col("vec_id"))
      .select("doc_id", "lang", "n_chars", "label", "emb_dim", "emb_norm")
      .orderBy("doc_id")
  }

  /** q54: opaque-binary media metadata + deterministic frame sampling. */
  val q54_media_meta: Q = (s, d) => {
    val media = col("text").cast("binary")
    val hexStr = lower(hex(media))
    val frames = (0 until 3).map(i => substring(hexStr, 128 * i + 1, 16))
    s.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"),
        length(media).cast("long").as("byte_len"),
        sha2(media, 256).as("sha"),
        ceil(length(media).cast("double") / 64.0).cast("long").as("n_frames"),
        concat_ws(",", frames: _*).as("frame_sample"))
      .orderBy("doc_id")
  }

  /** The stubbed media "decoder": batch feature extraction over binary
    * payloads via mapPartitions (typed imperative path; per-partition
    * digest reuse = the codec-initialization batch shape of a real
    * image/audio decoder behind a Pandas UDF). Feature i of a payload =
    * hexdigit(md5, 2i) / 15, rounded to 4 decimals. */
  def decodeFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        // one digest instance per partition — the "decoder init" analog
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { case (id, text) =>
          md.reset()
          val hex = md.digest(text.getBytes("UTF-8"))
            .map(b => f"$b%02x").mkString
          (0 until 8).map { i =>
            val v = Character.digit(hex.charAt(2 * i), 16) / 15.0
            (id, i.toLong, math.floor(v * 10000 + 0.5) / 10000)
          }
        }
      }
      .toDF("doc_id", "feature_idx", "feature")
  }

  /** q55: the mapPartitions decoder, oracle-checked against a declarative
    * recomputation of the same features. */
  val q55_media_features: Q = (s, d) =>
    decodeFeatures(s, s.read.parquet(s"$d/documents.parquet"))
      .orderBy("doc_id", "feature_idx")

  /** q75: resize planning — the metadata half of an image-resize stage.
    * Source dimensions come from the CONTAINER HEADER when the payload
    * is a real PNG/JPEG ([[mediaHeaderDims]] — the production path: a
    * header read touches a few hundred bytes, never pixels), falling
    * back to the deterministic arithmetic stand-in for payloads that
    * are not containers. The aspect-preserving fit into 224×224 plus
    * the ViT-style 16×16 patch count are pure integer arithmetic
    * (identical `div` semantics in both engines — no float scale
    * factors). The pixel work itself belongs in the q55-style
    * mapPartitions decoder; THIS is the part that drives partitioning
    * and batch-size planning at scale, and it is fully declarative.
    *
    * Gate note: the driver corpus is ASCII text reinterpreted as bytes
    * — no payload can start with 0x89/0xFF, so the header branch is
    * provably never taken there and the DuckDB oracle mirrors only the
    * arithmetic fallback; the header branch is proven on PLANTED real
    * PNG/JPEG bytes in MediaHeaderSpec (the PII-regex precedent). */
  val q75_media_resize: Q = (s, d) => {
    val df0 = s.read.parquet(s"$d/documents.parquet")
    // a real multimodal table carries its payload as a BINARY `media`
    // column; the driver corpus has none, so its text is reinterpreted
    // as the opaque payload (the q54 convention — note a string→binary
    // cast goes through UTF-8, which is exactly why real media must
    // live in a binary column, never a string one)
    val media = if (df0.schema.fields.exists(f => f.name == "media" &&
        f.dataType == org.apache.spark.sql.types.BinaryType)) col("media")
      else col("text").cast("binary")
    val hdr = mediaHeaderDims(col("m"))
    df0.select(col("doc_id"), media.as("m"),
        length(media).cast("long").as("byte_len"))
      .withColumn("src_w", coalesce(hdr.getField("w"),
        lit(64L) + pmod(col("byte_len"), lit(1920L))))
      .withColumn("src_h", coalesce(hdr.getField("h"),
        lit(64L) + pmod(expr("byte_len div 7"), lit(1080L))))
      .drop("m")
      .withColumn("dst_w", when(col("src_w") >= col("src_h"), lit(224L))
        .otherwise(greatest(lit(1L), expr("(src_w * 224) div src_h"))))
      .withColumn("dst_h", when(col("src_w") >= col("src_h"),
        greatest(lit(1L), expr("(src_h * 224) div src_w"))).otherwise(lit(224L)))
      .withColumn("n_patches", expr("((dst_w + 15) div 16) * ((dst_h + 15) div 16)"))
      .select("doc_id", "src_w", "src_h", "dst_w", "dst_h", "n_patches")
      .orderBy("doc_id")
  }

  /** q129: content-addressable media dedup — the storage-side dedup a
    * 100 TB multimodal corpus does FIRST, before any feature work: media
    * blobs are identified by their sha256 (the content-addressable-store
    * key, q54's fingerprint), and per source the report prices what
    * CAS layout saves: references vs distinct blobs, raw bytes vs
    * unique bytes, and the reclaimable difference. Scale shape: one
    * shuffle on (source, sha) for the distinct — the 32-byte hash, never
    * the blob bytes — then source-sized aggregates; equal hashes imply
    * equal payloads so blob size rides the distinct for free. */
  val q129_media_dedup: Q = (s, d) => {
    val media = col("text").cast("binary")
    // raw sha = the storage CAS key (byte-identical payloads); canonical
    // sha = the hash AFTER canonicalization (here the text-normalization
    // stand-in for decode-and-canonicalize: whitespace/case here, JPEG
    // re-compressions in real media). On THIS corpus every payload is
    // unique at both rungs (the synthetic docs duplicate spans, never
    // whole payloads), so all reclaimable counters are honestly zero at
    // the gate — the classification math itself (refs vs blobs vs
    // canonical groups, per-group representative byte accounting) is
    // exercised on planted duplicate/re-encoded blobs in
    // TrainingDataSpec, the PII-regex precedent.
    // checkpointed: four aggregations (refs + canon, two scopes) would
    // otherwise each rescan the corpus and recompute both digests
    val blobs = s.read.parquet(s"$d/documents.parquet")
      .select(col("source"), sha2(media, 256).as("sha"),
        sha2(graft.ops.TextCore.normCol(col("text")).cast("binary"), 256).as("csha"),
        length(media).cast("long").as("bytes"))
      .pipe(graft.Ckpt.eager)
    def scoped(b: DataFrame) = {
      val refs = b.groupBy("source").agg(
        count(lit(1)).as("n_refs"),
        countDistinct("sha").as("n_blobs"),
        countDistinct("csha").as("n_canonical"),
        sum("bytes").as("total_bytes"))
      // one deterministic representative per canonical group (min raw
      // sha); what its copies occupy beyond it is reclaimable
      val canon = b.groupBy("source", "csha")
        .agg(sum("bytes").as("grp_bytes"),
          min(struct(col("sha"), col("bytes"))).getField("bytes").as("rep_bytes"))
        .groupBy("source")
        .agg(sum(col("grp_bytes") - col("rep_bytes")).as("canon_reclaimable_bytes"))
      refs.join(canon, "source")
    }
    scoped(blobs)
      .unionByName(scoped(blobs.withColumn("source", lit("_all"))))
      .orderBy("source")
  }

  /** q180: EXIF-orientation-aware resize planning, gated on a
    * CONSTRUCTED-JPEG ROUNDTRIP (the q49 write-then-read proof shape
    * applied to the header walks): both engines derive per-document
    * geometry from doc_id, Spark then BUILDS a real JPEG carrying it —
    * SOI, doc-varying 0xFF fill bytes, an APP1/Exif TIFF IFD0 with the
    * orientation tag (alternating big/little-endian per doc), a
    * doc-varying-length COM padding segment, then SOF0 with the
    * dimensions — and re-extracts everything through the PRODUCTION
    * parsers ([[graft.functions.MediaOps.jpegExifOrientation]] +
    * [[mediaHeaderDims]]'s SOF walk). The oracle replays only the
    * generator formulas, so the gate passes iff construct→parse is the
    * identity for every document — both endiannesses, every fill-run
    * length, every segment offset the corpus ids produce (the planted-
    * fixture MediaHeaderSpec proves the walks on hand-built corrupt/
    * edge bytes; THIS proves them at corpus scale inside the gate).
    * eff_w/eff_h apply the orientation: values 5–8 transpose, which is
    * exactly what a resize planner must honor before computing the fit
    * (a 90°-rotated portrait shot fit as landscape ships every pixel
    * wrong). Scale shape: pure map-side expression work — no shuffle
    * but the final orderBy. */
  val q180_exif_resize: Q = (s, d) => {
    def be16(x: Column): Column = lpad(lower(hex(x)), 4, "0")
    val base = s.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"),
        (lit(1L) + pmod(col("doc_id"), lit(8L))).as("ori"),
        (lit(100L) + pmod(col("doc_id"), lit(97L))).as("w"),
        (lit(80L) + pmod(col("doc_id"), lit(53L))).as("h"),
        pmod(col("doc_id"), lit(17L)).as("pad"),
        pmod(col("doc_id"), lit(3L)).as("nf"))
    // TIFF block (26 bytes): header, 1-entry IFD0 (tag 0x0112 SHORT×1),
    // no next IFD — big-endian for even docs, little-endian for odd
    val tiff = when(pmod(col("doc_id"), lit(2L)) === 0L,
      concat(lit("4d4d002a00000008"), lit("0001"),
        lit("0112"), lit("0003"), lit("00000001"),
        be16(col("ori")), lit("0000"), lit("00000000")))
      .otherwise(
        concat(lit("49492a0008000000"), lit("0100"),
          lit("1201"), lit("0300"), lit("01000000"),
          lpad(lower(hex(col("ori"))), 2, "0"), lit("000000"), lit("00000000")))
    val payload = unhex(concat(
      lit("ffd8"), // SOI
      expr("repeat('ff', CAST(nf AS INT))"), // T.81 fill bytes before the marker
      lit("ffe1"), lit("0022"), lit("457869660000"), tiff, // APP1/Exif
      lit("fffe"), be16(col("pad") + 2L), expr("repeat('00', CAST(pad AS INT))"), // COM
      lit("ffc0"), lit("0011"), lit("08"), be16(col("h")), be16(col("w")),
      lit("03"), lit("011100"), lit("021101"), lit("031101"))) // SOF0
    val hdr = mediaHeaderDims(col("media"))
    base.withColumn("media", payload)
      .select(col("doc_id"),
        graft.functions.MediaOps.jpegExifOrientation(col("media")).as("orientation"),
        hdr.getField("w").as("src_w"), hdr.getField("h").as("src_h"))
      .withColumn("eff_w",
        when(col("orientation") >= 5L, col("src_h")).otherwise(col("src_w")))
      .withColumn("eff_h",
        when(col("orientation") >= 5L, col("src_w")).otherwise(col("src_h")))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q180_exif_resize" -> q180_exif_resize,
    "q53_multimodal_join" -> q53_multimodal_join,
    "q54_media_meta" -> q54_media_meta,
    "q55_media_features" -> q55_media_features,
    "q75_media_resize" -> q75_media_resize,
    "q129_media_dedup" -> q129_media_dedup)

  val oracle: Map[String, String] = Map(
    // the generator formulas ONLY — Spark must roundtrip them through
    // real constructed JPEG bytes and the production header walks
    "q180_exif_resize" ->
      """WITH g AS (
        |  SELECT doc_id,
        |         CAST(1 + doc_id % 8 AS BIGINT) AS orientation,
        |         CAST(100 + doc_id % 97 AS BIGINT) AS src_w,
        |         CAST(80 + doc_id % 53 AS BIGINT) AS src_h
        |  FROM documents)
        |SELECT doc_id, orientation, src_w, src_h,
        |       CASE WHEN orientation >= 5 THEN src_h ELSE src_w END AS eff_w,
        |       CASE WHEN orientation >= 5 THEN src_w ELSE src_h END AS eff_h
        |FROM g ORDER BY doc_id""".stripMargin,
    "q129_media_dedup" ->
      """WITH raw AS (
        |  SELECT source, sha256(text) AS sha,
        |         sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS csha,
        |         CAST(octet_length(encode(text)) AS BIGINT) AS bytes
        |  FROM documents),
        |blobs AS (
        |  SELECT * FROM raw
        |  UNION ALL SELECT '_all' AS source, sha, csha, bytes FROM raw),
        |refs AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_refs,
        |         CAST(count(DISTINCT sha) AS BIGINT) AS n_blobs,
        |         CAST(count(DISTINCT csha) AS BIGINT) AS n_canonical,
        |         CAST(sum(bytes) AS BIGINT) AS total_bytes
        |  FROM blobs GROUP BY source),
        |grp AS (
        |  SELECT source, csha, CAST(sum(bytes) AS BIGINT) AS grp_bytes,
        |         arg_min(bytes, sha) AS rep_bytes
        |  FROM blobs GROUP BY source, csha),
        |canon AS (
        |  SELECT source, CAST(sum(grp_bytes - rep_bytes) AS BIGINT)
        |           AS canon_reclaimable_bytes
        |  FROM grp GROUP BY source)
        |SELECT refs.source, n_refs, n_blobs, n_canonical, total_bytes,
        |       canon_reclaimable_bytes
        |FROM refs JOIN canon USING (source) ORDER BY source""".stripMargin,
    "q53_multimodal_join" ->
      s"""SELECT doc_id, lang, n_chars, CAST(label AS BIGINT) AS label,
         |       CAST(len(embedding) AS BIGINT) AS emb_dim,
         |       ${round4Sql("sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))")} AS emb_norm
         |FROM documents JOIN embeddings ON doc_id = vec_id
         |ORDER BY doc_id""".stripMargin,
    "q54_media_meta" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |       sha256(text) AS sha,
        |       CAST(ceil(CAST(octet_length(encode(text)) AS DOUBLE) / 64.0) AS BIGINT) AS n_frames,
        |       concat_ws(',', substr(lower(hex(encode(text))), 1, 16),
        |                      substr(lower(hex(encode(text))), 129, 16),
        |                      substr(lower(hex(encode(text))), 257, 16)) AS frame_sample
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q55_media_features" ->
      """SELECT doc_id, CAST(i AS BIGINT) AS feature_idx,
        |       floor((CAST(instr('0123456789abcdef',
        |                         substr(md5(text), CAST(2*i+1 AS INT), 1)) - 1 AS DOUBLE)
        |              / 15.0) * 10000 + 0.5) / 10000 AS feature
        |FROM documents, (SELECT unnest(range(0, 8)) AS i)
        |ORDER BY doc_id, feature_idx""".stripMargin,
    "q75_media_resize" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
        |  FROM documents),
        |src AS (
        |  SELECT doc_id, byte_len,
        |         64 + byte_len % 1920 AS src_w,
        |         64 + (byte_len // 7) % 1080 AS src_h
        |  FROM m),
        |dst AS (
        |  SELECT doc_id, byte_len, src_w, src_h,
        |         CASE WHEN src_w >= src_h THEN 224
        |              ELSE greatest(1, (src_w * 224) // src_h) END AS dst_w,
        |         CASE WHEN src_w >= src_h THEN greatest(1, (src_h * 224) // src_w)
        |              ELSE 224 END AS dst_h
        |  FROM src)
        |SELECT doc_id,
        |       CAST(src_w AS BIGINT) AS src_w, CAST(src_h AS BIGINT) AS src_h,
        |       CAST(dst_w AS BIGINT) AS dst_w, CAST(dst_h AS BIGINT) AS dst_h,
        |       CAST(((dst_w + 15) // 16) * ((dst_h + 15) // 16) AS BIGINT) AS n_patches
        |FROM dst ORDER BY doc_id""".stripMargin)
}
