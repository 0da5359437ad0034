package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TextExtract

/** The reference transcript grammar (FIXTURES.md §1, ETL_FINAL.py:149-192)
  * parsed by the declarative extractor: header fields with parse-miss
  * defaults, row-multiplying course lines, the positional tahap predicate,
  * and the [GAGAL] quarantine split. */
class TextExtractSpec extends AnyFunSuite with SparkTestBase {

  private val goodDoc =
    """NRP / Nama 5026231079 / Kevin Nathanael SKS Tempuh / SKS Lulus 84 / 84
      |IPK 3.72
      |Status Aktif ---
      |Tahap: Persiapan
      |SM234201 Kalkulus 2 3 2023/Gn/A A
      |ES234101 Pengantar Sistem Informasi 4 2023/Gs/B AB
      |Total Sks Tahap Persiapan : 36
      |IP Tahap Persiapan : 3.80
      |Tahap: Sarjana
      |ES234501 Basis Data 4 2024/Gs/C B
      |Total Sks Tahap Sarjana : 48
      |IP Tahap Sarjana : 3.65""".stripMargin

  private val badDoc = "this page contains no transcript at all"

  private lazy val docs = {
    import spark.implicits._
    Seq((1L, goodDoc), (2L, badDoc)).toDF("id", "text")
  }

  test("header extraction (A3) with parse-miss defaults (A4)") {
    val h = TextExtract.transcriptHeader(docs).where("id = 1").collect().head
    assert(h.getAs[String]("nrp") == "5026231079")
    assert(h.getAs[String]("nama") == "Kevin Nathanael")
    assert(h.getAs[Double]("ipk") == 3.72)
    assert(h.getAs[String]("status") == "Aktif")
    assert(h.getAs[Int]("sks_tempuh") == 84 && h.getAs[Int]("sks_lulus") == 84)
    assert(h.getAs[Double]("ip_persiapan") == 3.80 && h.getAs[Double]("ip_sarjana") == 3.65)
    assert(h.getAs[Int]("sks_persiapan") == 36 && h.getAs[Int]("sks_sarjana") == 48)

    val miss = TextExtract.transcriptHeader(docs).where("id = 2").collect().head
    assert(miss.getAs[String]("nrp") == null) // quarantine marker
    assert(miss.getAs[Double]("ipk") == 0.0)  // numeric default
    assert(miss.getAs[String]("status") == "-") // string default
  }

  test("course-line explosion (A5) with decode/lookup/measure (A6-A9)") {
    val rows = TextExtract.transcriptCourses(docs.where("id = 1"))
      .orderBy("kode_mk")
      .collect()
      .map(r => (r.getAs[String]("kode_mk"), r.getAs[String]("nama_mk"),
        r.getAs[Int]("sks"), r.getAs[Int]("tahun"), r.getAs[String]("semester"),
        r.getAs[String]("nilai"), r.getAs[String]("tahap"),
        r.getAs[Double]("bobot"), r.getAs[Double]("bobot_matkul")))
    assert(rows.toSeq == Seq(
      ("ES234101", "Pengantar Sistem Informasi", 4, 2023, "Gasal", "AB", "Persiapan", 3.5, 14.0),
      ("ES234501", "Basis Data", 4, 2024, "Gasal", "B", "Sarjana", 3.0, 12.0),
      ("SM234201", "Kalkulus 2", 3, 2023, "Genap", "A", "Persiapan", 4.0, 12.0)))
  }

  test("binaryFile directory source (A1/A2) feeds the same parse pipeline") {
    val dir = java.nio.file.Files.createTempDirectory("graft_txt")
    java.nio.file.Files.writeString(dir.resolve("good.txt"), goodDoc)
    java.nio.file.Files.writeString(dir.resolve("bad.txt"), badDoc)
    java.nio.file.Files.writeString(dir.resolve("ignored.dat"), "not scanned")
    val docs = TextExtract.fromBinaryDir(spark, dir.toString)
    assert(docs.count() == 2) // glob filtered
    val (good, bad) = TextExtract.quarantine(docs)
    assert(good.count() == 1 && bad.count() == 1)
    val courses = TextExtract.transcriptCourses(good)
    assert(courses.count() == 3)
  }

  test("quarantine split (A18) mirrors the reference's [GAGAL] files") {
    val (good, bad) = TextExtract.quarantine(docs)
    assert(good.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(bad.select("id").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }
}
