package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.etl.Star.{withFact, withFactSem}

/** Star materialization: surrogate-key dimension builds (A10, the batch
  * re-expression of the reference's row-at-a-time get-or-create at
  * ETL_FINAL.py:128-134) and the write/full-refresh path (A12/A17/A19/A20,
  * ETL_FINAL.py:42-45,220-223,270-273) the reference performs with
  * DROP DATABASE + per-row INSERTs.
  *
  * Surrogate ids are `dense_rank` over the natural key (SURVEY.md §7.4):
  * deterministic across engines and runs, unlike
  * `monotonically_increasing_id`. The global-order window is fine for
  * dimension cardinalities; for a 100 TB *fact* surrogate key the scale
  * path is (partition_id, local row number) composition — dims stay small
  * enough to rank globally by construction.
  *
  * Writes are parquet `overwrite` (the container has no Delta/Iceberg
  * jars); facts are partitioned by `tahun` so time-range queries prune
  * partitions. Overwrite-per-run = the reference's full-refresh semantics.
  */
object StarBuilder {
  type Q = (SparkSession, String) => DataFrame

  /** Dim_Waktu analog (ETL_FINAL.py:74-79): id_waktu = dense_rank over
    * (tahun, semester) — chronological because 'Gasal' < 'Genap'. */
  def dimWaktu(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("tahun", "semester")
    Star.fact(spark, dir).select("tahun", "semester").distinct()
      .withColumn("id_waktu", dense_rank().over(w).cast("long"))
      .select("id_waktu", "tahun", "semester")
  }

  /** Dim_Nilai analog (ETL_FINAL.py:82-86): the seeded grade map (A11). */
  def dimNilai(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Star.gradeWeights.zipWithIndex
      .map { case ((h, b), i) => (i + 1L, h, b) }
      .toDF("id_nilai", "huruf", "bobot")
  }

  /** Dim_MataKuliah analog: courses seen in the fact, surrogate-keyed. */
  def dimMataKuliah(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("course")
    Star.factWithTahap(spark, dir).select("course", "tahap").distinct()
      .withColumn("id_mk", dense_rank().over(w).cast("long"))
      .select("id_mk", "course", "tahap")
  }

  /** Dim_Mahasiswa analog: [[Star.dimMahasiswa]] + surrogate id. */
  def dimMahasiswa(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("student")
    Star.dimMahasiswa(spark, dir)
      .withColumn("id_mahasiswa", dense_rank().over(w).cast("long"))
  }

  /** Fact_Nilai_MK analog with surrogate FKs (A12): fact joined back to
    * the dims on natural keys — the set-oriented form of get-or-create. */
  def factNilaiMk(spark: SparkSession, dir: String): DataFrame =
    Star.fact(spark, dir)
      .join(broadcast(dimWaktu(spark, dir)), Seq("tahun", "semester"))
      .join(broadcast(dimNilai(spark).select("id_nilai", "huruf")), Seq("huruf"))
      .select(col("student"), col("course"), col("tahun"), col("id_waktu"),
        col("id_nilai"), col("sks"), col("bobot"), col("bobot_matkul"))

  /** Full-refresh star write (A17/A19/A20): overwrite the warehouse dir;
    * facts partitioned by tahun for partition pruning. */
  def writeAll(spark: SparkSession, dir: String, warehouse: String): Unit = {
    // dims are small → one file each; facts are repartitioned by the
    // partition column first so each tahun directory gets one file instead
    // of one per shuffle partition (~200 tiny files at 32 partitions — at
    // cluster scale this becomes repartition(tahun, <files-per-partition>)).
    dimWaktu(spark, dir).coalesce(1).write.mode("overwrite").parquet(s"$warehouse/dim_waktu")
    dimNilai(spark).coalesce(1).write.mode("overwrite").parquet(s"$warehouse/dim_nilai")
    dimMataKuliah(spark, dir).coalesce(1).write.mode("overwrite").parquet(s"$warehouse/dim_matakuliah")
    dimMahasiswa(spark, dir).coalesce(1).write.mode("overwrite").parquet(s"$warehouse/dim_mahasiswa")
    // hash-repartition on tahun: one task (and file) per year. The
    // range-partitioned (tahun, student) alternative writes each year from
    // several tasks, but its sampling pass re-evaluates the fact per write
    // and cost more than the parallelism bought back at this scale.
    factNilaiMk(spark, dir).repartition(col("tahun")).write.mode("overwrite")
      .partitionBy("tahun").parquet(s"$warehouse/fact_nilai_mk")
    Star.semesterFact(spark, dir).repartition(col("tahun")).write.mode("overwrite")
      .partitionBy("tahun").parquet(s"$warehouse/fact_nilai_semester")
  }

  /** q48 (A10): the surrogate-keyed time dimension itself. */
  val q48_dim_waktu: Q = (s, d) =>
    dimWaktu(s, d).orderBy("id_waktu")

  /** q49 (A17/A19/A20): write the whole star to a warehouse dir, read it
    * back, and report per-table row counts — the write path exercised
    * inside the correctness gate. */
  val q49_star_roundtrip: Q = (s, d) => {
    val warehouse = s"${sys.props("java.io.tmpdir")}/graft_warehouse_${d.replaceAll("[^a-zA-Z0-9]", "_")}"
    writeAll(s, d, warehouse)
    val tables = Seq("dim_waktu", "dim_nilai", "dim_matakuliah", "dim_mahasiswa",
      "fact_nilai_mk", "fact_nilai_semester")
    tables.map { t =>
      s.read.parquet(s"$warehouse/$t")
        .agg(count(lit(1)).as("n_rows"))
        .select(lit(t).as("table_name"), col("n_rows"))
    }.reduce(_.unionAll(_)).orderBy("table_name")
  }

  val queries: Map[String, Q] = Map(
    "q48_dim_waktu" -> q48_dim_waktu,
    "q49_star_roundtrip" -> q49_star_roundtrip)

  val oracle: Map[String, String] = Map(
    "q48_dim_waktu" -> withFact(
      """SELECT CAST(dense_rank() OVER (ORDER BY tahun, semester) AS BIGINT) AS id_waktu,
        |       tahun, semester
        |FROM (SELECT DISTINCT tahun, semester FROM fact)
        |ORDER BY id_waktu""".stripMargin),
    "q49_star_roundtrip" -> withFactSem(
      s""", factt AS (
         |  SELECT fact.*, CASE WHEN p_size <= 25 THEN 'Persiapan' ELSE 'Sarjana' END AS tahap
         |  FROM fact JOIN part ON course = p_partkey)
         |SELECT * FROM (
         |  SELECT 'dim_waktu' AS table_name,
         |         CAST(count(DISTINCT (tahun, semester)) AS BIGINT) AS n_rows FROM fact
         |  UNION ALL
         |  SELECT 'dim_nilai', ${Star.gradeWeights.size} FROM (SELECT 1)
         |  UNION ALL
         |  SELECT 'dim_matakuliah', CAST(count(DISTINCT (course, tahap)) AS BIGINT) FROM factt
         |  UNION ALL
         |  SELECT 'dim_mahasiswa', CAST(count(DISTINCT student) AS BIGINT) FROM fact
         |  UNION ALL
         |  SELECT 'fact_nilai_mk', CAST(count(*) AS BIGINT) FROM fact
         |  UNION ALL
         |  SELECT 'fact_nilai_semester', CAST(count(*) AS BIGINT) FROM sem)
         |ORDER BY table_name""".stripMargin))
}
