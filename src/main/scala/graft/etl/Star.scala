package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel

/** Star-schema analog of the reference's academic data warehouse
  * (kevin-079/FP-Data-Lakehouse, see SURVEY.md §1/§7.1), re-expressed over the
  * driver's TPC-H-ish parquet tables:
  *
  *   - student  (Dim_Mahasiswa, ETL_FINAL.py:50-62)  ≙ customer via orders.o_custkey
  *   - course   (Dim_MataKuliah, ETL_FINAL.py:65-71) ≙ part via lineitem.l_partkey
  *   - time     (Dim_Waktu, ETL_FINAL.py:74-79)      ≙ (year(l_shipdate),
  *                semester: Jan-Jun = "Gasal", Jul-Dec = "Genap" — the reference's
  *                Gs/Gn decode at ETL_FINAL.py:194)
  *   - grade    (Dim_Nilai, ETL_FINAL.py:82-86)      ≙ l_returnflag || l_linestatus
  *                with a fixed letter→weight map like NILAI_BOBOT (ETL_FINAL.py:27-35)
  *   - sks (credit hours)                            ≙ l_quantity
  *   - bobot_matkul = sks × bobot (ETL_FINAL.py:197) ≙ l_quantity × weight
  *
  * The fact grain (one row per graded course event, Fact_Nilai_MK at
  * ETL_FINAL.py:89-101) maps to one lineitem row. The per-(student, semester)
  * rollup fact (Fact_Nilai_Semester, ETL_FINAL.py:104-114) is [[semesterFact]],
  * built in ONE declarative pass (groupBy + window) instead of the reference's
  * per-student per-semester loop (etl_2fact.py:200-249) — shuffle count: exactly
  * one exchange on the group key, then a window over the already-partitioned data.
  *
  * Cross-engine determinism: every rounded measure uses [[Star.round2]]
  * (= floor(x*100 + 0.5)/100) which the DuckDB oracle SQL replicates verbatim,
  * so both engines round the *identical* IEEE double — no HALF_UP vs
  * half-away-from-zero divergence (SURVEY.md §7.4).
  *
  * Scale notes (100 TB posture): lineitem⋈orders is a fact-fact equi-join on
  * l_orderkey — at cluster scale both sides would be bucketed on orderkey so the
  * join is shuffle-free; dims (part, customer) are broadcast. All rollups are
  * single-pass window/agg plans with map-side partial aggregation; nothing
  * iterates on the driver.
  */
object Star {

  /** Letter-grade → weight map (analog of NILAI_BOBOT, ETL_FINAL.py:27-35).
    * "Pass" = weight >= 2.0, so failing grades are RF (1.0) and RO (0.0) —
    * the analog of the reference's {D, E} (insight_transkrip.sql:108). */
  val gradeWeights: Seq[(String, Double)] = Seq(
    "AF" -> 4.0, "AO" -> 3.5, "NF" -> 3.0, "NO" -> 2.0, "RF" -> 1.0, "RO" -> 0.0)

  val failingGrades: Seq[String] = Seq("RF", "RO")

  /** Deterministic cross-engine 2-decimal rounding: floor(x*100 + 0.5)/100.
    * Unlike round(), both engines evaluate this directly on IEEE doubles
    * (Spark's round() goes via BigDecimal-of-string). Averages OVER
    * already-rounded doubles must use [[avgOfRound2ed]], not avg() — summing
    * rounded doubles is order-dependent. */
  def round2(c: Column): Column = floor(c * lit(100) + lit(0.5)) / lit(100)

  /** SQL spelling of [[round2]] for the DuckDB oracle. */
  def round2Sql(expr: String): String = s"floor(($expr)*100 + 0.5)/100"

  /** Order-independent round2'd average of an already-round2'd double
    * column. avg() over rounded doubles sums inexact multiples of 0.01 in
    * partial-aggregation order, which can differ by ulps across engines
    * near a .005 boundary. Instead each value is recovered as exact integer
    * hundredths (floor(x*100 + 0.5) — the representation error of a
    * round2'd double is ≪ 0.5), summed as longs (exact, order-free), and
    * divided once: both engines evaluate one identical double division.
    *
    * PRECONDITION (hence the name): the input column must already be
    * [[round2]]'d. On an arbitrary double column this silently computes
    * round-each-value-then-average, which is a different statistic. */
  def avgOfRound2ed(c: Column): Column =
    round2(sum(floor(c * lit(100) + lit(0.5)).cast("long")).cast("double") /
      (count(c) * lit(100)).cast("double"))

  /** SQL spelling of [[avgOfRound2ed]] for the DuckDB oracle (CASTs keep
    * DuckDB's HUGEINT sums off the output path). */
  def avgOfRound2edSql(expr: String): String =
    round2Sql(s"CAST(sum(CAST(floor(($expr)*100 + 0.5) AS BIGINT)) AS DOUBLE)" +
      s" / CAST(count($expr) * 100 AS DOUBLE)")

  /** 4-decimal variant of [[round2]] for similarity scores. */
  def round4(c: Column): Column = floor(c * lit(10000) + lit(0.5)) / lit(10000)

  def round4Sql(expr: String): String = s"floor(($expr)*10000 + 0.5)/10000"

  /** weight CASE expression over the concatenated grade letter. */
  def bobotExpr(huruf: Column): Column = {
    val init: Column = lit(0.0)
    gradeWeights.reverse.foldLeft(init) { case (acc, (h, w)) =>
      when(huruf === h, lit(w)).otherwise(acc)
    }
  }

  private def bobotCaseSql(hurufExpr: String): String = {
    val whens = gradeWeights.map { case (h, w) => s"WHEN '$h' THEN $w" }.mkString(" ")
    s"CAST(CASE $hurufExpr $whens ELSE 0.0 END AS DOUBLE)"
  }

  // ---------------------------------------------------------------------------
  // Spark-side builders
  // ---------------------------------------------------------------------------

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Session-scoped memoization of the shared star DataFrames
    * ([[graft.SessionMemo]]). ~20 of the queries derive from
    * [[fact]]/[[semesterFact]]; each query is an independent
    * (spark, dir) => DataFrame thunk, so without this every one re-reads
    * and re-joins the raw parquet. persist() here is the in-session analog
    * of materializing the star to a warehouse table (the cross-run form is
    * [[StarBuilder]]); at cluster scale the same role is played by a
    * bucketed parquet/Delta write of the fact, not executor memory. */
  private def memo(spark: SparkSession, dir: String, key: String)(build: => DataFrame): DataFrame =
    graft.SessionMemo(spark, dir, s"star:$key")(build)(_.persist(StorageLevel.MEMORY_AND_DISK))

  /** The graded-event fact (Fact_Nilai_MK analog): one row per lineitem with
    * the star's natural keys and measures. Columns:
    * student, course, tahun, semester, huruf, bobot, sks, bobot_matkul. */
  def fact(spark: SparkSession, dir: String): DataFrame = memo(spark, dir, "fact") {
    val li = table(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_shipdate", "l_returnflag", "l_linestatus", "l_quantity")
    val ord = table(spark, dir, "orders").select("o_orderkey", "o_custkey")
    val huruf = concat(col("l_returnflag"), col("l_linestatus"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select(
        col("o_custkey").as("student"),
        col("l_partkey").as("course"),
        year(col("l_shipdate")).cast("long").as("tahun"),
        when(month(col("l_shipdate")) <= 6, "Gasal").otherwise("Genap").as("semester"),
        huruf.as("huruf"),
        bobotExpr(huruf).as("bobot"),
        col("l_quantity").as("sks"))
      .withColumn("bobot_matkul", col("sks") * col("bobot"))
  }

  /** Fact extended with the course stage (tahap analog, ETL_FINAL.py:193):
    * part.p_size <= 25 → "Persiapan" else "Sarjana". Broadcast dim join. */
  def factWithTahap(spark: SparkSession, dir: String): DataFrame = memo(spark, dir, "factt") {
    val p = table(spark, dir, "part")
      .select(col("p_partkey"),
        when(col("p_size") <= 25, "Persiapan").otherwise("Sarjana").as("tahap"))
    fact(spark, dir).join(broadcast(p), col("course") === col("p_partkey"))
      .drop("p_partkey")
  }

  /** Per-(student, semester) rollup (Fact_Nilai_Semester analog;
    * correct single-pass semantics of etl_2fact.py:200-249, NOT the nested
    * recompute bug of ETL_FINAL.py:224-273 — SURVEY.md §2.4):
    *   ips = round2(Σ sks·bobot / Σ sks)                (etl_2fact.py:228-230)
    *   ipk = round2(cumΣ sks·bobot / cumΣ sks)          (etl_2fact.py:233-235)
    *   rep_huruf = grade with max weight                (canonical per SURVEY §7.4,
    *     replacing the reference's insertion-order MAX(id_nilai), etl_2fact.py:238-244)
    * Chronological order = (tahun, semester): 'Gasal' < 'Genap' lexically, the
    * same coincidence the reference relies on (insight_transkrip.sql:290). */
  def semesterFact(spark: SparkSession, dir: String): DataFrame = memo(spark, dir, "sem") {
    val grouped = fact(spark, dir)
      .groupBy("student", "tahun", "semester")
      .agg(
        sum(col("sks") * col("bobot")).as("sum_bm"),
        sum(col("sks")).as("sum_sks"),
        max_by(col("huruf"), col("bobot")).as("rep_huruf"))
    val w = Window.partitionBy("student").orderBy("tahun", "semester")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grouped
      .withColumn("ips", round2(col("sum_bm") / col("sum_sks")))
      .withColumn("ipk", round2(sum(col("sum_bm")).over(w) / sum(col("sum_sks")).over(w)))
      .select("student", "tahun", "semester", "ips", "ipk", "rep_huruf")
  }

  /** Dim_Mahasiswa analog: per-student summary with overall + per-stage GPAs
    * (ipk / ip_persiapan / ip_sarjana / sks_tempuh / sks_lulus,
    * ETL_FINAL.py:50-62). Stage GPAs are conditional ratio-of-sums; missing
    * stage → 0.0 like the reference's parse-miss default (ETL_FINAL.py:164-177). */
  def dimMahasiswa(spark: SparkSession, dir: String): DataFrame = memo(spark, dir, "mhs") {
    val f = factWithTahap(spark, dir)
    def stageRatio(stage: String): Column = {
      val bm = sum(when(col("tahap") === stage, col("sks") * col("bobot")).otherwise(0.0))
      val sk = sum(when(col("tahap") === stage, col("sks")).otherwise(0.0))
      when(sk === 0, 0.0).otherwise(round2(bm / sk))
    }
    f.groupBy("student").agg(
      round2(sum(col("sks") * col("bobot")) / sum(col("sks"))).as("ipk"),
      stageRatio("Persiapan").as("ip_persiapan"),
      stageRatio("Sarjana").as("ip_sarjana"),
      sum(col("sks")).as("sks_tempuh"),
      sum(when(col("bobot") >= 2.0, col("sks")).otherwise(0.0)).as("sks_lulus"))
  }

  // ---------------------------------------------------------------------------
  // DuckDB oracle CTE fragments (composed into each query's oracleSql)
  // ---------------------------------------------------------------------------

  /** `fact` CTE — must mirror [[fact]] exactly (names, types, expressions). */
  val factCte: String = {
    s"""fact AS (
       |  SELECT o_custkey AS student,
       |         l_partkey AS course,
       |         CAST(year(l_shipdate) AS BIGINT) AS tahun,
       |         CASE WHEN month(l_shipdate) <= 6 THEN 'Gasal' ELSE 'Genap' END AS semester,
       |         concat(l_returnflag, l_linestatus) AS huruf,
       |         ${bobotCaseSql("concat(l_returnflag, l_linestatus)")} AS bobot,
       |         l_quantity AS sks,
       |         l_quantity * ${bobotCaseSql("concat(l_returnflag, l_linestatus)")} AS bobot_matkul
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)""".stripMargin
  }

  /** `factt` CTE = fact + tahap (mirrors [[factWithTahap]]). */
  val factTahapCte: String =
    s"""factt AS (
       |  SELECT fact.*, CASE WHEN p_size <= 25 THEN 'Persiapan' ELSE 'Sarjana' END AS tahap
       |  FROM fact JOIN part ON course = p_partkey)""".stripMargin

  /** `sem` CTE (mirrors [[semesterFact]]). */
  val semCte: String =
    s"""sem AS (
       |  SELECT student, tahun, semester,
       |         ${round2Sql("sum(sks*bobot) / sum(sks)")} AS ips,
       |         ${round2Sql("sum(sum(sks*bobot)) OVER w / sum(sum(sks)) OVER w")} AS ipk,
       |         max_by(huruf, bobot) AS rep_huruf
       |  FROM fact GROUP BY student, tahun, semester
       |  WINDOW w AS (PARTITION BY student ORDER BY tahun, semester
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))""".stripMargin

  /** `mhs` CTE (mirrors [[dimMahasiswa]]). */
  val mhsCte: String = {
    def stageRatioSql(stage: String): String = {
      val bm = s"sum(CASE WHEN tahap = '$stage' THEN sks*bobot ELSE 0.0 END)"
      val sk = s"sum(CASE WHEN tahap = '$stage' THEN sks ELSE 0.0 END)"
      s"CASE WHEN $sk = 0 THEN 0.0 ELSE ${round2Sql(s"$bm / $sk")} END"
    }
    s"""mhs AS (
       |  SELECT student,
       |         ${round2Sql("sum(sks*bobot) / sum(sks)")} AS ipk,
       |         ${stageRatioSql("Persiapan")} AS ip_persiapan,
       |         ${stageRatioSql("Sarjana")} AS ip_sarjana,
       |         sum(sks) AS sks_tempuh,
       |         sum(CASE WHEN bobot >= 2.0 THEN sks ELSE 0.0 END) AS sks_lulus
       |  FROM factt GROUP BY student)""".stripMargin
  }

  def withFact(select: String): String = s"WITH $factCte $select"
  def withFactSem(select: String): String = s"WITH $factCte, $semCte $select"
  def withFactTahap(select: String): String = s"WITH $factCte, $factTahapCte $select"
  def withFactTahapMhs(select: String): String = s"WITH $factCte, $factTahapCte, $mhsCte $select"
}
