package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.etl.Star
import graft.etl.Star.{avgOfRound2ed, avgOfRound2edSql, round2, round2Sql, withFact, withFactSem, withFactTahap, withFactTahapMhs}

/** The 29 analytic "insight" queries of the reference
  * (insight_transkrip.sql:1-357), re-expressed idiomatically on the star analog
  * of [[graft.etl.Star]]. Each query has a DuckDB oracle in [[Insights.oracle]]
  * whose column names, expressions, and total ORDER BY match the Spark side
  * exactly (driver hash-compare contract; SURVEY.md §7.4).
  *
  * Conventions:
  *  - Every query ends in a deterministic total order (tie-broken by keys).
  *  - MySQL implicit grouping (SELECT of non-grouped functionally-dependent
  *    columns, e.g. insight_transkrip.sql:17-23) is made explicit by grouping
  *    on the natural key directly (SURVEY.md §2.B note).
  *  - All rounding via Star.round2 for bit-equal cross-engine results.
  */
object Insights {
  type Q = (SparkSession, String) => DataFrame

  private val failing = Star.failingGrades // analog of nilai IN ('D','E')
  private val failingList = failing.map(g => s"'$g'").mkString(", ")

  /** Q1 (insight_transkrip.sql:2-13): overall mean cumulative GPA —
    * per-student ratio-of-sums subquery, then one global AVG. */
  val q01_avg_ipk: Q = (s, d) =>
    Star.fact(s, d)
      .groupBy("student")
      .agg(round2(sum(col("sks") * col("bobot")) / sum(col("sks"))).as("ipk"))
      .agg(avgOfRound2ed(col("ipk")).as("avg_ipk"))

  /** Q2 (insight_transkrip.sql:15-25): top-10 students by GPA (top-k →
    * TakeOrderedAndProject; ties broken by student id). */
  val q02_top10_ipk: Q = (s, d) =>
    Star.fact(s, d)
      .groupBy("student")
      .agg(round2(sum(col("sks") * col("bobot")) / sum(col("sks"))).as("ipk"))
      .orderBy(col("ipk").desc, col("student").asc)
      .limit(10)

  /** Q3 (insight_transkrip.sql:27-34): letter-grade histogram. */
  val q03_grade_hist: Q = (s, d) =>
    Star.fact(s, d).groupBy("huruf").agg(count(lit(1)).as("jumlah"))
      .orderBy(col("jumlah").desc, col("huruf").asc)

  /** Q4 (insight_transkrip.sql:36-45): 5 hardest courses (lowest mean grade). */
  val q04_hardest_courses: Q = (s, d) =>
    Star.fact(s, d).groupBy("course")
      .agg(round2(avg(col("bobot"))).as("avg_bobot"))
      .orderBy(col("avg_bobot").asc, col("course").asc)
      .limit(5)

  /** Q5 (insight_transkrip.sql:47-56): 5 easiest courses. */
  val q05_easiest_courses: Q = (s, d) =>
    Star.fact(s, d).groupBy("course")
      .agg(round2(avg(col("bobot"))).as("avg_bobot"))
      .orderBy(col("avg_bobot").desc, col("course").asc)
      .limit(5)

  /** Q6 (insight_transkrip.sql:58-66): odd (Gasal) vs even (Genap) semester
    * weighted mean grade. */
  val q06_semester_compare: Q = (s, d) =>
    Star.fact(s, d).groupBy("semester")
      .agg(round2(sum(col("bobot_matkul")) / sum(col("sks"))).as("rata_nilai"))
      .orderBy("semester")

  /** Q7 (insight_transkrip.sql:68-77): mean weighted grade per (year, semester). */
  val q07_ips_per_period: Q = (s, d) =>
    Star.fact(s, d).groupBy("tahun", "semester")
      .agg(round2(sum(col("bobot_matkul")) / sum(col("sks"))).as("rata_nilai"))
      .orderBy("tahun", "semester")

  /** Q8 (insight_transkrip.sql:79-87): 5 most-taken courses. */
  val q08_most_taken: Q = (s, d) =>
    Star.fact(s, d).groupBy("course").agg(count(lit(1)).as("jumlah"))
      .orderBy(col("jumlah").desc, col("course").asc)
      .limit(5)

  /** Q9 (insight_transkrip.sql:89-98): passed credits per student
    * (filter bobot >= 2.0 pushed below the aggregation). */
  val q09_passed_credits: Q = (s, d) =>
    Star.fact(s, d).where(col("bobot") >= 2.0)
      .groupBy("student").agg(sum(col("sks")).as("total_sks"))
      .orderBy("student")

  /** Q10 (insight_transkrip.sql:100-115): failed courses never remediated.
    * NOT EXISTS ≡ anti join on (student, course); rewritten as ONE
    * conditional aggregation — ever-failed ∧ never-passed per pair — which
    * is the same answer in a single shuffle instead of two distincts plus
    * an anti join (r2 plan audit). The oracle keeps the anti-join form, so
    * the equivalence is checked, not assumed. */
  val q10_failed_never_passed: Q = (s, d) =>
    Star.fact(s, d)
      .groupBy("student", "course")
      .agg(
        max(when(col("huruf").isin(failing: _*), 1).otherwise(0)).as("ever_failed"),
        max(when(!col("huruf").isin(failing: _*), 1).otherwise(0)).as("ever_passed"))
      .where(col("ever_failed") === 1 && col("ever_passed") === 0)
      .select("student", "course")
      .orderBy("student", "course")

  /** Q11 (insight_transkrip.sql:117-127): retaken courses — HAVING COUNT > 1. */
  val q11_retaken: Q = (s, d) =>
    Star.fact(s, d).groupBy("student", "course").agg(count(lit(1)).as("jumlah"))
      .where(col("jumlah") > 1)
      .orderBy(col("jumlah").desc, col("student").asc, col("course").asc)

  /** Q12 (insight_transkrip.sql:129-134): mean stage GPAs over students with
    * both stages present (conjunctive filter on the student dim). */
  val q12_stage_gpa: Q = (s, d) =>
    Star.dimMahasiswa(s, d)
      .where(col("ip_persiapan") > 0 && col("ip_sarjana") > 0)
      .agg(avgOfRound2ed(col("ip_persiapan")).as("avg_ip_persiapan"),
           avgOfRound2ed(col("ip_sarjana")).as("avg_ip_sarjana"))

  /** Q13 (insight_transkrip.sql:136-140): top-5 preparatory-stage GPA. */
  val q13_top_persiapan: Q = (s, d) =>
    Star.dimMahasiswa(s, d).select("student", "ip_persiapan")
      .orderBy(col("ip_persiapan").desc, col("student").asc)
      .limit(5)

  /** Q14 (insight_transkrip.sql:142-146): top-5 undergraduate-stage GPA. */
  val q14_top_sarjana: Q = (s, d) =>
    Star.dimMahasiswa(s, d).select("student", "ip_sarjana")
      .orderBy(col("ip_sarjana").desc, col("student").asc)
      .limit(5)

  /** Q15 (insight_transkrip.sql:148-156): pass/fail counts per course —
    * conditional aggregation (SUM over CASE). */
  val q15_pass_fail: Q = (s, d) =>
    Star.fact(s, d).groupBy("course").agg(
        sum(when(!col("huruf").isin(failing: _*), 1L).otherwise(0L)).as("lulus"),
        sum(when(col("huruf").isin(failing: _*), 1L).otherwise(0L)).as("gagal"))
      .orderBy("course")

  private def jalurExpr(student: Column): Column = {
    val key3 = lpad((student % 1000).cast("string"), 3, "0")
    when(key3.between("000", "299"), "SNBP")
      .when(key3.between("300", "649"), "SNBT")
      .otherwise("Mandiri")
  }
  private val jalurSql: String =
    """CASE WHEN lpad(CAST(student % 1000 AS VARCHAR), 3, '0') BETWEEN '000' AND '299' THEN 'SNBP'
      |     WHEN lpad(CAST(student % 1000 AS VARCHAR), 3, '0') BETWEEN '300' AND '649' THEN 'SNBT'
      |     ELSE 'Mandiri' END""".stripMargin

  /** Q16 (insight_transkrip.sql:158-167): admission path decoded from id
    * digits — SUBSTRING/lpad + string BETWEEN range compare (NRP digits 8-10
    * analog: student id mod 1000, zero-padded). */
  val q16_jalur_masuk: Q = (s, d) =>
    Star.fact(s, d).select("student").distinct()
      .withColumn("jalur_masuk", jalurExpr(col("student")))
      .orderBy("student")

  /** Q17 (insight_transkrip.sql:169-186): mean GPA and headcount per
    * admission path (derived-column grouping over a subquery). */
  val q17_gpa_per_jalur: Q = (s, d) =>
    Star.fact(s, d)
      .groupBy("student")
      .agg(round2(sum(col("sks") * col("bobot")) / sum(col("sks"))).as("ipk"))
      .withColumn("jalur_masuk", jalurExpr(col("student")))
      .groupBy("jalur_masuk")
      .agg(avgOfRound2ed(col("ipk")).as("avg_ipk"), count(lit(1)).as("jumlah"))
      .orderBy(col("avg_ipk").desc, col("jalur_masuk").asc)

  /** Q18 (insight_transkrip.sql:188-197): unweighted mean grade per student. */
  val q18_unweighted_avg: Q = (s, d) =>
    Star.fact(s, d).groupBy("student")
      .agg(round2(avg(col("bobot"))).as("rata_bobot"))
      .orderBy(col("rata_bobot").desc, col("student").asc)

  /** Q19 (insight_transkrip.sql:199-208): semesters attended per student —
    * COUNT(DISTINCT CONCAT(tahun,'-',semester)). */
  val q19_semesters_attended: Q = (s, d) =>
    Star.fact(s, d).groupBy("student")
      .agg(countDistinct(concat_ws("-", col("tahun"), col("semester"))).as("jumlah_semester"))
      .orderBy("student")

  /** Q20 (insight_transkrip.sql:210-219): worst grade per student (MIN). */
  val q20_worst_grade: Q = (s, d) =>
    Star.fact(s, d).groupBy("student")
      .agg(min(col("bobot")).as("nilai_terendah"))
      .orderBy(col("nilai_terendah").asc, col("student").asc)

  /** Q21 (insight_transkrip.sql:221-230): per-student IPS trend — the
    * semester fact in chronological order (no aggregation). */
  val q21_ips_trend: Q = (s, d) =>
    Star.semesterFact(s, d).select("student", "tahun", "semester", "ips")
      .orderBy("student", "tahun", "semester")

  /** Q22 (insight_transkrip.sql:232-255): biggest IPS rise between
    * consecutive attended semesters — LAG over (student, time). */
  val q22_ips_delta: Q = (s, d) => {
    val w = Window.partitionBy("student").orderBy("tahun", "semester")
    Star.semesterFact(s, d)
      .withColumn("prev_ips", lag(col("ips"), 1).over(w))
      .withColumn("kenaikan_ips", col("ips") - col("prev_ips"))
      .where(col("kenaikan_ips").isNotNull)
      .select("student", "tahun", "semester", "prev_ips", "ips", "kenaikan_ips")
      .orderBy(col("kenaikan_ips").desc, col("student").asc, col("tahun").asc, col("semester").asc)
      .limit(10)
  }

  /** Q23 (insight_transkrip.sql:258-266): consistently high CGPA —
    * HAVING MIN(ipk) >= threshold. Deviation from the reference: the
    * reference uses 3.5 (insight_transkrip.sql:266); on the TPC-H-derived
    * grade distribution that is always empty, so the threshold is lowered
    * to 3.0 to keep the query non-degenerate (oracle uses 3.0 too). */
  val q23_consistent_high: Q = (s, d) =>
    Star.semesterFact(s, d).groupBy("student")
      .agg(min(col("ipk")).as("min_ipk"), max(col("ipk")).as("max_ipk"))
      .where(col("min_ipk") >= 3.0)
      .orderBy("student")

  /** Q24 (insight_transkrip.sql:268-280): cohort mean of first vs last CGPA —
    * FIRST_VALUE / LAST_VALUE with the explicit full frame (the reference
    * already uses ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING at
    * insight_transkrip.sql:276-277), then AVG over all window rows (each
    * student weighted by their semester count, as the reference does). */
  val q24_first_vs_last: Q = (s, d) => {
    val w = Window.partitionBy("student").orderBy("tahun", "semester")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Star.semesterFact(s, d)
      .withColumn("first_ipk", first(col("ipk")).over(w))
      .withColumn("last_ipk", last(col("ipk")).over(w))
      .agg(avgOfRound2ed(col("first_ipk")).as("avg_first_ipk"),
           avgOfRound2ed(col("last_ipk")).as("avg_last_ipk"))
  }

  /** Q25 (insight_transkrip.sql:283-294): students whose LATEST CGPA is below
    * 2.0 — RANK over (student, time desc) then filter rank=1 ('Genap' > 'Gasal'
    * lexically, so string desc = latest-first, as the reference exploits). */
  val q25_latest_low: Q = (s, d) => {
    val w = Window.partitionBy("student").orderBy(col("tahun").desc, col("semester").desc)
    Star.semesterFact(s, d)
      .withColumn("urutan", rank().over(w))
      .where(col("urutan") === 1 && col("ipk") < 2.0)
      .agg(count(lit(1)).as("jumlah_mahasiswa"))
  }

  /** Q26 (insight_transkrip.sql:296-302): IPS distribution feed (projection). */
  val q26_ips_distribution: Q = (s, d) =>
    Star.semesterFact(s, d).select("tahun", "semester", "ips")
      .orderBy("tahun", "semester", "ips")

  /** Q27 (insight_transkrip.sql:304-322): consecutive-semester IPS pairs.
    * The reference's self-join has an AND/OR precedence bug (SURVEY.md §7.4);
    * implemented with the intended semantics: LAG + calendar-adjacency filter
    * (Genap→next Gasal or same-year Gasal→Genap). */
  val q27_consecutive_pairs: Q = (s, d) => {
    val w = Window.partitionBy("student").orderBy("tahun", "semester")
    Star.semesterFact(s, d)
      .withColumn("prev_tahun", lag(col("tahun"), 1).over(w))
      .withColumn("prev_semester", lag(col("semester"), 1).over(w))
      .withColumn("prev_ips", lag(col("ips"), 1).over(w))
      .where(
        (col("tahun") === col("prev_tahun") && col("semester") === "Genap" && col("prev_semester") === "Gasal") ||
        (col("tahun") === col("prev_tahun") + 1 && col("semester") === "Gasal" && col("prev_semester") === "Genap"))
      .select("student", "tahun", "semester", "prev_ips", "ips")
      .orderBy("student", "tahun", "semester")
  }

  /** Q28 (insight_transkrip.sql:324-335): per-semester IPS ranking — RANK
    * partitioned by period. */
  val q28_ips_ranking: Q = (s, d) => {
    val w = Window.partitionBy("tahun", "semester").orderBy(col("ips").desc)
    Star.semesterFact(s, d)
      .withColumn("peringkat", rank().over(w))
      .select("tahun", "semester", "student", "ips", "peringkat")
      .orderBy(col("tahun").asc, col("semester").asc, col("peringkat").asc, col("student").asc)
  }

  /** Q29 (insight_transkrip.sql:337-356): biggest cohort-wide mean-IPS drop
    * between consecutive periods — LAG over aggregated rows. The global
    * (partitionless) window here is fine at any data scale: its input is
    * the per-(tahun, semester) aggregate, whose cardinality grows with
    * calendar time (2 rows/year), not with data volume. */
  val q29_biggest_drop: Q = (s, d) => {
    val w = Window.orderBy("tahun", "semester")
    Star.semesterFact(s, d)
      .groupBy("tahun", "semester")
      .agg(avgOfRound2ed(col("ips")).as("rata_ips"))
      .withColumn("prev_rata_ips", lag(col("rata_ips"), 1).over(w))
      .where(col("prev_rata_ips").isNotNull)
      .withColumn("penurunan", round2(col("prev_rata_ips") - col("rata_ips")))
      .orderBy(col("penurunan").desc, col("tahun").asc, col("semester").asc)
      .limit(1)
  }

  /** Q30 (no direct reference query; covers A16, etl_2fact.py:238-244):
    * representative grade per (student, semester) — the reference keeps the
    * max-id grade in Fact_Nilai_Semester; canonical semantics here is the
    * max-weight grade (max_by, SURVEY.md §7.4). Projected explicitly so the
    * oracle gate covers the rep_huruf computation (r1 verdict: dead code). */
  val q30_rep_grade: Q = (s, d) =>
    Star.semesterFact(s, d).select("student", "tahun", "semester", "rep_huruf")
      .orderBy("student", "tahun", "semester")

  /** q125: cohort percentile standings — the distribution-rank trio
    * (`ntile`, `percent_rank`, `cume_dist`) the 29 reference queries
    * never reach (they stop at rank/lag): per enrollment year, students
    * rank by year-GPA into deciles, and each decile reports its size,
    * GPA bounds, and the boundary (top) student's percent_rank and
    * cume_dist. Determinism: the ranking ORDER BY is the unique
    * (gpa, student) pair, so ntile bucket assignment and the two
    * distribution functions are total-order-defined in both engines; the
    * boundary row is selected by row_number = 1 (no float aggregation —
    * averaging percent_ranks would sum doubles in shuffle order). Scale:
    * the windows partition by tahun (and decile) over the per-(student,
    * year) AGGREGATE — one row per student-year, not per event; at 100 TB
    * a single year's cohort is still millions of rows through one sort
    * task, so the scale path is the q122 two-phase shape (bucket by gpa
    * range, cumulate bucket counts driver-side); this query states the
    * semantics the two-phase form must reproduce. */
  val q125_gpa_percentiles: Q = (s, d) => {
    val yearly = Star.fact(s, d).groupBy("student", "tahun")
      .agg(round2(sum(col("sks") * col("bobot")) / sum(col("sks"))).as("gpa"))
    val w = Window.partitionBy("tahun").orderBy(col("gpa"), col("student"))
    val wd = Window.partitionBy("tahun", "decile")
    val wdTop = wd.orderBy(col("gpa").desc, col("student").desc)
    yearly
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .withColumn("rn", row_number().over(wdTop))
      .withColumn("n_students", count(lit(1)).over(wd))
      .withColumn("lo_gpa", min("gpa").over(wd))
      .withColumn("hi_gpa", max("gpa").over(wd))
      .where(col("rn") === 1)
      .select(col("tahun"), col("decile"), col("n_students"),
        col("lo_gpa"), col("hi_gpa"),
        Star.round4(col("pr")).as("top_pr"), Star.round4(col("cd")).as("top_cd"))
      .orderBy("tahun", "decile")
  }

  val queries: Map[String, Q] = Map(
    "q125_gpa_percentiles" -> q125_gpa_percentiles,
    "q30_rep_grade" -> q30_rep_grade,
    "q01_avg_ipk" -> q01_avg_ipk,
    "q02_top10_ipk" -> q02_top10_ipk,
    "q03_grade_hist" -> q03_grade_hist,
    "q04_hardest_courses" -> q04_hardest_courses,
    "q05_easiest_courses" -> q05_easiest_courses,
    "q06_semester_compare" -> q06_semester_compare,
    "q07_ips_per_period" -> q07_ips_per_period,
    "q08_most_taken" -> q08_most_taken,
    "q09_passed_credits" -> q09_passed_credits,
    "q10_failed_never_passed" -> q10_failed_never_passed,
    "q11_retaken" -> q11_retaken,
    "q12_stage_gpa" -> q12_stage_gpa,
    "q13_top_persiapan" -> q13_top_persiapan,
    "q14_top_sarjana" -> q14_top_sarjana,
    "q15_pass_fail" -> q15_pass_fail,
    "q16_jalur_masuk" -> q16_jalur_masuk,
    "q17_gpa_per_jalur" -> q17_gpa_per_jalur,
    "q18_unweighted_avg" -> q18_unweighted_avg,
    "q19_semesters_attended" -> q19_semesters_attended,
    "q20_worst_grade" -> q20_worst_grade,
    "q21_ips_trend" -> q21_ips_trend,
    "q22_ips_delta" -> q22_ips_delta,
    "q23_consistent_high" -> q23_consistent_high,
    "q24_first_vs_last" -> q24_first_vs_last,
    "q25_latest_low" -> q25_latest_low,
    "q26_ips_distribution" -> q26_ips_distribution,
    "q27_consecutive_pairs" -> q27_consecutive_pairs,
    "q28_ips_ranking" -> q28_ips_ranking,
    "q29_biggest_drop" -> q29_biggest_drop,
  )

  val oracle: Map[String, String] = Map(
    "q125_gpa_percentiles" -> withFact(
      s""", yearly AS (
         |  SELECT student, tahun, ${round2Sql("sum(sks*bobot) / sum(sks)")} AS gpa
         |  FROM fact GROUP BY student, tahun),
         |rk AS (
         |  SELECT student, tahun, gpa,
         |         CAST(ntile(10) OVER w AS BIGINT) AS decile,
         |         percent_rank() OVER w AS pr,
         |         cume_dist() OVER w AS cd
         |  FROM yearly
         |  WINDOW w AS (PARTITION BY tahun ORDER BY gpa, student)),
         |agg AS (
         |  SELECT *,
         |         row_number() OVER (PARTITION BY tahun, decile
         |                            ORDER BY gpa DESC, student DESC) AS rn,
         |         CAST(count(*) OVER (PARTITION BY tahun, decile) AS BIGINT)
         |           AS n_students,
         |         min(gpa) OVER (PARTITION BY tahun, decile) AS lo_gpa,
         |         max(gpa) OVER (PARTITION BY tahun, decile) AS hi_gpa
         |  FROM rk)
         |SELECT tahun, decile, n_students, lo_gpa, hi_gpa,
         |       ${Star.round4Sql("pr")} AS top_pr, ${Star.round4Sql("cd")} AS top_cd
         |FROM agg WHERE rn = 1 ORDER BY tahun, decile""".stripMargin),
    // max_by ties are impossible here: gradeWeights is injective (distinct
    // weights), so equal bobot within a group implies equal huruf — both
    // engines' otherwise-arbitrary tie choice cannot differ.
    "q30_rep_grade" -> withFactSem(
      """SELECT student, tahun, semester, rep_huruf FROM sem
        |ORDER BY student, tahun, semester""".stripMargin),
    "q01_avg_ipk" -> withFact(
      s"""SELECT ${avgOfRound2edSql("ipk")} AS avg_ipk FROM (
         |  SELECT student, ${round2Sql("sum(sks*bobot) / sum(sks)")} AS ipk
         |  FROM fact GROUP BY student)""".stripMargin),
    "q02_top10_ipk" -> withFact(
      s"""SELECT student, ${round2Sql("sum(sks*bobot) / sum(sks)")} AS ipk
         |FROM fact GROUP BY student
         |ORDER BY ipk DESC, student ASC LIMIT 10""".stripMargin),
    "q03_grade_hist" -> withFact(
      """SELECT huruf, count(*) AS jumlah FROM fact GROUP BY huruf
        |ORDER BY jumlah DESC, huruf ASC""".stripMargin),
    "q04_hardest_courses" -> withFact(
      s"""SELECT course, ${round2Sql("avg(bobot)")} AS avg_bobot
         |FROM fact GROUP BY course ORDER BY avg_bobot ASC, course ASC LIMIT 5""".stripMargin),
    "q05_easiest_courses" -> withFact(
      s"""SELECT course, ${round2Sql("avg(bobot)")} AS avg_bobot
         |FROM fact GROUP BY course ORDER BY avg_bobot DESC, course ASC LIMIT 5""".stripMargin),
    "q06_semester_compare" -> withFact(
      s"""SELECT semester, ${round2Sql("sum(bobot_matkul) / sum(sks)")} AS rata_nilai
         |FROM fact GROUP BY semester ORDER BY semester""".stripMargin),
    "q07_ips_per_period" -> withFact(
      s"""SELECT tahun, semester, ${round2Sql("sum(bobot_matkul) / sum(sks)")} AS rata_nilai
         |FROM fact GROUP BY tahun, semester ORDER BY tahun, semester""".stripMargin),
    "q08_most_taken" -> withFact(
      """SELECT course, count(*) AS jumlah FROM fact GROUP BY course
        |ORDER BY jumlah DESC, course ASC LIMIT 5""".stripMargin),
    "q09_passed_credits" -> withFact(
      """SELECT student, sum(sks) AS total_sks FROM fact WHERE bobot >= 2.0
        |GROUP BY student ORDER BY student""".stripMargin),
    "q10_failed_never_passed" -> withFact(
      s"""SELECT DISTINCT student, course FROM fact f
         |WHERE huruf IN ($failingList)
         |  AND NOT EXISTS (SELECT 1 FROM fact p
         |                  WHERE p.student = f.student AND p.course = f.course
         |                    AND p.huruf NOT IN ($failingList))
         |ORDER BY student, course""".stripMargin),
    "q11_retaken" -> withFact(
      """SELECT student, course, count(*) AS jumlah FROM fact
        |GROUP BY student, course HAVING count(*) > 1
        |ORDER BY jumlah DESC, student ASC, course ASC""".stripMargin),
    "q12_stage_gpa" -> withFactTahapMhs(
      s"""SELECT ${avgOfRound2edSql("ip_persiapan")} AS avg_ip_persiapan,
         |       ${avgOfRound2edSql("ip_sarjana")} AS avg_ip_sarjana
         |FROM mhs WHERE ip_persiapan > 0 AND ip_sarjana > 0""".stripMargin),
    "q13_top_persiapan" -> withFactTahapMhs(
      """SELECT student, ip_persiapan FROM mhs
        |ORDER BY ip_persiapan DESC, student ASC LIMIT 5""".stripMargin),
    "q14_top_sarjana" -> withFactTahapMhs(
      """SELECT student, ip_sarjana FROM mhs
        |ORDER BY ip_sarjana DESC, student ASC LIMIT 5""".stripMargin),
    // CAST to BIGINT: DuckDB sum(int) returns HUGEINT which materializes as
    // float64 via Arrow/pandas; Spark emits int64 — identical values would
    // still hash-mismatch (the one r1 failure, CORRECTNESS_r01.json q15).
    "q15_pass_fail" -> withFact(
      s"""SELECT course,
         |       CAST(sum(CASE WHEN huruf NOT IN ($failingList) THEN 1 ELSE 0 END) AS BIGINT) AS lulus,
         |       CAST(sum(CASE WHEN huruf IN ($failingList) THEN 1 ELSE 0 END) AS BIGINT) AS gagal
         |FROM fact GROUP BY course ORDER BY course""".stripMargin),
    "q16_jalur_masuk" -> withFact(
      s"""SELECT student, $jalurSql AS jalur_masuk
         |FROM (SELECT DISTINCT student FROM fact) ORDER BY student""".stripMargin),
    "q17_gpa_per_jalur" -> withFact(
      s"""SELECT jalur_masuk, ${avgOfRound2edSql("ipk")} AS avg_ipk, count(*) AS jumlah FROM (
         |  SELECT student, ${round2Sql("sum(sks*bobot) / sum(sks)")} AS ipk, $jalurSql AS jalur_masuk
         |  FROM fact GROUP BY student)
         |GROUP BY jalur_masuk ORDER BY avg_ipk DESC, jalur_masuk ASC""".stripMargin),
    "q18_unweighted_avg" -> withFact(
      s"""SELECT student, ${round2Sql("avg(bobot)")} AS rata_bobot
         |FROM fact GROUP BY student ORDER BY rata_bobot DESC, student ASC""".stripMargin),
    "q19_semesters_attended" -> withFact(
      """SELECT student, count(DISTINCT concat_ws('-', tahun, semester)) AS jumlah_semester
        |FROM fact GROUP BY student ORDER BY student""".stripMargin),
    "q20_worst_grade" -> withFact(
      """SELECT student, min(bobot) AS nilai_terendah FROM fact
        |GROUP BY student ORDER BY nilai_terendah ASC, student ASC""".stripMargin),
    "q21_ips_trend" -> withFactSem(
      """SELECT student, tahun, semester, ips FROM sem
        |ORDER BY student, tahun, semester""".stripMargin),
    "q22_ips_delta" -> withFactSem(
      """SELECT student, tahun, semester, prev_ips, ips, kenaikan_ips FROM (
        |  SELECT student, tahun, semester, ips,
        |         lag(ips, 1) OVER (PARTITION BY student ORDER BY tahun, semester) AS prev_ips,
        |         ips - lag(ips, 1) OVER (PARTITION BY student ORDER BY tahun, semester) AS kenaikan_ips
        |  FROM sem)
        |WHERE kenaikan_ips IS NOT NULL
        |ORDER BY kenaikan_ips DESC, student ASC, tahun ASC, semester ASC LIMIT 10""".stripMargin),
    "q23_consistent_high" -> withFactSem(
      """SELECT student, min(ipk) AS min_ipk, max(ipk) AS max_ipk FROM sem
        |GROUP BY student HAVING min(ipk) >= 3.0 ORDER BY student""".stripMargin),
    "q24_first_vs_last" -> withFactSem(
      s"""SELECT ${avgOfRound2edSql("first_ipk")} AS avg_first_ipk,
         |       ${avgOfRound2edSql("last_ipk")} AS avg_last_ipk FROM (
         |  SELECT first_value(ipk) OVER w AS first_ipk,
         |         last_value(ipk) OVER w AS last_ipk
         |  FROM sem
         |  WINDOW w AS (PARTITION BY student ORDER BY tahun, semester
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))""".stripMargin),
    "q25_latest_low" -> withFactSem(
      """SELECT count(*) AS jumlah_mahasiswa FROM (
        |  SELECT ipk, rank() OVER (PARTITION BY student ORDER BY tahun DESC, semester DESC) AS urutan
        |  FROM sem)
        |WHERE urutan = 1 AND ipk < 2.0""".stripMargin),
    "q26_ips_distribution" -> withFactSem(
      """SELECT tahun, semester, ips FROM sem ORDER BY tahun, semester, ips""".stripMargin),
    "q27_consecutive_pairs" -> withFactSem(
      """SELECT student, tahun, semester, prev_ips, ips FROM (
        |  SELECT student, tahun, semester, ips,
        |         lag(tahun, 1) OVER w AS prev_tahun,
        |         lag(semester, 1) OVER w AS prev_semester,
        |         lag(ips, 1) OVER w AS prev_ips
        |  FROM sem
        |  WINDOW w AS (PARTITION BY student ORDER BY tahun, semester))
        |WHERE (tahun = prev_tahun AND semester = 'Genap' AND prev_semester = 'Gasal')
        |   OR (tahun = prev_tahun + 1 AND semester = 'Gasal' AND prev_semester = 'Genap')
        |ORDER BY student, tahun, semester""".stripMargin),
    "q28_ips_ranking" -> withFactSem(
      """SELECT tahun, semester, student, ips,
        |       rank() OVER (PARTITION BY tahun, semester ORDER BY ips DESC) AS peringkat
        |FROM sem
        |ORDER BY tahun ASC, semester ASC, peringkat ASC, student ASC""".stripMargin),
    "q29_biggest_drop" -> withFactSem(
      s"""SELECT tahun, semester, rata_ips, prev_rata_ips,
         |       ${round2Sql("prev_rata_ips - rata_ips")} AS penurunan FROM (
         |  SELECT tahun, semester, rata_ips,
         |         lag(rata_ips, 1) OVER (ORDER BY tahun, semester) AS prev_rata_ips FROM (
         |    SELECT tahun, semester, ${avgOfRound2edSql("ips")} AS rata_ips
         |    FROM sem GROUP BY tahun, semester))
         |WHERE prev_rata_ips IS NOT NULL
         |ORDER BY penurunan DESC, tahun ASC, semester ASC LIMIT 1""".stripMargin),
  )
}
