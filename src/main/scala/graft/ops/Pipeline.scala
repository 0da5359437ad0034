package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.etl.Star
import graft.etl.Star.{round4, round4Sql, withFact}
import TextCore._

/** Composite / multi-dimensional queries.
  *
  *  - q56: ROLLUP over the star's time hierarchy — the grouping-sets
  *    surface (absent from the reference, SURVEY.md §2.5; included
  *    because period ⊂ year ⊂ grand-total is the natural OLAP cut of the
  *    semester fact). Measures are exact in double (integral sks,
  *    half-step weights), so partial-aggregation order cannot perturb
  *    the hash gate.
  *  - q57: the training-data pipeline composition the LLM-data operators
  *    exist for: quality-score filter → exact-dedup survivor pass →
  *    per-language corpus statistics, in one declarative plan (filter and
  *    dedup window are map-side/one shuffle; the final agg is on lang).
  *  - q70: deterministic hash split; q77/q88: the two train/eval
  *    contamination detectors over that split; q87: the staged curation
  *    funnel report. All four ride [[TextCore.idBucket]].
  */
object Pipeline {
  type Q = (SparkSession, String) => DataFrame

  /** q56: (tahun, semester) rollup of event counts and credit sums. */
  val q56_star_rollup: Q = (s, d) => {
    // via spark.sql over a temp view: referencing rollup grouping columns
    // through the DataFrame API trips Spark 4's self-join ambiguity
    // detection (the rollup output keeps the input attributes visible);
    // the SQL path resolves them unambiguously.
    Star.fact(s, d).createOrReplaceTempView("graft_fact_v")
    s.sql(
      """SELECT CAST(grouping_id() AS BIGINT) AS gid,
        |       tahun, semester,
        |       count(*) AS n,
        |       sum(sks) AS sum_sks,
        |       sum(bobot_matkul) AS sum_bm
        |FROM graft_fact_v
        |GROUP BY ROLLUP (tahun, semester)
        |ORDER BY gid ASC, tahun ASC NULLS FIRST, semester ASC NULLS FIRST""".stripMargin)
  }

  /** q126: CUBE over the same hierarchy — the grouping-sets surface q56's
    * ROLLUP doesn't reach: CUBE adds the (semester)-only slice (every
    * semester across years), the cross-tab a reporting layer actually
    * pivots on. Same SQL-path rationale as q56; the gid disambiguates the
    * four grouping sets in both engines. */
  val q126_star_cube: Q = (s, d) => {
    Star.fact(s, d).createOrReplaceTempView("graft_fact_v")
    s.sql(
      """SELECT CAST(grouping_id() AS BIGINT) AS gid,
        |       tahun, semester,
        |       count(*) AS n,
        |       sum(sks) AS sum_sks,
        |       sum(bobot_matkul) AS sum_bm
        |FROM graft_fact_v
        |GROUP BY CUBE (tahun, semester)
        |ORDER BY gid ASC, tahun ASC NULLS FIRST, semester ASC NULLS FIRST""".stripMargin)
  }

  /** q57: quality filter → dedup survivors → per-lang stats. */
  val q57_pipeline: Q = (s, d) => {
    val w = Window.partitionBy("fp").orderBy("doc_id")
    TextStats.withQuality(docShingles(s, d))
      .withColumn("fp", md5(col("norm")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col("score") >= 0.68 && col("n_tokens") >= 20)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        round4(avg(col("score"))).as("avg_score"))
      .orderBy("lang")
  }

  /** q70: deterministic train/val/test split — assignment is a pure
    * function of doc_id (first 4 md5 hex digits mod 100: 80/10/10), so
    * the split is reproducible across runs, engines, and cluster sizes.
    * `randomSplit` would not be: its sampling depends on partitioning and
    * seed plumbing, and re-partitioned data re-splits differently — a
    * silent train/test leak. Map-side assignment, 3-row aggregate. */
  val q70_data_split: Q = (s, d) => {
    val bucket = idBucket(col("doc_id"))
    docShingles(s, d)
      .select(col("doc_id"), size(col("words")).cast("long").as("n_tokens"))
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
      .orderBy("split")
  }

  /** q77: train/eval contamination check — the audit a training pipeline
    * runs before trusting its eval numbers: for each TEST-split document
    * (q70's deterministic hash split), the fraction of its distinct word
    * 3-shingles that also occur anywhere in the TRAIN split
    * (`containment`), flagged contaminated at ≥ 0.6 (between the corpus
    * median ≈0.53 and max 1.0, so both branches are exercised; threshold
    * on the raw ratio, output rounded).
    *
    * Scale shape: the train side collapses to a DISTINCT shingle set (an
    * inverted index — shuffles on shingle strings only, never doc text);
    * test postings left-join it on the shingle key and re-aggregate per
    * doc_id. At cluster scale the train set is either broadcast (it is
    * vocabulary-, not corpus-, sized after distinct) or bucket-joined;
    * nothing is quadratic in documents. Test docs with no shingles
    * (< 3 words) are excluded on both sides. */
  val q77_contamination: Q = (s, d) => {
    val docs = docShingles(s, d).select(col("doc_id"), col("shingles"))
      .withColumn("bucket", idBucket(col("doc_id")))
    val train = docs.where(col("bucket") < 80)
      .select(explode(col("shingles")).as("sh")).distinct()
      .withColumn("hit", lit(1))
    val test = docs.where(col("bucket") >= 90 && size(col("shingles")) > 0)
      .select(col("doc_id"), size(col("shingles")).cast("long").as("n_sh"),
        explode(col("shingles")).as("sh"))
    val containment = col("n_hit").cast("double") / col("n_sh").cast("double")
    test.join(train, Seq("sh"), "left")
      .groupBy("doc_id", "n_sh")
      .agg(count(col("hit")).as("n_hit"))
      .select(col("doc_id"), col("n_sh"), col("n_hit"),
        round4(containment).as("containment"),
        when(containment >= 0.6, 1L).otherwise(0L).as("contaminated"))
      .orderBy("doc_id")
  }

  /** q88: verbatim contamination — the long-run detector that complements
    * q77's shingle-fraction containment: a TEST-split document is flagged
    * when ANY of its rolling 8-token windows (stride 1) occurs verbatim
    * anywhere in the TRAIN split — the n-gram-overlap decontamination rule
    * of large-LM eval hygiene (a verbatim 8-gram is near-certain copying;
    * a 60% 3-shingle fraction can be topical). At sf0.01 it flags 3 of 52
    * test docs — the dedup plants crossing the split — while q77's
    * threshold flags overlap-heavy docs; the two detectors are
    * deliberately different signals. Scale shape identical to q77: the
    * train side collapses to a DISTINCT window-hash set (shuffles on
    * 32-char hashes only), test windows left-join it. */
  val q88_verbatim_contamination: Q = (s, d) => {
    val n = 8
    // rolling windows hashed in place — no document text ever shuffles;
    // size >= n guard before sequence() (sequence(1, 0) counts DOWN)
    val wins = when(size(col("words")) >= n,
      array_distinct(transform(sequence(lit(1), size(col("words")) - (n - 1)),
        i => md5(concat_ws(" ",
          (0 until n).map(k => element_at(col("words"), i + k)): _*)))))
      .otherwise(array().cast("array<string>"))
    val docs = docShingles(s, d).select(col("doc_id"), wins.as("wins"))
      .withColumn("bucket", idBucket(col("doc_id")))
    val train = docs.where(col("bucket") < 80)
      .select(explode(col("wins")).as("w")).distinct().withColumn("hit", lit(1))
    val test = docs.where(col("bucket") >= 90 && size(col("wins")) > 0)
      .select(col("doc_id"), size(col("wins")).cast("long").as("n_windows"),
        explode(col("wins")).as("w"))
    test.join(train, Seq("w"), "left")
      .groupBy("doc_id", "n_windows")
      .agg(count(col("hit")).as("n_hits"))
      .select(col("doc_id"), col("n_windows"), col("n_hits"),
        when(col("n_hits") > 0, 1L).otherwise(0L).as("verbatim_contaminated"))
      .orderBy("doc_id")
  }

  /** q87: the curation funnel — the one-page report a pipeline run prints:
    * corpus size after each curation stage (raw → exact dedup → near-dup
    * cluster survivors → quality gate), in documents and tokens. Stages
    * are successive filters (each row passes stage k iff it passes k-1):
    * exact keeps the first doc_id per fingerprint; near-dup keeps cluster
    * survivors (q61 component label = own id; a cluster survivor is
    * always also its fingerprint group's first, since the fp group is a
    * subset of the cluster); quality applies the q57 thresholds. One
    * conditional aggregation over the corpus (single pass, no per-stage
    * re-scan), exploded to the 4 report rows. */
  /** The staged conditional aggregation + explode shared by q87 (global)
    * and q100 (per split): 4 report rows per group from one corpus pass.
    * The coalesces matter only in the global (keys-empty) form, where an
    * empty corpus still emits its 4 zeroed rows; a grouped form has no
    * empty groups. `s2 ⊇ s3 ⊇ s4` is the CALLER's monotonicity
    * obligation. */
  private def funnelReport(base: DataFrame, s2: Column, s3: Column,
      s4: Column, keys: Seq[String]): DataFrame = {
    def cnt(c: Column) = coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L))
    def tok(c: Column) = coalesce(sum(when(c, col("n_tokens")).otherwise(0L)), lit(0L))
    val measures = Seq(
      count(lit(1)).as("c1"), coalesce(sum("n_tokens"), lit(0L)).as("t1"),
      cnt(s2).as("c2"), tok(s2).as("t2"),
      cnt(s3).as("c3"), tok(s3).as("t3"),
      cnt(s4).as("c4"), tok(s4).as("t4"))
    val agg =
      if (keys.isEmpty) base.agg(measures.head, measures.tail: _*)
      else base.groupBy(keys.map(col): _*).agg(measures.head, measures.tail: _*)
    def stageStruct(id: Int, name: String, c: String, t: String) =
      struct(lit(id.toLong).as("stage_id"), lit(name).as("stage"),
        col(c).as("n_docs"), col(t).as("n_tokens"))
    val outKeys = keys.map(col)
    agg.select(outKeys :+ explode(array(
        stageStruct(1, "raw", "c1", "t1"),
        stageStruct(2, "exact_dedup", "c2", "t2"),
        stageStruct(3, "near_dedup", "c3", "t3"),
        stageStruct(4, "quality", "c4", "t4"))).as("st"): _*)
      .select(outKeys ++ Seq(col("st.stage_id").as("stage_id"),
        col("st.stage").as("stage"),
        col("st.n_docs").as("n_docs"), col("st.n_tokens").as("n_tokens")): _*)
      .orderBy((keys :+ "stage_id").map(col): _*)
  }

  val q87_curation_funnel: Q = (s, d) => {
    val w = Window.partitionBy("fp").orderBy("doc_id")
    val base = TextStats.withQuality(docShingles(s, d))
      .withColumn("fp", md5(col("norm")))
      .withColumn("rn", row_number().over(w))
      // no broadcast hint: labels are corpus-fraction-sized at crawl
      // dup rates (Dedup.memoLabels) — AQE elects the join strategy
      .join(Dedup.memoLabels(s, d), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("component_id"), col("doc_id")))
    val s2 = col("rn") === 1
    val s3 = s2 && col("cluster_id") === col("doc_id")
    val s4 = s3 && col("score") >= 0.68 && col("n_tokens") >= 20
    funnelReport(base, s2, s3, s4, Seq.empty)
  }

  /** q280: DEDUP-AWARE MIXTURE SHIFT — the composition that closes the
    * loop between the dedup family and q268's mixture math: sampling
    * weights computed on RAW tokens treat every mirror copy as
    * independent evidence, so the honest mixture runs on the tokens
    * that SURVIVE curation stage 3 (q87's exact-dedup + near-dup
    * representative rules, verbatim). Per source: raw vs surviving
    * tokens, the temperature weight under each (q268's
    * quantize-√-then-integer-normalize), and shift_bp — the weight a
    * source LOSES once its duplication is accounted for (a heavily
    * mirrored source shifts negative: exactly the srcX-copies-srcY
    * signal q278 localizes). Scale: q87's one fp-keyed shuffle + the
    * hint-free label join, then a source-domain-bounded aggregate. */
  val q280_dedup_mixture_shift: Q = (s, d) => {
    val w = Window.partitionBy("fp").orderBy("doc_id")
    val base = TextStats.withQuality(docShingles(s, d))
      .withColumn("fp", md5(col("norm")))
      .withColumn("rn", row_number().over(w))
      .join(Dedup.memoLabels(s, d), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("component_id"), col("doc_id")))
    val surv = col("rn") === 1 && col("cluster_id") === col("doc_id")
    val per = base.groupBy("source").agg(
        sum("n_tokens").as("raw_tokens"),
        sum(when(surv, col("n_tokens")).otherwise(0L)).as("surv_tokens"))
      .withColumn("sq_raw",
        floor(sqrt(col("raw_tokens").cast("double")) * 100).cast("long"))
      .withColumn("sq_surv",
        floor(sqrt(col("surv_tokens").cast("double")) * 100).cast("long"))
    per
      .crossJoin(broadcast(per.agg(
        sum("sq_raw").as("tr"), sum("sq_surv").as("ts"))))
      .select(col("source"), col("raw_tokens"), col("surv_tokens"),
        expr("sq_raw * 10000 div tr").as("w_raw_bp"),
        expr("sq_surv * 10000 div ts").as("w_surv_bp"))
      .withColumn("shift_bp", col("w_surv_bp") - col("w_raw_bp"))
      .orderBy("source")
  }

  /** q232: per-document curation LINEAGE — the row-level provenance
    * q87's aggregate funnel cannot answer: for THIS doc, which stage
    * rejected it, and which surviving doc blocked it? Stage rules are
    * q87's, verbatim and in the same order (first failure wins):
    * `exact_dup` (not the first doc of its normalized-text
    * fingerprint; blocked_by = the keeper, the fp group's min id),
    * `near_dup` (fp-canonical but not its q61 cluster's
    * representative; blocked_by = the cluster id), `low_quality`
    * (fails the q57/q87 score/length gate; blocked_by NULL), else
    * `kept`. This is the audit table a curation pipeline publishes so
    * a data owner can ask "why is my document missing from the
    * training set" and get an answer with a pointer — and summing it
    * by stage reproduces q87's funnel by construction. Scale shape:
    * both per-fp windows share ONE fp-keyed shuffle; the cluster-label
    * join carries no hint (labels are corpus-fraction-sized at crawl
    * dup rates — Dedup.memoLabels; AQE elects); no new corpus pass. */
  val q232_doc_lineage: Q = (s, d) => {
    val wfp = Window.partitionBy("fp")
    val base = TextStats.withQuality(docShingles(s, d))
      .withColumn("fp", md5(col("norm")))
      .withColumn("rn", row_number().over(wfp.orderBy("doc_id")))
      .withColumn("fp_keeper", min("doc_id").over(wfp))
      .join(Dedup.memoLabels(s, d), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("component_id"), col("doc_id")))
    base.select(col("doc_id"),
        when(col("rn") =!= 1, lit("exact_dup"))
          .when(col("cluster_id") =!= col("doc_id"), lit("near_dup"))
          .when(!(col("score") >= 0.68 && col("n_tokens") >= 20),
            lit("low_quality"))
          .otherwise(lit("kept")).as("stage_out"),
        when(col("rn") =!= 1, col("fp_keeper"))
          .when(col("cluster_id") =!= col("doc_id"), col("cluster_id"))
          .otherwise(lit(null).cast("long")).as("blocked_by"))
      .orderBy("doc_id")
  }

  /** q100: the capstone composition — q87's curation funnel run PER SPLIT
    * of q70's deterministic hash split: for each of train/val/test, the
    * doc and token counts surviving raw → split-local exact dedup (first
    * doc per (split, fp)) → split-local near-dup survivors (first doc per
    * (split, cluster): each split keeps one representative of every q61
    * cluster it sees, which implies the exact-dedup stage since identical
    * docs always share a cluster) → the q57 quality gate. This is the
    * table a training run reads last: what each split actually ships
    * after curation. One pass over the corpus: two (split, key) windows +
    * a split-keyed conditional aggregation exploded to 4 rows per split —
    * no per-stage re-scan. An empty corpus yields no splits, hence no
    * rows (unlike q87's fixed 4-row report). */
  val q100_split_funnel: Q = (s, d) => {
    val b = idBucket(col("doc_id"))
    val base = TextStats.withQuality(docShingles(s, d))
      .withColumn("split",
        when(b < 80, "train").when(b < 90, "val").otherwise("test"))
      .withColumn("fp", md5(col("norm")))
      .join(Dedup.memoLabels(s, d), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("component_id"), col("doc_id")))
      .withColumn("rn",
        row_number().over(Window.partitionBy("split", "fp").orderBy("doc_id")))
      .withColumn("rn_cl",
        row_number().over(Window.partitionBy("split", "cluster_id").orderBy("doc_id")))
    val s2 = col("rn") === 1
    // the explicit s2 conjunction matters: identical docs with < 3 words
    // have EMPTY shingle sets, so they never become near-dup candidates
    // and each keeps a singleton cluster — rn_cl alone would then admit
    // stage-3 rows that failed stage 2, breaking funnel monotonicity
    val s3 = s2 && col("rn_cl") === 1
    val s4 = s3 && col("score") >= 0.68 && col("n_tokens") >= 20
    funnelReport(base, s2, s3, s4, Seq("split"))
  }

  /** q177: referential-integrity AUDIT across the corpus tables — the
    * read-side complement of q159's write-time CHECK constraints (q159
    * refuses bad rows entering ONE table; q177 audits what already
    * LANDED across tables, the dbt-test / expectations-suite shape):
    * one row of violation counters —
    *  - `n_dup_doc_ids` / `n_dup_vec_ids`: primary-key violations,
    *  - `n_empty_text`: NOT-NULL/non-empty violations on the payload,
    *  - `n_docs_without_emb` / `n_embs_without_doc`: the two
    *    directions of the documents↔embeddings foreign key (a doc
    *    missing its vector silently vanishes from every ANN/semantic
    *    operator; an orphan vector pollutes index builds).
    * All-zero right columns is the healthy state an ingest gate
    * asserts before promoting a snapshot. Scale shape: two per-table
    * aggregates plus two anti-joins on the id keys (narrow,
    * hash-partitioned); no payload column moves. */
  val q177_integrity_audit: Q = (s, d) => {
    val docs = s.read.parquet(s"$d/documents.parquet")
    val embs = s.read.parquet(s"$d/embeddings.parquet")
    val dd = docs.agg(
      count(lit(1)).as("n_docs"),
      (count(lit(1)) - countDistinct(col("doc_id"))).as("n_dup_doc_ids"),
      sum(when(col("text").isNull || length(col("text")) === 0, 1L)
        .otherwise(0L)).as("n_empty_text"))
    val ee = embs.agg(
      count(lit(1)).as("n_embs"),
      (count(lit(1)) - countDistinct(col("vec_id"))).as("n_dup_vec_ids"))
    val dwe = docs.select("doc_id")
      .join(embs.select(col("vec_id").as("doc_id")), Seq("doc_id"), "left_anti")
      .agg(count(lit(1)).as("n_docs_without_emb"))
    val ewd = embs.select("vec_id")
      .join(docs.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_anti")
      .agg(count(lit(1)).as("n_embs_without_doc"))
    dd.crossJoin(ee).crossJoin(dwe).crossJoin(ewd)
      .select(col("n_docs"), col("n_embs"), col("n_dup_doc_ids"),
        col("n_dup_vec_ids"), col("n_empty_text"),
        col("n_docs_without_emb"), col("n_embs_without_doc"))
  }

  /** q287's one-pass per-table profile: (tab, col, n_rows, n_null,
    * n_distinct, min_s, max_s) for each requested (name, column) —
    * min/max in the column's native type, cast to string only on
    * output. Factored so the spec can drive it with null/dup layouts
    * the corpus doesn't contain. */
  private[graft] def columnProfile(tab: String, df: DataFrame,
                                   cols: Seq[(String, Column)]): DataFrame = {
    val aggs = cols.zipWithIndex.flatMap { case ((_, c), i) =>
      Seq(sum(when(c.isNull, 1L).otherwise(0L)).as(s"nn$i"),
        countDistinct(c).as(s"nd$i"),
        min(c).cast("string").as(s"mn$i"),
        max(c).cast("string").as(s"mx$i"))
    }
    val row = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = cols.zipWithIndex.map { case ((n, _), i) =>
      s"'$n', nn$i, nd$i, mn$i, mx$i"
    }.mkString(", ")
    row.select(lit(tab).as("tab"), col("n_rows"),
      expr(s"stack(${cols.size}, $stackArgs)")
        .as(Seq("col", "n_null", "n_distinct", "min_s", "max_s")))
      .select("tab", "col", "n_rows", "n_null", "n_distinct",
        "min_s", "max_s")
  }

  /** q287: CROSS-TABLE COLUMN-PROFILE report — the per-column companion
    * of q177's integrity audit, and deliberately NOT q197: q197 is the
    * ANALYZE-style single-table profile that renders every column to
    * string first (lexicographic extrema, explode = k× row
    * multiplication); q287 is the data-catalog surface — multiple
    * tables in one report, (null count, exact distinct count, min,
    * max) with extrema in each column's NATIVE type (lexicographic
    * min of "10"/"9" is exactly the q197 caveat this fixes), one
    * aggregate per table. Conventions that keep the
    * cross-engine hash exact: `text` is profiled entirely through its
    * md5 fingerprint — same distinct count, min/max are over the
    * 32-char hex (a determinism checksum), and the payload column
    * never ships into the profile shuffle; `value` is profiled in the
    * house integer-cents domain. Scale shape: Spark plans the k distinct
    * aggregates as one expand pass (rows × k) — the standard profiling
    * cost, linear with a column-count factor, no per-column rescan of
    * the parquet; stack() is a map-side unpivot of a 1-row frame. */
  val q287_column_profile: Q = (s, d) => {
    val docs = s.read.parquet(s"$d/documents.parquet")
    val evs = s.read.parquet(s"$d/events.parquet")
    columnProfile("documents", docs, Seq(
        "doc_id" -> col("doc_id"),
        "lang" -> col("lang"),
        "n_chars" -> col("n_chars"),
        "source" -> col("source"),
        "text" -> md5(col("text"))))
      .unionByName(columnProfile("events", evs, Seq(
        "event_id" -> col("event_id"),
        "event_type" -> col("event_type"),
        "user_id" -> col("user_id"),
        "value_cents" -> expr("CAST(round(value * 100) AS BIGINT)"))))
      .orderBy("tab", "col")
  }

  /** q310: SNAPSHOT PROMOTION GATE — the one-row composition a nightly
    * job reads before promoting a data snapshot, built by CALLING the
    * component checks (one definition each, so the gate can never
    * disagree with the detailed rows it summarizes): q177's
    * referential-integrity violations, q229's TV-drift alarms and
    * q290's KS alarms (counts of drifted types), and q295's
    * overdispersion count riding as context (burstiness is an ops
    * signal, not a data-quality failure — deliberately OUTSIDE the
    * promote rule). promote = 1 iff integrity is clean AND no
    * distribution alarm fired. Scale: each component is its gated
    * plan; the composition adds four 1-row broadcasts. */
  val q310_promotion_gate: Q = (s, d) => {
    val ri = q177_integrity_audit(s, d)
      .select((col("n_dup_doc_ids") + col("n_dup_vec_ids") +
        col("n_empty_text") + col("n_docs_without_emb") +
        col("n_embs_without_doc")).as("n_ri"))
    val tv = graft.ops.Events.q229_dist_drift(s, d)
      .agg(coalesce(sum("drifted"), lit(0L)).as("n_tv_drift"))
    val ks = graft.ops.Events.q290_ks_drift(s, d)
      .agg(coalesce(sum("drifted"), lit(0L)).as("n_ks_drift"))
    val od = graft.ops.Events.q295_dispersion(s, d)
      .agg(coalesce(sum("overdispersed"), lit(0L)).as("n_overdispersed"))
    ri.crossJoin(broadcast(tv)).crossJoin(broadcast(ks))
      .crossJoin(broadcast(od))
      .withColumn("promote",
        when(col("n_ri") === 0L && col("n_tv_drift") === 0L &&
          col("n_ks_drift") === 0L, 1L).otherwise(0L))
  }

  /** q210: CUSTOM GROUPING SETS — the third grouping-sets surface:
    * q56's ROLLUP walks the hierarchy, q126's CUBE takes every subset,
    * and this takes a HAND-PICKED set — ((tahun), (semester)) — that
    * neither shorthand can express (no grand total, no finest cell):
    * exactly the two independent marginals a report wants without
    * paying the cross product. Same SQL-path + gid disambiguation as
    * q56/q126. */
  val q210_grouping_sets: Q = (s, d) => {
    Star.fact(s, d).createOrReplaceTempView("graft_fact_v")
    s.sql(
      """SELECT CAST(grouping_id() AS BIGINT) AS gid,
        |       tahun, semester,
        |       count(*) AS n,
        |       sum(sks) AS sum_sks,
        |       sum(bobot_matkul) AS sum_bm
        |FROM graft_fact_v
        |GROUP BY GROUPING SETS ((tahun), (semester))
        |ORDER BY gid ASC, tahun ASC NULLS FIRST, semester ASC NULLS FIRST""".stripMargin)
  }

  /** q211: PIVOT — the wide cross-tab operator itself (not the CUBE
    * that feeds one): per day, event counts spread into one column per
    * type. The Spark side uses the genuine `groupBy().pivot()` relational
    * operator WITH AN EXPLICIT VALUE LIST — open-ended pivots scan once
    * to discover columns and make the schema data-dependent, both wrong
    * at scale — and absent cells are 0-filled so the frame is dense.
    * The oracle states the same table as conditional sums, proving the
    * pivot is semantics, not magic. */
  val q211_pivot_matrix: Q = (s, d) => {
    val types = Seq("click", "error", "purchase", "signup", "view")
    graft.ops.Events.events(s, d)
      .groupBy(expr("CAST(es div 86400 AS BIGINT)").as("day"))
      .pivot("event_type", types)
      .count()
      .na.fill(0L, types)
      .orderBy("day")
  }

  val queries: Map[String, Q] = Map(
    "q177_integrity_audit" -> q177_integrity_audit,
    "q287_column_profile" -> q287_column_profile,
    "q310_promotion_gate" -> q310_promotion_gate,
    "q210_grouping_sets" -> q210_grouping_sets,
    "q211_pivot_matrix" -> q211_pivot_matrix,
    "q56_star_rollup" -> q56_star_rollup,
    "q126_star_cube" -> q126_star_cube,
    "q57_pipeline" -> q57_pipeline,
    "q70_data_split" -> q70_data_split,
    "q100_split_funnel" -> q100_split_funnel,
    "q77_contamination" -> q77_contamination,
    "q87_curation_funnel" -> q87_curation_funnel,
    "q280_dedup_mixture_shift" -> q280_dedup_mixture_shift,
    "q88_verbatim_contamination" -> q88_verbatim_contamination,
    "q232_doc_lineage" -> q232_doc_lineage)

  /** q177's oracle SQL — factored so q310's promotion gate replays
    * the IDENTICAL integrity check. */
  private lazy val integrityOracleSql: String =
    """WITH dd AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(count(*) - count(DISTINCT doc_id) AS BIGINT)
        |           AS n_dup_doc_ids,
        |         CAST(sum(CASE WHEN text IS NULL OR length(text) = 0
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_empty_text
        |  FROM documents),
        |ee AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_embs,
        |         CAST(count(*) - count(DISTINCT vec_id) AS BIGINT)
        |           AS n_dup_vec_ids
        |  FROM embeddings),
        |dwe AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs_without_emb
        |  FROM documents d WHERE NOT EXISTS
        |    (SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id)),
        |ewd AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_embs_without_doc
        |  FROM embeddings e WHERE NOT EXISTS
        |    (SELECT 1 FROM documents d WHERE d.doc_id = e.vec_id))
        |SELECT n_docs, n_embs, n_dup_doc_ids, n_dup_vec_ids, n_empty_text,
        |       n_docs_without_emb, n_embs_without_doc
        |FROM dd CROSS JOIN ee CROSS JOIN dwe CROSS JOIN ewd""".stripMargin

  val oracle: Map[String, String] = Map(
    "q177_integrity_audit" -> integrityOracleSql,
    // each component oracle replayed verbatim as a subquery — one
    // definition with the detailed gated rows
    "q310_promotion_gate" -> {
      val tv = graft.ops.Events.oracle("q229_dist_drift")
      val ks = graft.ops.Events.oracle("q290_ks_drift")
      val od = graft.ops.Events.oracle("q295_dispersion")
      s"""SELECT r.n_ri, t.n_tv_drift, k.n_ks_drift, o.n_overdispersed,
         |       CAST(CASE WHEN r.n_ri = 0 AND t.n_tv_drift = 0
         |                      AND k.n_ks_drift = 0
         |                 THEN 1 ELSE 0 END AS BIGINT) AS promote
         |FROM (SELECT CAST(n_dup_doc_ids + n_dup_vec_ids + n_empty_text
         |                  + n_docs_without_emb + n_embs_without_doc
         |             AS BIGINT) AS n_ri
         |      FROM ($integrityOracleSql)) r
         |CROSS JOIN (SELECT CAST(coalesce(sum(drifted), 0) AS BIGINT)
         |              AS n_tv_drift FROM ($tv)) t
         |CROSS JOIN (SELECT CAST(coalesce(sum(drifted), 0) AS BIGINT)
         |              AS n_ks_drift FROM ($ks)) k
         |CROSS JOIN (SELECT CAST(coalesce(sum(overdispersed), 0) AS BIGINT)
         |              AS n_overdispersed FROM ($od)) o""".stripMargin
    },
    // one UNION-ALL row per profiled column, native-type min/max cast
    // to VARCHAR, text through md5, value in integer cents
    "q287_column_profile" ->
      """WITH p AS (
        |  SELECT 'documents' AS tab, 'doc_id' AS col,
        |         count(*) AS n_rows,
        |         sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS n_null,
        |         count(DISTINCT doc_id) AS n_distinct,
        |         CAST(min(doc_id) AS VARCHAR) AS min_s,
        |         CAST(max(doc_id) AS VARCHAR) AS max_s
        |  FROM documents
        |  UNION ALL
        |  SELECT 'documents', 'lang', count(*),
        |         sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END),
        |         count(DISTINCT lang), min(lang), max(lang)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'documents', 'n_chars', count(*),
        |         sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END),
        |         count(DISTINCT n_chars),
        |         CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'documents', 'source', count(*),
        |         sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END),
        |         count(DISTINCT source), min(source), max(source)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'documents', 'text', count(*),
        |         sum(CASE WHEN md5(text) IS NULL THEN 1 ELSE 0 END),
        |         count(DISTINCT md5(text)), min(md5(text)), max(md5(text))
        |  FROM documents
        |  UNION ALL
        |  SELECT 'events', 'event_id', count(*),
        |         sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END),
        |         count(DISTINCT event_id),
        |         CAST(min(event_id) AS VARCHAR), CAST(max(event_id) AS VARCHAR)
        |  FROM events
        |  UNION ALL
        |  SELECT 'events', 'event_type', count(*),
        |         sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END),
        |         count(DISTINCT event_type), min(event_type), max(event_type)
        |  FROM events
        |  UNION ALL
        |  SELECT 'events', 'user_id', count(*),
        |         sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END),
        |         count(DISTINCT user_id),
        |         CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR)
        |  FROM events
        |  UNION ALL
        |  SELECT 'events', 'value_cents', count(*),
        |         sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END),
        |         count(DISTINCT CAST(round(value * 100) AS BIGINT)),
        |         CAST(min(CAST(round(value * 100) AS BIGINT)) AS VARCHAR),
        |         CAST(max(CAST(round(value * 100) AS BIGINT)) AS VARCHAR)
        |  FROM events)
        |SELECT tab, col, CAST(n_rows AS BIGINT) AS n_rows,
        |       CAST(n_null AS BIGINT) AS n_null,
        |       CAST(n_distinct AS BIGINT) AS n_distinct, min_s, max_s
        |FROM p ORDER BY tab, col""".stripMargin,
    // same hand-picked sets, same gid disambiguation
    "q210_grouping_sets" -> withFact(
      """SELECT CAST(GROUPING(tahun, semester) AS BIGINT) AS gid,
        |       tahun, semester,
        |       CAST(count(*) AS BIGINT) AS n,
        |       sum(sks) AS sum_sks,
        |       sum(bobot_matkul) AS sum_bm
        |FROM fact
        |GROUP BY GROUPING SETS ((tahun), (semester))
        |ORDER BY gid ASC, tahun ASC NULLS FIRST, semester ASC NULLS FIRST""".stripMargin),
    // the pivot stated as conditional sums — the wide table is
    // semantics, not engine magic
    "q211_pivot_matrix" ->
      """WITH e AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |         event_type FROM events)
        |SELECT day,
        |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
        |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        |FROM e GROUP BY day ORDER BY day""".stripMargin,
    "q56_star_rollup" -> withFact(
      """SELECT CAST(GROUPING(tahun, semester) AS BIGINT) AS gid,
        |       tahun, semester,
        |       CAST(count(*) AS BIGINT) AS n,
        |       sum(sks) AS sum_sks,
        |       sum(bobot_matkul) AS sum_bm
        |FROM fact
        |GROUP BY ROLLUP (tahun, semester)
        |ORDER BY gid ASC, tahun ASC NULLS FIRST, semester ASC NULLS FIRST""".stripMargin),
    "q126_star_cube" -> withFact(
      """SELECT CAST(GROUPING(tahun, semester) AS BIGINT) AS gid,
        |       tahun, semester,
        |       CAST(count(*) AS BIGINT) AS n,
        |       sum(sks) AS sum_sks,
        |       sum(bobot_matkul) AS sum_bm
        |FROM fact
        |GROUP BY CUBE (tahun, semester)
        |ORDER BY gid ASC, tahun ASC NULLS FIRST, semester ASC NULLS FIRST""".stripMargin),
    "q57_pipeline" -> withDocs(
      s""", ${TextStats.qualCte},
         |kept AS (
         |  SELECT *, row_number() OVER (PARTITION BY md5(norm) ORDER BY doc_id) AS rn
         |  FROM qual)
         |SELECT lang,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |       ${round4Sql("avg(score)")} AS avg_score
         |FROM kept
         |WHERE rn = 1 AND score >= 0.68 AND n_tokens >= 20
         |GROUP BY lang ORDER BY lang""".stripMargin),
    "q70_data_split" -> withDocs(
      s""", sp AS (
        |  SELECT doc_id, CAST(len(words) AS BIGINT) AS n_tokens,
        |         ${idBucketSql("doc_id")} AS bucket
        |  FROM docs)
        |SELECT CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
        |FROM sp GROUP BY 1 ORDER BY split""".stripMargin),
    "q88_verbatim_contamination" -> withDocs(
      s""", w8 AS (
        |  SELECT doc_id,
        |         CASE WHEN len(words) >= 8
        |              THEN list_distinct(list_transform(range(1, len(words) - 6),
        |                i -> md5(words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' ' ||
        |                         words[i+3] || ' ' || words[i+4] || ' ' || words[i+5] || ' ' ||
        |                         words[i+6] || ' ' || words[i+7])))
        |              ELSE CAST([] AS VARCHAR[]) END AS wins,
        |         ${idBucketSql("doc_id")} AS bucket
        |  FROM docs),
        |tr AS (SELECT DISTINCT unnest(wins) AS w FROM w8 WHERE bucket < 80),
        |te AS (
        |  SELECT doc_id, CAST(len(wins) AS BIGINT) AS n_windows, unnest(wins) AS w
        |  FROM w8 WHERE bucket >= 90 AND len(wins) > 0)
        |SELECT te.doc_id, n_windows, CAST(count(tr.w) AS BIGINT) AS n_hits,
        |       CAST(CASE WHEN count(tr.w) > 0 THEN 1 ELSE 0 END AS BIGINT)
        |         AS verbatim_contaminated
        |FROM te LEFT JOIN tr ON te.w = tr.w
        |GROUP BY te.doc_id, n_windows
        |ORDER BY te.doc_id""".stripMargin),
    "q100_split_funnel" -> withDocs(
      s"""${Dedup.ccReachCtes},
         |comp AS (
         |  SELECT src AS doc_id, CAST(least(src, min(dst)) AS BIGINT) AS component_id
         |  FROM reach GROUP BY src),
         |${TextStats.qualCte},
         |lab AS (
         |  SELECT q.doc_id, q.n_tokens, q.score,
         |         CASE WHEN ${idBucketSql("q.doc_id")} < 80 THEN 'train'
         |              WHEN ${idBucketSql("q.doc_id")} < 90 THEN 'val'
         |              ELSE 'test' END AS split,
         |         coalesce(c.component_id, q.doc_id) AS cluster_id,
         |         md5(q.norm) AS fp
         |  FROM qual q LEFT JOIN comp c ON q.doc_id = c.doc_id),
         |rk AS (
         |  SELECT *,
         |         row_number() OVER (PARTITION BY split, fp ORDER BY doc_id) AS rn,
         |         row_number() OVER (PARTITION BY split, cluster_id ORDER BY doc_id)
         |           AS rn_cl
         |  FROM lab),
         |a AS (
         |  SELECT split,
         |         CAST(count(*) AS BIGINT) AS c1,
         |         CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS t1,
         |         CAST(coalesce(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS c2,
         |         CAST(coalesce(sum(CASE WHEN rn = 1 THEN n_tokens ELSE 0 END), 0) AS BIGINT) AS t2,
         |         CAST(coalesce(sum(CASE WHEN rn = 1 AND rn_cl = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS c3,
         |         CAST(coalesce(sum(CASE WHEN rn = 1 AND rn_cl = 1 THEN n_tokens ELSE 0 END), 0) AS BIGINT) AS t3,
         |         CAST(coalesce(sum(CASE WHEN rn = 1 AND rn_cl = 1 AND score >= 0.68
         |                        AND n_tokens >= 20 THEN 1 ELSE 0 END), 0) AS BIGINT) AS c4,
         |         CAST(coalesce(sum(CASE WHEN rn = 1 AND rn_cl = 1 AND score >= 0.68
         |                        AND n_tokens >= 20 THEN n_tokens ELSE 0 END), 0) AS BIGINT) AS t4
         |  FROM rk GROUP BY split)
         |SELECT * FROM (
         |  SELECT split, CAST(1 AS BIGINT) AS stage_id, 'raw' AS stage,
         |         c1 AS n_docs, t1 AS n_tokens FROM a
         |  UNION ALL
         |  SELECT split, CAST(2 AS BIGINT), 'exact_dedup', c2, t2 FROM a
         |  UNION ALL
         |  SELECT split, CAST(3 AS BIGINT), 'near_dedup', c3, t3 FROM a
         |  UNION ALL
         |  SELECT split, CAST(4 AS BIGINT), 'quality', c4, t4 FROM a)
         |ORDER BY split, stage_id""".stripMargin)
      .replaceFirst("^WITH ", "WITH RECURSIVE "),
    // q87's survivor rules + q268's quantize-then-normalize, per source
    "q280_dedup_mixture_shift" -> withDocs(
      s"""${Dedup.ccReachCtes},
         |comp AS (
         |  SELECT src AS doc_id, CAST(least(src, min(dst)) AS BIGINT) AS component_id
         |  FROM reach GROUP BY src),
         |${TextStats.qualCte},
         |lab AS (
         |  SELECT q.doc_id, q.source, q.n_tokens,
         |         coalesce(c.component_id, q.doc_id) AS cluster_id,
         |         row_number() OVER (PARTITION BY md5(q.norm) ORDER BY q.doc_id) AS rn
         |  FROM qual q LEFT JOIN comp c ON q.doc_id = c.doc_id),
         |per AS (
         |  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS raw_tokens,
         |         CAST(coalesce(sum(CASE WHEN rn = 1 AND cluster_id = doc_id
         |              THEN n_tokens ELSE 0 END), 0) AS BIGINT) AS surv_tokens
         |  FROM lab GROUP BY 1),
         |pq AS (
         |  SELECT *,
         |         CAST(floor(sqrt(CAST(raw_tokens AS DOUBLE)) * 100) AS BIGINT)
         |           AS sq_raw,
         |         CAST(floor(sqrt(CAST(surv_tokens AS DOUBLE)) * 100) AS BIGINT)
         |           AS sq_surv
         |  FROM per),
         |t AS (
         |  SELECT CAST(sum(sq_raw) AS BIGINT) AS tr,
         |         CAST(sum(sq_surv) AS BIGINT) AS ts
         |  FROM pq)
         |SELECT source, raw_tokens, surv_tokens,
         |       sq_raw * 10000 // tr AS w_raw_bp,
         |       sq_surv * 10000 // ts AS w_surv_bp,
         |       sq_surv * 10000 // ts - sq_raw * 10000 // tr AS shift_bp
         |FROM pq CROSS JOIN t
         |ORDER BY source""".stripMargin)
      .replaceFirst("^WITH ", "WITH RECURSIVE "),
    "q87_curation_funnel" -> withDocs(
      s"""${Dedup.ccReachCtes},
         |comp AS (
         |  SELECT src AS doc_id, CAST(least(src, min(dst)) AS BIGINT) AS component_id
         |  FROM reach GROUP BY src),
         |${TextStats.qualCte},
         |lab AS (
         |  SELECT q.doc_id, q.n_tokens, q.score,
         |         coalesce(c.component_id, q.doc_id) AS cluster_id,
         |         row_number() OVER (PARTITION BY md5(q.norm) ORDER BY q.doc_id) AS rn
         |  FROM qual q LEFT JOIN comp c ON q.doc_id = c.doc_id),
         |a AS (
         |  SELECT CAST(count(*) AS BIGINT) AS c1,
         |         CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS t1,
         |         CAST(coalesce(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS c2,
         |         CAST(coalesce(sum(CASE WHEN rn = 1 THEN n_tokens ELSE 0 END), 0) AS BIGINT) AS t2,
         |         CAST(coalesce(sum(CASE WHEN rn = 1 AND cluster_id = doc_id THEN 1 ELSE 0 END), 0) AS BIGINT) AS c3,
         |         CAST(coalesce(sum(CASE WHEN rn = 1 AND cluster_id = doc_id THEN n_tokens ELSE 0 END), 0) AS BIGINT) AS t3,
         |         CAST(coalesce(sum(CASE WHEN rn = 1 AND cluster_id = doc_id
         |                        AND score >= 0.68 AND n_tokens >= 20 THEN 1 ELSE 0 END), 0) AS BIGINT) AS c4,
         |         CAST(coalesce(sum(CASE WHEN rn = 1 AND cluster_id = doc_id
         |                        AND score >= 0.68 AND n_tokens >= 20 THEN n_tokens ELSE 0 END), 0) AS BIGINT) AS t4
         |  FROM lab)
         |SELECT CAST(1 AS BIGINT) AS stage_id, 'raw' AS stage, c1 AS n_docs, t1 AS n_tokens FROM a
         |UNION ALL
         |SELECT CAST(2 AS BIGINT), 'exact_dedup', c2, t2 FROM a
         |UNION ALL
         |SELECT CAST(3 AS BIGINT), 'near_dedup', c3, t3 FROM a
         |UNION ALL
         |SELECT CAST(4 AS BIGINT), 'quality', c4, t4 FROM a
         |ORDER BY stage_id""".stripMargin)
      .replaceFirst("^WITH ", "WITH RECURSIVE "),
    // q87's stage rules verbatim (same CTEs), emitted per row with the
    // first failing stage and its blocking pointer instead of summed
    "q232_doc_lineage" -> withDocs(
      s"""${Dedup.ccReachCtes},
         |comp AS (
         |  SELECT src AS doc_id, CAST(least(src, min(dst)) AS BIGINT) AS component_id
         |  FROM reach GROUP BY src),
         |${TextStats.qualCte},
         |lab AS (
         |  SELECT q.doc_id, q.n_tokens, q.score,
         |         coalesce(c.component_id, q.doc_id) AS cluster_id,
         |         row_number() OVER (PARTITION BY md5(q.norm) ORDER BY q.doc_id) AS rn,
         |         min(q.doc_id) OVER (PARTITION BY md5(q.norm)) AS fp_keeper
         |  FROM qual q LEFT JOIN comp c ON q.doc_id = c.doc_id)
         |SELECT doc_id,
         |       CASE WHEN rn <> 1 THEN 'exact_dup'
         |            WHEN cluster_id <> doc_id THEN 'near_dup'
         |            WHEN NOT (score >= 0.68 AND n_tokens >= 20) THEN 'low_quality'
         |            ELSE 'kept' END AS stage_out,
         |       CAST(CASE WHEN rn <> 1 THEN fp_keeper
         |                 WHEN cluster_id <> doc_id THEN cluster_id
         |                 ELSE NULL END AS BIGINT) AS blocked_by
         |FROM lab ORDER BY doc_id""".stripMargin)
      .replaceFirst("^WITH ", "WITH RECURSIVE "),
    "q77_contamination" -> withDocs(
      s""", sp AS (
         |  SELECT doc_id, shingles,
         |         ${idBucketSql("doc_id")} AS bucket
         |  FROM docs),
         |tr AS (SELECT DISTINCT unnest(shingles) AS sh FROM sp WHERE bucket < 80),
         |te AS (
         |  SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_sh, unnest(shingles) AS sh
         |  FROM sp WHERE bucket >= 90 AND len(shingles) > 0),
         |j AS (
         |  SELECT doc_id, n_sh, CAST(count(tr.sh) AS BIGINT) AS n_hit
         |  FROM te LEFT JOIN tr USING (sh) GROUP BY 1, 2)
         |SELECT doc_id, n_sh, n_hit,
         |       ${round4Sql("CAST(n_hit AS DOUBLE) / CAST(n_sh AS DOUBLE)")} AS containment,
         |       CAST(CASE WHEN CAST(n_hit AS DOUBLE) / CAST(n_sh AS DOUBLE) >= 0.6
         |                 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
         |FROM j ORDER BY doc_id""".stripMargin))
}
