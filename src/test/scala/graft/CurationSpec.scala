package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Curation, Dedup, Pipeline}

/** Semantic edges of the round-6 curation operators. The corpus-level
  * answers are gated by the DuckDB oracle; these tests pin per-document
  * semantics on constructed extremes — in particular the PII regexes,
  * which the synthetic corpus cannot exercise (it contains no emails/IPs).
  */
class CurationSpec extends AnyFunSuite with SparkTestBase {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The q70/q80 deterministic id-hash bucket, recomputed independently. */
  private def bucket(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    java.lang.Long.parseLong(md.take(2).map("%02x".format(_)).mkString, 16) % 100
  }

  test("q79: emails, IPv4s and denylist terms are redacted with correct counts") {
    val dir = writeMiniDocs(Seq(
      (0L, "contact me at john.doe@example.com or 10.0.0.1 via spark"),
      (1L, "plain text with no sensitive content at all")))
    val got = Curation.q79_pii_scrub(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_hits"), r.getAs[String]("scrub_md5"), r.getAs[Long]("changed")))
      .toMap
    assert(got(0L) == ((3L,
      md5hex("contact me at <EMAIL> or <IP> via <TERM>"), 1L)))
    assert(got(1L) == ((0L,
      md5hex("plain text with no sensitive content at all"), 0L)))
  }

  test("q79: sparkly does not match the \\bspark\\b denylist term") {
    val dir = writeMiniDocs(Seq((0L, "a sparkly thing is not the term")))
    val row = Curation.q79_pii_scrub(spark, dir).collect().head
    assert(row.getAs[Long]("n_hits") == 0L && row.getAs[Long]("changed") == 0L)
  }

  test("q78: a document is packed into the sequence its start offset falls in") {
    // ctx = 256. Token counts 100/100/100/50 → start offsets 0/100/200/300
    // → sequences 0/0/0/1 (doc 2 STARTS at 200 < 256 so it belongs to
    // seq 0 even though it runs past the boundary — concat-and-chunk).
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val dir = writeMiniDocs(Seq(
      (0L, words(100)), (1L, words(100)), (2L, words(100)), (3L, words(50))))
    val rows = Curation.q78_seq_packing(spark, dir).collect()
      .map(r => (r.getAs[Long]("seq_id"),
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"), r.getAs[Long]("first_doc"))))
      .toMap
    assert(rows == Map(0L -> ((3L, 300L, 0L)), 1L -> ((1L, 50L, 3L))))
  }

  test("q80: dup_of_base wins over dup_in_batch; batch-internal dups keep first") {
    val baseId = (0L to 300L).find(bucket(_) < 50).get
    val incoming = (0L to 300L).filter(bucket(_) >= 50).take(4)
    val Seq(i1, i2, i3, i4) = incoming.sorted.toSeq
    val dir = writeMiniDocs(Seq(
      (baseId, "shared with the base corpus"),
      (i1, "shared with the base corpus"), // in base → dup_of_base
      (i2, "batch only duplicate text"),   // first in batch → new
      (i3, "batch only duplicate text"),   // later in batch → dup_in_batch
      (i4, "shared with the base corpus")  // also in base → dup_of_base, not dup_in_batch
    ))
    val got = Curation.q80_incremental_dedup(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(got == Map(
      i1 -> "dup_of_base", i2 -> "new", i3 -> "dup_in_batch", i4 -> "dup_of_base"))
  }

  test("q82: strict running-total budget — an overflowing doc is cut, not skipped around") {
    // ≥64 distinct non-stopword tokens → score exactly 1.0, so selection
    // order within the lang is doc_id. 2000 + 900 = 2900 ≤ 3000; doc 2
    // pushes the running total to 3100 → cut; doc 3 (lower score) comes
    // after the overflow so the 100 remaining tokens are NOT backfilled.
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val dir = writeMiniDocs(Seq(
      (0L, words(2000)), (1L, words(900)), (2L, words(200)), (3L, words(50))))
    val row = Curation.q82_token_budget(spark, dir).collect().head
    assert(row.getAs[String]("lang") == "en")
    assert(row.getAs[Long]("n_selected") == 2L)
    assert(row.getAs[Long]("tokens_selected") == 2900L)
    assert(row.getAs[Double]("min_score") == 1.0)
  }

  test("q83: duplicates are charged to the source of the LATER copy") {
    // ids 0,1,2 map to src0,src1,src2 (writeMiniDocs: src{id % 3});
    // 0 and 2 share text → the rn>1 copy is doc 2, so src2 carries the dup.
    val dir = writeMiniDocs(Seq(
      (0L, "same text here"), (1L, "unique text here"), (2L, "same text here")))
    val got = Curation.q83_source_dup_stats(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_dup"), r.getAs[Double]("dup_rate")))
      .toMap
    assert(got == Map(
      "src0" -> ((1L, 0L, 0.0)), "src1" -> ((1L, 0L, 0.0)), "src2" -> ((1L, 1L, 1.0))))
  }

  test("q84: probabilities are sqrt-count weights over the lang-ordered fold") {
    val dir = "/root/testdata/sf0.001"
    val rows = Curation.q84_lang_temperature(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_docs"), r.getAs[Double]("p_sample")))
    // independent recomputation: same fold order (lang asc), same rounding
    val denom = rows.sortBy(_._1).map(r => math.sqrt(r._2.toDouble)).sum
    rows.foreach { case (_, n, p) =>
      val expected = math.floor(math.sqrt(n.toDouble) / denom * 10000 + 0.5) / 10000
      assert(p == expected)
    }
    assert(math.abs(rows.map(_._3).sum - 1.0) < 0.001)
  }

  test("q86: near-dup pairs that a doc-level split separates stay together") {
    // Two identical docs whose ids hash into DIFFERENT doc-level splits —
    // the contamination case: a test doc with a train near-copy. The
    // cluster-level split must put both in the split of the cluster id
    // (= min member id) and report the doc-level scheme as leaky.
    val trainId = (0L to 300L).find(bucket(_) < 80).get
    val testId = (trainId + 1 to 300L).find(bucket(_) >= 90).get
    val text = (1 to 30).map(i => s"t$i").mkString(" ")
    val dir = writeMiniDocs(Seq((trainId, text), (testId, text)))
    val rows = Dedup.q86_leakage_safe_split(spark, dir).collect()
    assert(rows.length == 1) // one cluster, one split row
    val r = rows.head
    val expectedSplit = if (bucket(math.min(trainId, testId)) < 80) "train"
      else if (bucket(math.min(trainId, testId)) < 90) "val" else "test"
    assert(r.getAs[String]("split") == expectedSplit)
    assert(r.getAs[Long]("n_docs") == 2L && r.getAs[Long]("n_clusters") == 1L)
    assert(r.getAs[Long]("doc_split_leaky_clusters") == 1L)
    assert(r.getAs[Long]("cluster_split_leaky_clusters") == 0L)
  }

  test("q61/q81/q86 agree on the component structure at sf0.001") {
    // cross-query invariants over the real corpus: the three consumers of
    // the q32 pair graph must describe the same clustering
    val d = "/root/testdata/sf0.001"
    val comp = Dedup.q61_dedup_components(spark, d).collect()
    val reps = Dedup.q81_cluster_reps(spark, d).collect()
    val splits = Dedup.q86_leakage_safe_split(spark, d).collect()
    // every labeled node appears in exactly one q81 component
    assert(reps.map(_.getAs[Long]("n_members")).sum == comp.length)
    // q61 survivors are exactly the q81 components
    assert(comp.count(_.getAs[Long]("is_survivor") == 1L) == reps.length)
    // q86 clusters = singletons + q81 components; never leaky by construction
    val nDocs = splits.map(_.getAs[Long]("n_docs")).sum
    val nClusters = splits.map(_.getAs[Long]("n_clusters")).sum
    assert(nClusters == (nDocs - comp.length) + reps.length)
    assert(splits.forall(_.getAs[Long]("cluster_split_leaky_clusters") == 0L))
  }

  test("q89 catches a near-copy the q80 fingerprint calls new") {
    // incoming doc = the base doc's text doubled: different normalized
    // fingerprint (q80 → 'new') but Jaccard ≈ 0.93 on shingles → the
    // band index flags it. A second unrelated incoming doc stays clean.
    val baseId = (0L to 300L).find(bucket(_) < 50).get
    val incoming = (0L to 300L).filter(bucket(_) >= 50).take(2)
    val Seq(i1, i2) = incoming.sorted.toSeq
    val t = (1 to 30).map(i => s"t$i").mkString(" ")
    val dir = writeMiniDocs(Seq(
      (baseId, t), (i1, s"$t $t"), (i2, (1 to 30).map(i => s"u$i").mkString(" "))))
    val q80 = Curation.q80_incremental_dedup(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(q80(i1) == "new") // the exact fingerprint misses the near-copy
    val q89 = Dedup.q89_incremental_neardup(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("near_dup"), Option(r.getAs[java.lang.Long]("best_base_id")))).toMap
    assert(q89(i1) == ((1L, Some(java.lang.Long.valueOf(baseId)))))
    assert(q89(i2) == ((0L, None)))
  }

  test("q88: an 8-token verbatim run flags contamination, a 7-token run does not") {
    val trainId = (0L to 300L).find(bucket(_) < 80).get
    val tests = (0L to 300L).filter(bucket(_) >= 90).take(2)
    val Seq(t8, t7) = tests.sorted.toSeq
    val a = (1 to 20).map(i => s"a$i")
    val dir = writeMiniDocs(Seq(
      (trainId, a.mkString(" ")),
      (t8, (a.take(8) ++ Seq("z1", "z2")).mkString(" ")),   // verbatim 8-run
      (t7, (a.take(7) ++ Seq("y1", "y2", "y3")).mkString(" ")))) // only 7-run
    val got = Pipeline.q88_verbatim_contamination(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_hits"), r.getAs[Long]("verbatim_contaminated"))).toMap
    assert(got(t8) == ((1L, 1L)))
    assert(got(t7) == ((0L, 0L)))
  }

  test("q87: funnel stages are successive filters with the expected drops") {
    // doc 0 = doc 1 (exact dup: one survives exact, the survivor is also
    // the cluster rep); doc 2 = 10-token junk (passes dedup, fails the
    // quality gate's n_tokens >= 20).
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val dir = writeMiniDocs(Seq(
      (0L, words(100)), (1L, words(100)), (2L, "a a a a a a a a a a")))
    val got = Pipeline.q87_curation_funnel(spark, dir).collect()
      .map(r => r.getAs[String]("stage") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))
    assert(got.toSeq == Seq(
      "raw" -> ((3L, 210L)),
      "exact_dedup" -> ((2L, 110L)),
      "near_dedup" -> ((2L, 110L)),
      "quality" -> ((1L, 100L))))
  }

  test("q232: each doc reports its first failing stage with a blocking pointer; stage counts reproduce q87") {
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    // 0 = keeper; 1 = exact copy of 0; 2 = near-dup of 0 (one word
    // changed — same shingle neighborhood, q32's plant shape); 3 =
    // 10-token junk (fails the length gate); 4 = clean and distinct
    val dir = writeMiniDocs(Seq(
      (0L, words(100)),
      (1L, words(100)),
      (2L, ((1 to 99).map(i => s"w$i") :+ "zz").mkString(" ")),
      (3L, "a a a a a a a a a a"),
      (4L, (1 to 100).map(i => s"v$i").mkString(" "))))
    val got = Pipeline.q232_doc_lineage(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("stage_out"), Option(r.getAs[java.lang.Long]("blocked_by"))))).toMap
    assert(got(0L) == (("kept", None)))
    assert(got(1L) == (("exact_dup", Some(0L: java.lang.Long))))
    assert(got(2L) == (("near_dup", Some(0L: java.lang.Long))))
    assert(got(3L) == (("low_quality", None)))
    assert(got(4L) == (("kept", None)))
    // lineage sums ARE the funnel: stage counts reproduce q87's deltas
    val funnel = Pipeline.q87_curation_funnel(spark, dir).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_docs")).toMap
    val byStage = got.values.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(funnel("raw") == got.size.toLong)
    assert(funnel("exact_dedup") == got.size - byStage.getOrElse("exact_dup", 0L))
    assert(funnel("near_dedup") ==
      got.size - byStage.getOrElse("exact_dup", 0L) - byStage.getOrElse("near_dup", 0L))
    assert(funnel("quality") == byStage.getOrElse("kept", 0L))
  }

  test("q100: funnel stages are split-local — a dup pair inside train dedups, a cross-split pair does not") {
    def wordsN(n: Int, tag: String) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val trainIds = (0L to 400L).filter(bucket(_) < 80).take(2)
    val testId = (0L to 400L).find(bucket(_) >= 90).get
    val Seq(tr1, tr2) = trainIds.sorted.toSeq
    // tr1/tr2 duplicate each other INSIDE train → train keeps one at the
    // exact-dedup stage; testId carries the same text but is alone in its
    // split, so test keeps its copy (split-local, not corpus-wide, dedup)
    val text = wordsN(100, "w")
    val dir = writeMiniDocs(Seq((tr1, text), (tr2, text), (testId, text)))
    val rows = Pipeline.q100_split_funnel(spark, dir).collect()
      .map(r => (r.getAs[String]("split"), r.getAs[Long]("stage_id")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))
      .toMap
    assert(rows(("train", 1L)) == ((2L, 200L)))
    assert(rows(("train", 2L)) == ((1L, 100L))) // split-local exact dedup
    assert(rows(("train", 3L)) == ((1L, 100L)))
    assert(rows(("train", 4L)) == ((1L, 100L))) // 100 distinct words → score passes
    assert(rows(("test", 1L)) == ((1L, 100L)))
    assert(rows(("test", 2L)) == ((1L, 100L))) // the cross-split copy survives
    assert(rows(("test", 3L)) == ((1L, 100L))) // its cluster's only doc in test
  }

  test("q100: identical sub-shingle docs (no near-dup candidacy) still dedup exactly — stages stay monotone") {
    // < 3 words → empty shingle sets → the pair never becomes a near-dup
    // candidate and each doc keeps a singleton cluster. Stage 3 must not
    // resurrect the stage-2 casualty (s3 is s2-conjoined).
    val Seq(tr1, tr2) = (0L to 400L).filter(bucket(_) < 80).take(2).sorted.toSeq
    val dir = writeMiniDocs(Seq((tr1, "hi there"), (tr2, "hi there")))
    val rows = Pipeline.q100_split_funnel(spark, dir).collect()
      .map(r => (r.getAs[String]("split"), r.getAs[Long]("stage_id")) -> r.getAs[Long]("n_docs"))
      .toMap
    assert(rows(("train", 1L)) == 2L)
    assert(rows(("train", 2L)) == 1L)
    assert(rows(("train", 3L)) == 1L) // NOT 2: monotone through near_dedup
  }

  test("document-family queries survive an empty corpus") {
    // the degenerate input every operator must not crash on: empty
    // aggregations, empty pair graphs, empty window partitions
    val dir = writeMiniDocs(Seq.empty)
    val zeroRow = Seq(
      Curation.q78_seq_packing, Curation.q79_pii_scrub,
      Curation.q80_incremental_dedup, Curation.q82_token_budget,
      Curation.q83_source_dup_stats, Curation.q84_lang_temperature,
      Curation.q95_source_overlap, Curation.q97_novelty_curve,
      Curation.q98_sampling_plan,
      Dedup.q31_dedup_exact, Dedup.q81_cluster_reps,
      Dedup.q86_leakage_safe_split, Dedup.q89_incremental_neardup,
      Pipeline.q88_verbatim_contamination, Pipeline.q100_split_funnel,
      graft.ops.TextStats.q94_tfidf_terms,
      graft.ops.TextStats.q96_bpe_merge_pairs)
    zeroRow.foreach { q => assert(q(spark, dir).count() == 0L) }
    // the funnel's global aggregate still emits its 4 report rows, zeroed
    val funnel = Pipeline.q87_curation_funnel(spark, dir).collect()
    assert(funnel.length == 4)
    assert(funnel.forall(r =>
      r.getAs[Long]("n_docs") == 0L && r.getAs[Long]("n_tokens") == 0L))
  }

  test("q90: retention is counted against the cohort's day-0 size") {
    // user 1: days 0,1 · user 2: day 0 · user 3: days 1,2 (two events on
    // day 1 — the (user, day) DISTINCT collapses them).
    val day = 86400L
    val dir = writeMiniEvents(Seq(
      (1L, 1L, 10L), (2L, 1L, day + 10L),
      (3L, 2L, 20L),
      (4L, 3L, day + 5L), (5L, 3L, day + 6L), (6L, 3L, 2 * day + 5L)))
    val got = graft.ops.Events.q90_retention_cohorts(spark, dir).collect()
      .map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("day_offset")) ->
        (r.getAs[Long]("n_users"), r.getAs[Double]("retention"))).toMap
    assert(got == Map(
      (0L, 0L) -> ((2L, 1.0)), // users 1,2 first seen day 0
      (0L, 1L) -> ((1L, 0.5)), // user 1 returns on day 1
      (1L, 0L) -> ((1L, 1.0)), // user 3's cohort is day 1
      (1L, 1L) -> ((1L, 1.0)))) // user 3 returns on day 2
  }

  test("q81: representative is the longest member, ties to the smallest id") {
    // Three exact near-dups (identical norm → identical MinHash signature →
    // banded pair for every band, Jaccard 1). Doc 21 carries doubled spaces:
    // same normalized text (same component) but larger raw n_chars → it is
    // the representative despite not having the smallest id.
    val text = (1 to 30).map(i => s"t$i").mkString(" ")
    val spaced = (1 to 30).map(i => s"t$i").mkString("  ")
    val dir = writeMiniDocs(Seq((20L, text), (21L, spaced), (22L, text)))
    val rows = Dedup.q81_cluster_reps(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("component_id") == 20L)
    assert(r.getAs[Long]("rep_id") == 21L)
    assert(r.getAs[Long]("rep_chars") == spaced.length.toLong)
    assert(r.getAs[Long]("n_members") == 3L)
    assert(r.getAs[Long]("total_chars") == (2 * text.length + spaced.length).toLong)
  }

  test("q98: budget targets follow sqrt weights; tail languages flag oversampled") {
    // en: 4 docs (weight 2), und: 1 doc (weight 1) → dn = 3, p = 2/3 and
    // 1/3, targets 66667 / 33333 of the 100k budget. en has 68k tokens
    // available (covered), und has 10 (oversampled — the up-weighted tail).
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val dir = writeMiniDocsLang(Seq(
      (0L, words(17000), "en"), (1L, words(17000), "en"),
      (2L, words(17000), "en"), (3L, words(17000), "en"),
      (4L, words(10), "und")))
    val got = Curation.q98_sampling_plan(spark, dir).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("available_tokens"), r.getAs[Long]("target_tokens"),
          r.getAs[Long]("oversampled")))
      .toMap
    assert(got == Map(
      "en" -> ((68000L, 66667L, 0L)),
      "und" -> ((10L, 33333L, 1L))))
  }

  test("q123: covered languages take a partial pass; oversampled ones repeat") {
    // the q98 corpus: en covered (target 66667 < 68000 available →
    // full_epochs 0, remainder = its q122 selection), und oversampled
    // (target 33333 over 10 tokens → 3333 whole epochs + 3-token rest,
    // which one 10-token doc straddles)
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val dir = writeMiniDocsLang(Seq(
      (0L, words(17000), "en"), (1L, words(17000), "en"),
      (2L, words(17000), "en"), (3L, words(17000), "en"),
      (4L, words(10), "und")))
    val got = Curation.q123_epoch_plan(spark, dir).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("full_epochs"), r.getAs[Long]("rem_target"),
          r.getAs[Long]("n_docs_rem"), r.getAs[Long]("tokens_rem")))
      .toMap
    assert(got("und") == ((3333L, 3L, 1L, 10L)))
    val (enEpochs, enRem, enDocs, enToks) = got("en")
    assert(enEpochs == 0L && enRem == 66667L && enDocs == 4L && enToks == 68000L)
  }

  test("selectToBudget: two-phase running sum equals one global window; straddler included") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // md5-spread hashes across many prefix buckets, two languages
    val df = (0 until 400).map { i =>
      (if (i % 3 == 0) "aa" else "bb", s"t:$i", 5L + i % 7)
    }.toDF("lang", "seed", "n_tokens")
      .withColumn("h", md5(col("seed"))).drop("seed")
    val targets = Seq(("aa", 100L), ("bb", 300L)).toDF("lang", "target_tokens")
    val got = Curation.selectToBudget(df, targets)
      .select("lang", "h").collect().map(r => (r.getString(0), r.getString(1))).toSet
    // reference: ONE global per-lang window (the semantics, stated directly)
    val ref = df.withColumn("cum_before",
        sum("n_tokens").over(Window.partitionBy("lang").orderBy("h")) - col("n_tokens"))
      .join(targets, Seq("lang")).where(col("cum_before") < col("target_tokens"))
      .select("lang", "h").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == ref && got.nonEmpty)
    // straddle semantics: per lang, selected tokens reach-or-exceed the
    // target (nothing here is oversampled), and dropping the LAST
    // selected doc in hash order goes under it
    val sel = Curation.selectToBudget(df, targets)
      .select("lang", "h", "n_tokens").collect()
      .groupBy(_.getString(0)).view.mapValues(_.sortBy(_.getString(1))).toMap
    for ((lang, target) <- Seq("aa" -> 100L, "bb" -> 300L)) {
      val toks = sel(lang).map(_.getLong(2))
      assert(toks.sum >= target && toks.dropRight(1).sum < target)
    }
  }

  test("q95: the full pair matrix reports shared fingerprints and Jaccard") {
    // writeMiniDocs assigns source = src{id % 3}. Docs 0 and 3 (both src0)
    // share text → src0's DISTINCT fp set is {A, Z}; doc 1 (src1) repeats
    // text A across sources; doc 2 (src2) is unique.
    val dir = writeMiniDocs(Seq(
      (0L, "dup text a"),   // src0, fp A
      (1L, "dup text a"),   // src1, fp A
      (2L, "unique text c"),// src2, fp C
      (3L, "dup text a"),   // src0, fp A again — collapses in the distinct
      (6L, "only in zero")))// src0, fp Z
    val got = Curation.q95_source_overlap(spark, dir).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_shared"),
          r.getAs[Double]("jaccard")))
      .toMap
    assert(got == Map(
      ("src0", "src1") -> ((2L, 1L, 1L, 0.5)), // |{A,Z} ∩ {A}| / |{A,Z} ∪ {A}|
      ("src0", "src2") -> ((2L, 1L, 0L, 0.0)),
      ("src1", "src2") -> ((1L, 1L, 0L, 0.0))))
  }

  test("q190: allocations sum to K and replay the largest-remainder arithmetic") {
    val rows = Curation.q190_neyman_alloc(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[String]("segment"), r.getAs[Long]("weight"),
        r.getAs[Long]("alloc")))
    val k = Curation.neymanK
    assert(rows.map(_._3).sum == k, s"allocations must exhaust the budget $k")
    // replay the integer largest-remainder split from the output's own
    // weights: base floor + one extra unit to the largest remainders
    // (segment name as total tie-break)
    val tw = rows.map(_._2).sum
    val base = rows.map { case (seg, w, _) => (seg, w, k * w / tw, k * w % tw) }
    val leftover = (k - base.map(_._3).sum).toInt
    val bumped = base.sortBy { case (seg, _, _, rem) => (-rem, seg) }
      .zipWithIndex
      .map { case ((seg, _, b, _), i) => seg -> (b + (if (i < leftover) 1L else 0L)) }
      .toMap
    rows.foreach { case (seg, _, alloc) =>
      assert(alloc == bumped(seg), s"$seg: got $alloc, reference ${bumped(seg)}")
    }
    // weights are nonzero on this corpus (all-zero weights would make
    // the ∝ N_h·S_h design vacuous and tw=0 divide)
    assert(tw > 0)
  }

  test("q196: released counts stay within the binomial mechanism's ±30 bound and actually perturb") {
    val sf = "/root/testdata/sf0.001"
    val released = SparkEntry.queries("q196_dp_release")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val truth = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("lang", "source").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(released.nonEmpty)
    released.foreach { case (cell, noisy) =>
      assert(noisy >= 10, s"$cell released below the publication floor")
      val t = truth(cell)
      assert(math.abs(noisy - t) <= 30, s"$cell: noise out of the popcount bound")
    }
    // the mechanism must actually add noise somewhere (an identity
    // release would pass the bound check vacuously)
    assert(released.exists { case (cell, noisy) => noisy != truth(cell) },
      "no cell was perturbed — the noise expression is broken")
    // determinism: the seeded draw makes a second run byte-identical
    val again = SparkEntry.queries("q196_dp_release")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(again == released)
  }

  test("q244: first-occurrence attribution credits every shingle exactly once") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q244_source_novelty")(spark, sf).collect()
    // Σ novel = the corpus-wide distinct shingle count (each credited once)
    val corpusDistinct = graft.ops.TextCore.docShingles(spark, sf)
      .select(explode(col("shingles")).as("sh")).distinct().count()
    assert(rows.map(_.getAs[Long]("novel_shingles")).sum == corpusDistinct)
    // the lexicographically first source can only contribute novelty
    val first = rows.minBy(_.getString(0))
    assert(first.getAs[Long]("novel_shingles") == first.getAs[Long]("n_shingles"))
    assert(first.getAs[Long]("novelty_bp") == 10000L)
    // novelty never exceeds the source's own distinct count
    rows.foreach { r =>
      assert(r.getAs[Long]("novel_shingles") <= r.getAs[Long]("n_shingles"),
        s"${r.getString(0)}")
    }
  }

  test("q289: stride keys merge into the exact 2:1 interleave") {
    import spark.implicits._
    // A: 4 docs × 100 chars (w=400); B: 2 docs × 100 chars (w=200).
    // keys A = (2k+1)·S/400, B = (2k+1)·S/200 → A B A A B A
    val docs = Seq(
      ("A", 10L, 100L), ("A", 11L, 100L), ("A", 12L, 100L), ("A", 13L, 100L),
      ("B", 20L, 100L), ("B", 21L, 100L)
    ).toDF("source", "doc_id", "n_chars")
    val order = graft.ops.Curation.strideKeys(docs)
      .orderBy("key", "source", "k")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(order == Seq(("A", 10L), ("B", 20L), ("A", 11L), ("A", 12L),
      ("B", 21L), ("A", 13L)))
  }

  test("q289: the half-corpus prefix serves every source its weight share") {
    import spark.implicits._
    val docs = Seq(
      ("A", 10L, 100L), ("A", 11L, 100L), ("A", 12L, 100L), ("A", 13L, 100L),
      ("B", 20L, 100L), ("B", 21L, 100L)
    ).toDF("source", "doc_id", "n_chars")
    val got = graft.ops.Curation.interleaveReport(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // cutoff = 6·S/600 = S/100; A keys below: k=0,1 (2.5e6, 7.5e6);
    // B keys below: k=0 (5e6) → prefix 2:1 = exactly the 6666/3333 split
    assert(got("A") == ((4L, 400L, 6666L, 2L, 6666L, 0L)))
    assert(got("B") == ((2L, 200L, 3333L, 1L, 3333L, 0L)))
  }

  test("q340: EMD on hand cells — skewed classes 2500 bp, uniform 0, dense spine") {
    import spark.implicits._
    // global: p1 = 6, p2 = 10 (N = 16, m−1 = 1; gcum p1 = 6).
    // t_num = |ccum_p1·N − gcum_p1·n| (the p2 term is identically 0 —
    // both cums hit their totals); t_den = n·N·(m−1) = 64.
    // X (p1-heavy, ccum 3): |48 − 24| = 24 → 3750 bp, blocked;
    // Y (ccum 1): |16 − 24| = 8 → 1250, released;
    // Z (ccum 2): |32 − 24| = 8 → 1250, released;
    // W has p2 ONLY — the densified-spine case: its missing p1 row
    // must still enter the cum (ccum 0): |0 − 24| = 24 → 3750.
    val cells = Seq(
      ("X", 2000L, "p1", 3L), ("X", 2000L, "p2", 1L),
      ("Y", 2000L, "p1", 1L), ("Y", 2000L, "p2", 3L),
      ("Z", 2000L, "p1", 2L), ("Z", 2000L, "p2", 2L),
      ("W", 2000L, "p2", 4L)).toDF("seg", "yr", "prio", "cnt")
    val got = graft.ops.Curation.tClosenessFromCells(cells).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("X") == ((4L, 3750L, 0L)))
    assert(got("Y") == ((4L, 1250L, 1L)))
    assert(got("Z") == ((4L, 1250L, 1L)))
    assert(got("W") == ((4L, 3750L, 0L)))
  }
}
