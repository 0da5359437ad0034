package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, Pipeline, TextStats}

/** Semantic edges of the training-data curation operators added in r5:
  * the Gopher-style repetition filter (q76) and the train/eval
  * contamination check (q77). The corpus-level answers are gated by the
  * DuckDB oracle; these tests pin the per-document semantics on
  * constructed extremes. */
class TrainingDataSpec extends AnyFunSuite with SparkTestBase {

  test("q76: degenerate repetition drops a doc, diverse text keeps it") {
    // doc 0: one word repeated — every 2-gram identical (top2_frac = 1),
    // every 3-gram duplicated (dup3_frac = 1) → keep_doc = 0.
    // doc 1: all-distinct words — top2_frac = 1/(n-1), no duplicate
    // 3-grams → keep_doc = 1 (21 words → 1/20 = 0.05, exactly on the
    // inclusive threshold).
    val dir = writeMiniDocs(Seq(
      (0L, Seq.fill(30)("spam").mkString(" ")),
      (1L, (1 to 21).map(i => s"w$i").mkString(" "))))
    val got = TextStats.q76_repetition_filter(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("top2_frac"), r.getAs[Double]("dup3_frac"), r.getAs[Long]("keep_doc")))
      .toMap
    assert(got(0L) == ((1.0, 1.0, 0L)))
    assert(got(1L) == ((0.05, 0.0, 1L)))
  }

  test("q76: mixed doc counts duplicated 3-gram occurrences, not distinct grams") {
    // "a b c a b c a b c d": 3-grams = abc,bca,cab,abc,bca,cab,abc,bcd —
    // 7 of 8 occurrences belong to duplicated grams (bcd is unique).
    val dir = writeMiniDocs(Seq((0L, "a b c a b c a b c d")))
    val row = TextStats.q76_repetition_filter(spark, dir).collect().head
    assert(row.getAs[Double]("dup3_frac") == 0.875)
    assert(row.getAs[Long]("keep_doc") == 0L)
  }

  test("q77: containment is the fraction of test shingles present in train") {
    // The q70 hash split buckets doc_ids deterministically; find ids that
    // land in train (<80) and test (>=90) instead of hardcoding them.
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(2).map("%02x".format(_)).mkString, 16) % 100
    }
    val trainId = (0L to 200L).find(bucket(_) < 80).get
    val testId = (0L to 200L).find(bucket(_) >= 90).get
    // train doc: "x1 x2 x3 x4" → shingles {x1 x2 x3, x2 x3 x4}
    // test doc:  "x1 x2 x3 q1 q2" → shingles {x1 x2 x3, x2 x3 q1, x3 q1 q2}
    //            exactly 1 of 3 in train → containment 1/3, not contaminated
    val dir = writeMiniDocs(Seq(
      (trainId, "x1 x2 x3 x4"),
      (testId, "x1 x2 x3 q1 q2")))
    val rows = Pipeline.q77_contamination(spark, dir).collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("doc_id") == testId)
    assert(rows.head.getAs[Long]("n_sh") == 3L && rows.head.getAs[Long]("n_hit") == 1L)
    assert(rows.head.getAs[Double]("containment") == 0.3333)
    assert(rows.head.getAs[Long]("contaminated") == 0L)
  }

  test("q94: tf-idf ranks a doc's own heavy rare terms over corpus-wide terms") {
    // N = 3. df: apple 1, banana 2, cherry 1, durian 1, the 3.
    // doc 0 scores: apple 2·3/1 = 6, banana 1·3/2 = 1.5, the 1·3/3 = 1
    // doc 1 scores: cherry 3, the 2·3/3 = 2, banana 1.5
    // doc 2 scores: durian 3, the 1 — only two terms, so only two rows.
    val dir = writeMiniDocs(Seq(
      (0L, "apple apple banana the"),
      (1L, "banana cherry the the"),
      (2L, "the durian")))
    val got = TextStats.q94_tfidf_terms(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank")) ->
        (r.getAs[String]("term"), r.getAs[Long]("tf"), r.getAs[Long]("df"),
          r.getAs[Double]("score")))
      .toMap
    assert(got == Map(
      (0L, 1L) -> (("apple", 2L, 1L, 6.0)),
      (0L, 2L) -> (("banana", 1L, 2L, 1.5)),
      (0L, 3L) -> (("the", 1L, 3L, 1.0)),
      (1L, 1L) -> (("cherry", 1L, 1L, 3.0)),
      (1L, 2L) -> (("the", 2L, 3L, 2.0)),
      (1L, 3L) -> (("banana", 1L, 2L, 1.5)),
      (2L, 1L) -> (("durian", 1L, 1L, 3.0)),
      (2L, 2L) -> (("the", 1L, 3L, 1.0))))
  }

  test("q96: adjacent char pairs count overlapping occurrences within words") {
    // "aaab" → aa, aa, ab (overlap counted); "bc" → bc; "x" has no pair.
    val dir = writeMiniDocs(Seq((0L, "aaab bc x")))
    val rows = TextStats.q96_bpe_merge_pairs(spark, dir).collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("freq")))
    assert(rows.toSeq == Seq(("aa", 2L), ("ab", 1L), ("bc", 1L)))
  }

  test("q249: the quantile transform replays from q42 scores; mid-ranks tile n²") {
    val sf = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q249_quantile_uniform")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2), r.getLong(3))).toMap
    // driver-side replay from the gated q42 scores
    val scores = SparkEntry.queries("q42_quality_score")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    val langs = got.map { case (id, (lang, _, _)) => id -> lang }
    val byLang = scores.filter { case (id, _) => langs.contains(id) }
      .groupBy { case (id, _) => langs(id) }
    byLang.foreach { case (lang, docs) =>
      val n = docs.size.toLong
      val hist = docs.values.groupBy(identity).view.mapValues(_.size.toLong)
      val sorted = hist.toSeq.sortBy(_._1)
      // Σ cnt·(2·cb + cnt) = n² — the mid-ranks tile the square exactly
      var cb = 0L
      var tile = 0L
      val expect = sorted.map { case (s, cnt) =>
        val u = (2 * cb + cnt) * 10000 / (2 * n)
        tile += cnt * (2 * cb + cnt); cb += cnt
        s -> u
      }.toMap
      assert(tile == n * n, s"$lang: mid-ranks must tile n² exactly")
      docs.foreach { case (id, s) =>
        assert(got(id) == ((lang, s, expect(s))), s"doc $id")
      }
      // monotone in score, bounded in [0, 10000)
      val us = sorted.map { case (s, _) => expect(s) }
      assert(us == us.sorted && us.forall(u => u >= 0 && u < 10000), s"$lang")
    }
  }

  test("q97: novelty is credited to the batch holding the first occurrence") {
    // batches of 100 ids: docs 0, 1 → batch 0; docs 150, 160 → batch 1.
    // doc 150 repeats doc 0's text (seen → not novel); 160 is new.
    val dir = writeMiniDocs(Seq(
      (0L, "alpha beta"), (1L, "gamma delta"),
      (150L, "alpha beta"), (160L, "epsilon zeta")))
    val got = graft.ops.Curation.q97_novelty_curve(spark, dir).collect()
      .map(r => r.getAs[Long]("batch") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_novel"), r.getAs[Double]("novelty_rate")))
      .toMap
    assert(got == Map(0L -> ((2L, 2L, 1.0)), 1L -> ((2L, 1L, 0.5))))
  }

  test("q102: the merge sequence is learned greedily and stops when pairs run out") {
    // vocab: abab ×3, cd ×3.
    //  step 1: (a,b) freq 6 (two overlapping occurrences per abab) beats
    //          (b,a) 3 and (c,d) 3 → abab becomes [ab, ab]
    //  step 2: (ab,ab) 3 ties (c,d) 3; l asc breaks to (ab,ab) → [abab]
    //  step 3: (c,d) 3 is the only pair left → [cd]
    //  step 4: no adjacent pairs remain → the loop stops at 3 rows (< k)
    val dir = writeMiniDocs(Seq(
      (0L, "abab abab cd"), (1L, "abab cd cd")))
    val rows = TextStats.q102_bpe_train(spark, dir).collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[String]("left_sym"),
        r.getAs[String]("right_sym"), r.getAs[Long]("freq")))
    assert(rows.toSeq == Seq(
      (1L, "a", "b", 6L), (2L, "ab", "ab", 3L), (3L, "c", "d", 3L)))
  }

  test("q104: trained-tokenizer compression counts merged words as one token") {
    // same corpus as the q102 test: after its 3 learned merges both vocab
    // words collapse to single symbols, so 6 corpus words → 6 tokens and
    // 18 chars → chars_per_token = 3.0 (character baseline would be 1.0)
    val dir = writeMiniDocs(Seq(
      (0L, "abab abab cd"), (1L, "abab cd cd")))
    val rows = TextStats.q104_bpe_compression(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_chars"), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("chars_per_token")))
    assert(rows.toSeq == Seq(("en", 6L, 18L, 6L, 3.0)))
  }

  test("q94: score ties within a doc break by term text ascending") {
    // Both terms have tf = 1, df = 1 → identical score N/1 = 1.0.
    val dir = writeMiniDocs(Seq((0L, "zebra aardvark")))
    val rows = TextStats.q94_tfidf_terms(spark, dir).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("term")))
    assert(rows.toSeq == Seq((1L, "aardvark"), (2L, "zebra")))
  }

  test("q106: held-out OOV words compress by merge replay, not vocab lookup") {
    // Train split: "abab abab cd" → learned merges (a,b), (ab,ab), (c,d)
    // (the q102 test corpus). Test split: "ababab cd q" — 'ababab' was
    // NEVER seen in training, but replaying the merges still compresses
    // it: |a||b||a||b||a||b| →(a,b) |ab||ab||ab| →(ab,ab, leftmost
    // non-overlapping) |abab||ab| = 2 tokens. A vocab join (q104's
    // shape) would have charged it 6 character tokens — the exact gap
    // this query exists to close. 'cd' replays to 1 token; 'q' is a
    // 1-char word, 1 token.
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(2).map("%02x".format(_)).mkString, 16) % 100
    }
    val trainId = (0L to 200L).find(bucket(_) < 80).get
    val testId = (0L to 200L).find(bucket(_) >= 90).get
    val dir = writeMiniDocs(Seq(
      (trainId, "abab abab cd"),
      (testId, "ababab cd q")))
    val got = TextStats.q106_bpe_heldout(spark, dir).collect()
      .map(r => r.getAs[String]("split") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_chars"),
          r.getAs[Long]("n_tokens"), r.getAs[Double]("chars_per_token")))).toMap
    assert(got("train") == ((3L, 10L, 3L, 3.3333)))
    assert(got("test") == ((3L, 9L, 4L, 2.25)))
  }

  /** The q105/q112 planted corpus — ONE definition so both tests pin
    * the same documents: a 12-token span S in docs 0 (tokens 5..16 of
    * 20) and 1 (tokens 3..14 of 20), an 8-token span T planted TWICE
    * inside doc 2 (at 3..10 and 14..21 of 22 — within-doc repetition
    * counts: the hash occurs twice globally), and all-unique doc 3
    * which must not appear in either result. */
  private def plantedSpanCorpus: Seq[(Long, String)] = {
    val S = (1 to 12).map(i => s"s$i").mkString(" ")
    val T = (1 to 8).map(i => s"t$i").mkString(" ")
    Seq(
      (0L, s"a1 a2 a3 a4 $S a5 a6 a7 a8"),
      (1L, s"b1 b2 $S b3 b4 b5 b6 b7 b8"),
      (2L, s"c1 c2 $T c3 c4 c5 $T c6"),
      (3L, (1 to 20).map(i => s"u$i").mkString(" ")))
  }

  test("q105: planted spans are excised as merged intervals, per occurrence") {
    val dir = writeMiniDocs(plantedSpanCorpus)
    val got = Dedup.q105_span_dedup(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_dup_windows"),
          r.getAs[Long]("n_spans"), r.getAs[Long]("tokens_removed"),
          r.getAs[Double]("frac_removed")))).toMap
    // docs 0/1: the 5 fully-inside-S windows (starts 5..9 / 3..7) overlap
    // pairwise (gap 1 ≤ k) → ONE merged span covering all 12 tokens;
    // windows straddling the span boundary mix in per-doc unique tokens
    // and stay unflagged.
    assert(got(0L) == ((20L, 5L, 1L, 12L, 0.6)))
    assert(got(1L) == ((20L, 5L, 1L, 12L, 0.6)))
    // doc 2: each T copy is exactly one window (starts 3 and 14); the gap
    // 11 > k keeps them separate spans — 2 spans, 16 tokens.
    assert(got(2L) == ((22L, 2L, 2L, 16L, 0.7273)))
    assert(!got.contains(3L))
  }

  test("q112: excision drops exactly the flagged spans and agrees with q105's counts") {
    // q112 must remove exactly the planted spans' tokens and keep the
    // per-doc unique surroundings (corpus shared with the q105 test).
    val dir = writeMiniDocs(plantedSpanCorpus)
    def md5Of(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val got = Dedup.q112_span_excise(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("tokens_kept"),
          r.getAs[String]("kept_md5")))).toMap
    assert(got(0L) == ((20L, 8L, md5Of("a1 a2 a3 a4 a5 a6 a7 a8"))))
    assert(got(1L) == ((20L, 8L, md5Of("b1 b2 b3 b4 b5 b6 b7 b8"))))
    assert(got(2L) == ((22L, 6L, md5Of("c1 c2 c3 c4 c5 c6"))))
    assert(!got.contains(3L))
    // cross-query invariant: what q105 REPORTS removed is what q112
    // actually removes
    val reported = Dedup.q105_span_dedup(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("tokens_removed")).toMap
    got.foreach { case (id, (n, kept, _)) =>
      assert(n - kept == reported(id), s"doc $id: excised ${n - kept} != reported ${reported(id)}")
    }
  }

  test("q113: the earliest occurrence keeps its span verbatim; later copies lose it") {
    val corpus = plantedSpanCorpus
    val dir = writeMiniDocs(corpus)
    def md5Of(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val got = Dedup.q113_span_excise_keep_first(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("tokens_kept"),
          r.getAs[String]("kept_md5")))).toMap
    // doc 0 holds the corpus-first occurrence of every S window
    // (doc_id 0 < 1): every flagged window is rank 1, so the doc keeps
    // its text VERBATIM — and still appears in the output as the
    // canonical copy, auditable as tokens_kept = n_tokens.
    val doc0Text = corpus.find(_._1 == 0L).get._2
    assert(got(0L) == ((20L, 20L, md5Of(doc0Text))))
    // doc 1's S windows are all rank 2 → S excised, exactly q112's result
    val doc1Kept = "b1 b2 b3 b4 b5 b6 b7 b8"
    assert(got(1L) == ((20L, 8L, md5Of(doc1Kept))))
    // doc 2 repeats T internally: the start-3 copy is rank 1 (kept), the
    // start-14 copy rank 2 (excised) — within-doc dedup keeps one copy too
    val doc2Kept = "c1 c2 " + (1 to 8).map(i => s"t$i").mkString(" ") + " c3 c4 c5 c6"
    assert(got(2L) == ((22L, 14L, md5Of(doc2Kept))))
    assert(!got.contains(3L))
    // conservation invariant: every corpus-duplicated 8-gram survives in
    // at least one kept text (computed generically from the corpus, not
    // from knowledge of where S/T were planted)
    def grams(t: String): Seq[String] =
      t.split(" ").toSeq.sliding(8).filter(_.size == 8).map(_.mkString(" ")).toSeq
    val dupGrams = corpus.flatMap { case (_, t) => grams(t) }
      .groupBy(identity).filter(_._2.size > 1).keySet
    assert(dupGrams.nonEmpty)
    val keptTexts = Seq(doc0Text, doc1Kept, doc2Kept,
      corpus.find(_._1 == 3L).get._2) // untouched docs keep their text
    dupGrams.foreach { g =>
      assert(keptTexts.exists(_.contains(g)),
        s"duplicated 8-gram lost from every kept text: '$g'")
    }
  }

  test("q129 media dedup: raw CAS vs canonical rung classify planted blobs") {
    // docs 0/3 (both src0): byte-identical payloads → raw CAS dedup.
    // doc 6 (src0): a "re-encoding" of the same content (case/whitespace
    // differ, canonical form identical) → collapses only at the
    // canonical rung. doc 1 (src1): unique. The gate corpus has no
    // duplicate payloads at either rung (all-zero counters there); this
    // pins the classification math the query would apply when they exist.
    val raw = "shared media payload bytes"
    val dir = writeMiniDocs(Seq(
      (0L, raw), (3L, raw), (6L, "Shared  MEDIA payload bytes"),
      (1L, "something else entirely")))
    val got = graft.ops.Multimodal.q129_media_dedup(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_refs"), r.getAs[Long]("n_blobs"),
          r.getAs[Long]("n_canonical"), r.getAs[Long]("canon_reclaimable_bytes")))
      .toMap
    val bytes = raw.getBytes("UTF-8").length.toLong
    val reenc = "Shared  MEDIA payload bytes".getBytes("UTF-8").length.toLong
    // src0: 3 refs, 2 raw blobs (0 ≡ 3), ONE canonical group; the
    // representative is the min-raw-sha member, so reclaim is the group's
    // total minus whichever payload that representative has
    val (refs0, blobs0, canon0, reclaim0) = got("src0")
    assert((refs0, blobs0, canon0) == (3L, 2L, 1L))
    assert(reclaim0 == (2 * bytes + reenc) - bytes || reclaim0 == (2 * bytes + reenc) - reenc)
    assert(got("src1") == ((1L, 1L, 1L, 0L)))
    val (refsA, blobsA, canonA, reclaimA) = got("_all")
    assert((refsA, blobsA, canonA) == (4L, 3L, 2L) && reclaimA == reclaim0)
  }

  /** The q70 deterministic id bucket, recomputed in-test (same as the
    * q77 spec) so train/eval membership is found, not hardcoded. */
  private def idBucket(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    java.lang.Long.parseLong(md.take(2).map("%02x".format(_)).mkString, 16) % 100
  }

  test("q134: surprisal is integer T/cnt per token; OOV charges the ceiling") {
    // train doc (bucket < 80): "a a a b" → unigram table a:3, b:1, T=4.
    // eval doc (bucket >= 80): "a b z" → a: 4 div 3 = 1, b: 4 div 1 = 4,
    // z is OOV → charges T = 4 and counts in n_oov.
    val trainId = (0L to 200L).find(idBucket(_) < 80).get
    val evalId = (0L to 200L).find(idBucket(_) >= 80).get
    val dir = writeMiniDocs(Seq((trainId, "a a a b"), (evalId, "a b z")))
    val got = TextStats.q134_surprisal(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
          r.getAs[Long]("surprisal_sum"), r.getAs[Double]("mean_surprisal")))
      .toMap
    assert(got(evalId) == ((3L, 1L, 9L, 3.0)))
    // the train doc scores against its own table: 3×(4 div 3) + 4 div 1
    assert(got(trainId) == ((4L, 0L, 7L, 1.75)))
  }

  test("q188: bigram charges hit the seen/backoff/OOV branches exactly") {
    // train doc "a b a b c": bigrams {a b:2, b a:1, b c:1}; unigrams
    // a:2 b:2 c:1, T=5. Eval doc "a b z c":
    //   (a b)  seen    → ucnt(a)=2 div bcnt=2  = 1
    //   (b z)  OOV z   → 4·T                   = 20
    //   (z c)  backoff → 4·(T div ucnt(c)=1)   = 20
    val trainId = (0L to 200L).find(idBucket(_) < 80).get
    val evalId = (0L to 200L).find(idBucket(_) >= 80).get
    val dir = writeMiniDocs(Seq((trainId, "a b a b c"), (evalId, "a b z c")))
    val got = TextStats.q188_bigram_lm(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_backoff"),
          r.getAs[Long]("n_oov"), r.getAs[Long]("sp_sum"),
          r.getAs[Double]("mean_sp")))
      .toMap
    assert(got(evalId) == ((3L, 2L, 1L, 41L, 13.67)))
    // train doc against its own model: 1 + 2 + 1 + 2, all seen
    assert(got(trainId) == ((4L, 0L, 0L, 6L, 1.5)))
  }

  test("q234: per-language medians gate independently; no-bigram docs carry NULL and are not kept") {
    // all ids in train buckets so the LM sees every doc. en: two
    // repeated-bigram docs (sp 1) and one hub-word junk doc (common w1,
    // always-new continuation → sp 6): median 1, junk dropped. de:
    // disjoint vocab, {1, 6, 6} → lower median 6, so its sp-6 docs are
    // KEPT — the same score that fails en's gate passes de's (the
    // per-language point). A single-word doc has no bigram: NULL sp,
    // kept 0.
    val ids = (0L to 600L).filter(idBucket(_) < 80).take(8).toIndexedSeq
    def alt(a: String, tags: Seq[String]) =
      tags.flatMap(t => Seq(a, t)).mkString(" ")
    val dir = writeMiniDocsLang(Seq(
      (ids(0), "p q p q p q p q p q", "en"),
      (ids(1), "r s r s r s r s r s", "en"),
      (ids(2), alt("p", Seq("a1", "a2", "a3", "a4", "a5")), "en"),
      (ids(3), "solo", "en"),
      (ids(4), alt("k", Seq("b1", "b2", "b3", "b4", "b5")), "de"),
      (ids(5), alt("k", Seq("c1", "c2", "c3", "c4", "c5")), "de"),
      (ids(6), "m m m m m m", "de")))
    val got = TextStats.q234_ppl_filter(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((Option(r.getAs[java.lang.Long]("sp_i")),
          Option(r.getAs[java.lang.Long]("med_sp")), r.getAs[Long]("kept"))))
      .toMap
    assert(got(ids(0))._3 == 1L && got(ids(1))._3 == 1L)
    assert(got(ids(2)) == ((Some(6L: java.lang.Long), Some(1L: java.lang.Long), 0L)),
      s"en junk must fail en's median: ${got(ids(2))}")
    assert(got(ids(3)) == ((None, Some(1L: java.lang.Long), 0L)),
      "a no-bigram doc is NULL-scored and not kept")
    assert(got(ids(4))._3 == 1L && got(ids(5))._3 == 1L && got(ids(6))._3 == 1L,
      s"de's own median (6) must keep its sp-6 docs: ${Seq(4, 5, 6).map(i => got(ids(i)))}")
    assert(got(ids(4))._2 == Some(6L: java.lang.Long))
  }

  test("q134: with no train-split docs every token is OOV at the full-table ceiling") {
    // All docs land in eval buckets → the unigram table is empty, T = 0,
    // and every token is OOV with sp = T = 0. The filter degrades to
    // all-zero scores rather than dividing by an absent count.
    val evalIds = (0L to 400L).filter(idBucket(_) >= 80).take(2)
    val dir = writeMiniDocs(evalIds.map(id => (id, "x y")))
    val got = TextStats.q134_surprisal(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_oov"), r.getAs[Long]("surprisal_sum")))
      .toMap
    evalIds.foreach(id => assert(got(id) == ((2L, 0L))))
  }

  test("q136: docs pad to the smallest holding bucket and truncate past the last") {
    // en: len 10 and len 16 → bucket 16 (pad 6+0); len 18 → bucket 32
    // (pad 14); len 600 → truncated to 512 (trunc 88, zero padding).
    // id: len 96 → bucket 128 (pad 32, waste exactly 0.25).
    def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")
    val dir = writeMiniDocsLang(Seq(
      (0L, words(10), "en"), (1L, words(16), "en"), (2L, words(18), "en"),
      (3L, words(600), "en"), (4L, words(96), "id")))
    val got = TextStats.q136_length_buckets(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("bucket_len")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("token_sum"),
          r.getAs[Long]("padded_sum"), r.getAs[Long]("trunc_tokens"),
          r.getAs[Double]("waste_frac")))
      .toMap
    assert(got(("en", 16L)) == ((2L, 26L, 32L, 0L, 0.1875)))
    assert(got(("en", 32L)) == ((1L, 18L, 32L, 0L, 0.4375)))
    assert(got(("en", 512L)) == ((1L, 512L, 512L, 88L, 0.0)))
    assert(got(("id", 128L)) == ((1L, 96L, 128L, 0L, 0.25)))
    assert(got.size == 4)
  }

  test("q137: TextRank matches the integer recurrence; loops and loners drop out") {
    // "a b a b c" → adjacencies (a,b),(b,a),(a,b),(b,c); symmetrized
    // edge weights a→b 3, b→a 3, b→c 1, c→b 1 (wout a=3 b=4 c=1).
    // "x x" is only a self-loop → x is not a node; "solo" has no
    // adjacency at all → not a node either.
    val dir = writeMiniDocs(Seq((0L, "a b a b c"), (1L, "x x"), (2L, "solo")))
    val got = TextStats.q137_textrank(spark, dir).collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("rank_scaled"))
    // independent in-memory reference: the same integer recurrence
    val edges = Map(("a", "b") -> 3L, ("b", "a") -> 3L, ("b", "c") -> 1L, ("c", "b") -> 1L)
    val wout = Map("a" -> 3L, "b" -> 4L, "c" -> 1L)
    var rank = Map("a" -> 1000000L, "b" -> 1000000L, "c" -> 1000000L)
    for (_ <- 1 to 10) {
      val inc = edges.toSeq.groupBy(_._1._2).map { case (dst, es) =>
        dst -> es.map { case ((src, _), w) => rank(src) * w / wout(src) }.sum
      }
      rank = inc.map { case (v, i) => v -> (150000L + 85L * i / 100L) }
    }
    val expect = rank.toSeq.sortBy { case (w, r) => (-r, w) }
    assert(got.toSeq == expect)
    // the hub word carries the most rank
    assert(got.head._1 == "b")
  }

  test("q147: CMS estimates match an independent sketch recompute; never undercount") {
    // 300 distinct words (word wNNN appears (NNN % 7) + 1 times) — wide
    // enough that the 4×256 sketch rows genuinely share buckets, so the
    // min-over-rows logic is exercised against REAL collisions. The
    // reference sketch is recomputed here with java MessageDigest — an
    // independent implementation of the same row-seeded md5 bucket math.
    val words = (0 until 300).map(i => f"w$i%03d" -> ((i % 7) + 1L))
    val text = words.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
      .mkString(" ")
    val dir = writeMiniDocs(Seq((0L, text)))
    def bucket(r: Int, w: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$r:$w".getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(2).map("%02x".format(_)).mkString, 16) % 256
    }
    val cells: Map[(Int, Long), Long] = (for {
      (w, n) <- words; r <- 0 until 4
    } yield (r, bucket(r, w)) -> n)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    // per-row collisions must actually occur for the test to mean much
    assert(cells.size < 4 * 256 && cells.size > 0)
    val top = words.sortBy { case (w, n) => (-n, w) }.take(20)
    val expect = top.map { case (w, n) =>
      val est = (0 until 4).map(r => cells((r, bucket(r, w)))).min
      (w, n, est, est - n)
    }
    val got = TextStats.q147_cms_topk(spark, dir).collect().map(r =>
      (r.getAs[String]("word"), r.getAs[Long]("cnt"),
        r.getAs[Long]("cms_est"), r.getAs[Long]("overcount")))
    assert(got.toSeq == expect)
    assert(got.forall { case (_, cnt, est, over) => est >= cnt && over == est - cnt })
    // with 300 words in 256-wide rows, at least one heavy hitter should
    // carry a genuine collision overcount (pigeonhole makes per-row
    // collisions certain; this asserts the min didn't erase all of them
    // by luck of the draw — a deterministic fact of this fixed corpus)
    assert(got.exists(_._4 > 0))
  }

  test("q151: merged half-corpus sketches serve exactly the single-pass answer") {
    // the same 300-word corpus as the q147 spec, spread over doc ids on
    // BOTH sides of the id-hash split (bucket < 50 vs >= 50) so each
    // ingest batch sketches a real share; the merge law says q151's
    // two-sketch path and q147's single-pass path are indistinguishable
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(2).map("%02x".format(_)).mkString, 16) % 100
    }
    val loIds = (0L to 400L).filter(bucket(_) < 50).take(3)
    val hiIds = (0L to 400L).filter(bucket(_) >= 50).take(3)
    val words = (0 until 300).map(i => f"w$i%03d" -> ((i % 7) + 1))
    val texts = words.flatMap { case (w, n) => Seq.fill(n)(w) }
      .grouped(200).map(_.mkString(" ")).toSeq
    val docs = texts.zipWithIndex.map { case (t, i) =>
      ((if (i % 2 == 0) loIds else hiIds)(i / 2 % 3), t)
    }
    val dir = writeMiniDocs(docs)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[String]("word"), r.getAs[Long]("cnt"),
        r.getAs[Long]("cms_est"), r.getAs[Long]("overcount"))).toSeq
    assert(rows(TextStats.q151_cms_merge(spark, dir))
      == rows(TextStats.q147_cms_topk(spark, dir)))
  }

  test("q152: registers, scaled harmonic sum and estimate match a reference HLL") {
    // langs of very different cardinality, ids chosen freely — the
    // reference recomputes registers with java MessageDigest (an
    // independent implementation of the bucket/rank/shift math),
    // including the empty-register 2^33 terms
    val docs = (0L until 40L).map(id => (id, s"text $id", "aa")) ++
      (100L until 103L).map(id => (id, s"text $id", "bb"))
    val dir = writeMiniDocsLang(docs)
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def expect(ids: Seq[Long]): (Long, Double) = {
      val regs = ids.groupBy(id =>
          java.lang.Long.parseLong(md5hex(id.toString).take(4), 16) % 16)
        .map { case (b, bid) => b -> bid.map { id =>
          val v = java.lang.Long.parseLong(md5hex(id.toString).slice(4, 12), 16)
          if (v == 0L) 33L else 33L - java.lang.Long.toBinaryString(v).length
        }.max }
      val ssum = regs.values.map(m => 1L << (33 - m)).sum +
        (16 - regs.size) * 8589934592L
      val est = math.floor(0.673 * 256.0 * 8589934592.0 / ssum * 100.0 + 0.5) / 100.0
      (regs.size.toLong, est)
    }
    // the audit row (q262) carries the exact side since the r16 split
    val got = TextStats.q262_hll_card_audit(spark, dir).collect().map(r =>
      r.getAs[String]("lang") -> ((r.getAs[Long]("n_exact"),
        r.getAs[Long]("regs_hit"), r.getAs[Double]("hll_est")))).toMap
    val (raHit, raEst) = expect(0L until 40L)
    val (rbHit, rbEst) = expect(100L until 103L)
    assert(got("aa") == ((40L, raHit, raEst)))
    assert(got("bb") == ((3L, rbHit, rbEst)))
    // the serve row (q152) must agree with the audit's sketch columns
    val serve = TextStats.q152_hll_registers(spark, dir).collect().map(r =>
      r.getAs[String]("lang") -> ((r.getAs[Long]("regs_hit"),
        r.getAs[Double]("hll_est")))).toMap
    assert(serve == got.view.mapValues(v => (v._2, v._3)).toMap)
  }

  test("q157: a planted eval 8-gram is excised from train docs; eval stays untouched") {
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(2).map("%02x".format(_)).mkString, 16) % 100
    }
    val trainIds = (0L to 400L).filter(bucket(_) < 80).take(2)
    val evalId = (0L to 400L).find(bucket(_) >= 90).get
    val leak = (1 to 8).map(i => s"leak$i").mkString(" ")
    // train doc 0 embeds the eval 8-gram mid-text; train doc 1 is clean;
    // the eval doc IS the 8-gram (plus padding to clear the >= 8 floor)
    val pre = (1 to 4).map(i => s"pre$i").mkString(" ")
    val post = (1 to 4).map(i => s"post$i").mkString(" ")
    val dir = writeMiniDocs(Seq(
      (trainIds(0), s"$pre $leak $post"),
      (trainIds(1), (1 to 12).map(i => s"clean$i").mkString(" ")),
      (evalId, s"$leak tail1 tail2")))
    val got = Dedup.q157_decontaminate(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("tokens_kept"),
          r.getAs[String]("kept_md5")))).toMap
    // only the contaminated train doc appears; exactly the 8 leaked
    // tokens go, the pre/post context survives verbatim
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got.keySet == Set(trainIds(0)))
    assert(got(trainIds(0)) == ((16L, 8L, md5hex(s"$pre $post"))))
  }

  test("q158: a repeated in-doc 3-gram loses its later copy; the first survives") {
    // doc 0: "m1 m2 m3 f1 f2 m1 m2 m3" — the menu trigram repeats at
    // starts 1 and 6; keep-first excises [6, 8] only. doc 1 is clean.
    val dir = writeMiniDocs(Seq(
      (0L, "m1 m2 m3 f1 f2 m1 m2 m3"),
      (1L, "c1 c2 c3 c4 c5 c6 c7 c8")))
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val got = Dedup.q158_self_excise(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("tokens_kept"),
          r.getAs[String]("kept_md5")))).toMap
    assert(got.keySet == Set(0L))
    assert(got(0L) == ((8L, 5L, md5hex("m1 m2 m3 f1 f2"))))
  }

  test("q156: the persisted BPE model round-trips the merge sequence in step order") {
    val dir = writeMiniDocs(Seq(
      (0L, "banana bandana banana"), (1L, "cabana banana bandana")))
    val out = java.nio.file.Files.createTempDirectory("graft_bpe_model").toString
    TextStats.writeBpeModel(spark, dir, out)
    val back = spark.read.parquet(out).orderBy("step").collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[String]("left_sym"),
        r.getAs[String]("right_sym"), r.getAs[Long]("freq")))
    // the artifact must carry the exact learned sequence — steps dense
    // from 1, pairs and frequencies byte-equal to a retrained run
    assert(back.nonEmpty && back.map(_._1).toSeq == (1L to back.length).toSeq)
    val out2 = java.nio.file.Files.createTempDirectory("graft_bpe_model2").toString
    TextStats.writeBpeModel(spark, dir, out2)
    val back2 = spark.read.parquet(out2).orderBy("step").collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[String]("left_sym"),
        r.getAs[String]("right_sym"), r.getAs[Long]("freq")))
    assert(back.toSeq == back2.toSeq) // deterministic producer
    // 'an' is the dominant pair of this corpus: it must lead the model
    assert((back.head._2, back.head._3) == (("a", "n")))
  }

  test("q155: merged HLL registers equal the single pass; max-merge tolerates overlap") {
    // disjoint-halves merge is the gated law; this pins the STRONGER
    // property CMS lacks: because registers fold by max (idempotent),
    // merging OVERLAPPING batches leaves the estimate unchanged —
    // re-ingesting a batch cannot inflate a distinct count
    val docs = (0L until 60L).map(id => (id, s"text $id", if (id < 40) "aa" else "bb"))
    val dir = writeMiniDocsLang(docs)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[String]("lang"), r.getAs[Long]("n_exact"),
        r.getAs[Long]("regs_hit"), r.getAs[Double]("hll_est"))).toSeq
    // q262 is the audit row carrying n_exact since the r16 split
    val single = rows(TextStats.q262_hll_card_audit(spark, dir))
    assert(rows(TextStats.q155_hll_merge(spark, dir)) == single)
    // overlap: duplicate every document row — same distinct ids, so
    // registers and estimate must be identical to the clean corpus
    val dupDir = writeMiniDocsLang(docs ++ docs)
    val dup = rows(TextStats.q262_hll_card_audit(spark, dupDir))
    assert(dup.map { case (l, _, h, e) => (l, h, e) }
      == single.map { case (l, _, h, e) => (l, h, e) })
  }

  test("q148: disjoint per-lang vocabularies classify perfectly; fit is train-split-only") {
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(2).map("%02x".format(_)).mkString, 16) % 100
    }
    val trainIds = (0L to 400L).filter(bucket(_) < 80).take(4)
    val evalIds = (0L to 400L).filter(bucket(_) >= 80).take(2)
    // two langs with DISJOINT vocabularies: every eval doc's words are
    // OOV for the wrong class (ceiling charge) and cheap for its own —
    // the argmin must put every doc on the diagonal
    def text(l: String) = (1 to 6).map(i => s"$l$i").mkString(" ")
    val docs =
      trainIds.take(2).map(id => (id, text("aa"), "aa")) ++
      trainIds.drop(2).map(id => (id, text("bb"), "bb")) ++
      Seq((evalIds(0), text("aa"), "aa"), (evalIds(1), text("bb"), "bb"))
    val dir = writeMiniDocsLang(docs)
    val got = TextStats.q148_nb_langid(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("pred_lang")) ->
        r.getAs[Long]("n_docs")).toMap
    assert(got == Map(("aa", "aa") -> 3L, ("bb", "bb") -> 3L))
    // and on the real corpus: every doc is scored exactly once, and the
    // learned model beats the 1/#langs chance floor
    val real = TextStats.q148_nb_langid(spark, "/root/testdata/sf0.001").collect()
    val total = real.map(_.getAs[Long]("n_docs")).sum
    val correct = real.filter(r => r.getAs[String]("lang") == r.getAs[String]("pred_lang"))
      .map(_.getAs[Long]("n_docs")).sum
    val langs = real.map(_.getAs[String]("lang")).distinct.length
    assert(total == spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count())
    assert(correct.toDouble / total > 1.0 / langs)
  }

  test("q266: duplicate-bigram mass replays by hand; 1-word docs surface NULL") {
    // doc 0: "a b a b a" → bigrams [ab, ba, ab, ba] = 4, distinct 2 →
    // dup_bp 5000, flagged; doc 1: all-distinct bigrams → 0, clean;
    // doc 2: one word → no bigrams → NULLs
    val dir = writeMiniDocs(Seq(
      (0L, "a b a b a"), (1L, "x y z w"), (2L, "solo")))
    val got = TextStats.q266_repetition_filter(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_dup"),
          Option(r.get(r.fieldIndex("dup_bp"))).map(_.asInstanceOf[Long]),
          Option(r.get(r.fieldIndex("flagged"))).map(_.asInstanceOf[Long])))).toMap
    assert(got(0L) == ((4L, 2L, Some(5000L), Some(1L))))
    assert(got(1L) == ((3L, 0L, Some(0L), Some(0L))))
    assert(got(2L) == ((0L, 0L, None, None)),
      "a doc with no bigrams has no evidence, not a clean verdict")
  }

  test("q267: the planted PII is found, redacted, and leaves zero residual") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val rows = TextStats.q267_pii_scrub(spark, sf).collect()
    assert(rows.nonEmpty)
    // redaction is PROVEN complete on every source
    assert(rows.forall(_.getAs[Long]("residual_pii_docs") == 0L))
    // the plant replays: per source, email docs = bucket<15 docs,
    // phone docs = bucket in [15,20)
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(2).map("%02x".format(_)).mkString, 16) % 100
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    val expEmail = docs.filter(d => bucket(d._1) < 15).groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val expPhone = docs.filter(d => { val b = bucket(d._1); b >= 15 && b < 20 })
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      assert(r.getAs[Long]("n_email_docs") == expEmail.getOrElse(src, 0L), src)
      assert(r.getAs[Long]("n_phone_docs") == expPhone.getOrElse(src, 0L), src)
    }
    // at least one of each plant exists at sf0.001, or the gate is vacuous
    assert(rows.map(_.getAs[Long]("n_email_docs")).sum > 0)
    assert(rows.map(_.getAs[Long]("n_phone_docs")).sum > 0)
  }

  test("q268: temperature weights sum to ~10000 and flatten the mixture") {
    val sf = "/root/testdata/sf0.001"
    val rows = TextStats.q268_mixture_temperature(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("share_bp"), r.getAs[Long]("w_temp_bp")))
    assert(rows.length >= 2)
    // truncating division: sums land in (10000 - #sources, 10000]
    val wsum = rows.map(_._4).sum
    assert(wsum > 10000L - rows.length && wsum <= 10000L, s"wsum=$wsum")
    // sqrt flattens: the SMALLEST source gains weight vs its natural
    // share, the largest loses (strictly, unless already uniform)
    val smallest = rows.minBy(_._2)
    val largest = rows.maxBy(_._2)
    if (smallest._2 != largest._2) {
      assert(smallest._4 >= smallest._3, s"smallest $smallest must be upweighted")
      assert(largest._4 <= largest._3, s"largest $largest must be downweighted")
    }
    // exact replay of the quantize-before-sum rule
    val sq = rows.map(r => math.floor(math.sqrt(r._2.toDouble) * 100).toLong)
    val tot = sq.sum
    rows.zip(sq).foreach { case (r, s) =>
      assert(r._4 == s * 10000L / tot, s"${r._1}")
    }
  }

  test("q270: epoch allocation replays; the cap binds exactly where the raw epochs exceed it") {
    val sf = "/root/testdata/sf0.001"
    val rows = TextStats.q270_epoch_allocation(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("w_temp_bp"), r.getAs[Long]("alloc_tokens"),
        r.getAs[Long]("epochs_x100"), r.getAs[Long]("capped")))
    assert(rows.nonEmpty)
    val sq = rows.map(r => math.floor(math.sqrt(r._2.toDouble) * 100).toLong)
    val (totTokens, totSq) = (rows.map(_._2).sum, sq.sum)
    val perWeight = 3L * totTokens * 1000L / totSq
    rows.zip(sq).foreach { case (r, s) =>
      val alloc = s * perWeight / 1000L
      assert(r._4 == alloc, s"${r._1} alloc")
      val raw = alloc * 100L / r._2
      assert(r._5 == math.min(raw, 400L), s"${r._1} epochs")
      assert(r._6 == (if (raw > 400L) 1L else 0L), s"${r._1} capped")
    }
    // the budget story holds: a 3x-corpus budget spread by flattened
    // weights puts every source near 3 epochs, some over the cap side,
    // and allocation stays within the budget
    assert(rows.map(_._4).sum <= 3L * totTokens)
  }

  test("q335: Heaps curve credits first occurrences; empty prefix has NULL density") {
    import spark.implicits._
    // ten docs so decile = doc_id (md = 9): doc 0 is token-free (the
    // NULL-density prefix), doc 1 introduces {a, b} with a repeated,
    // doc 2 re-uses b and introduces c, docs 3..9 repeat a forever
    val dw = (Seq((0L, Seq.empty[String]), (1L, Seq("a", "a", "b")),
      (2L, Seq("b", "c"))) ++ (3L to 9L).map(i => (i, Seq("a"))))
      .toDF("doc_id", "words")
    val got = graft.ops.TextStats.heapsFromDocWords(dw).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) null else r.getLong(4)))).toMap
    assert(got(0L) == ((1L, 0L, 0L, null)))        // docs but no tokens yet
    assert(got(1L) == ((2L, 3L, 2L, 6666L)))       // a, b credited here
    assert(got(2L) == ((3L, 5L, 3L, 6000L)))       // only c is new
    assert(got(9L) == ((10L, 12L, 3L, 2500L)))     // vocabulary saturated
    // the density readout is monotone non-increasing once tokens exist
    val dens = got.toSeq.sortBy(_._1).map(_._2._4).filter(_ != null)
      .map(_.asInstanceOf[Long])
    assert(dens == dens.sorted.reverse)
  }

  test("q338: Good–Turing r*, the NULL-vs-zero distinction, and p0") {
    import spark.implicits._
    // types {a:1, b:1, c:2, d:3} → N₁=2, N₂=1, N₃=1, N = 7 tokens.
    // r=1: r* = 2·N₂/N₁ = 1.0 → 10000; r=2: 3·N₃/N₂ = 3.0 → 30000;
    // r=3: N₄ = 0 → the honest r* = 0; r ≥ 4: N_r = 0 → NULL
    // (undefined, not zero); p0 = N₁/N = 2/7 → 2857 bp
    val wc = Seq(("a", 1L), ("b", 1L), ("c", 2L), ("d", 3L)).toDF("w", "c")
    val got = graft.ops.TextStats.goodTuringFromCounts(wc).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) null else r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) == ((2L, 1L, 10000L, 2857L)))
    assert(got(2L) == ((1L, 1L, 30000L, 2857L)))
    assert(got(3L) == ((1L, 0L, 0L, 2857L)))
    assert(got(4L) == ((0L, 0L, null, 2857L)))
    assert(got.size == 10)
  }

  test("unigram/bigram count memos build once and equal the direct marginals; totals fold exactly") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val uMemo = TextStats.unigramCounts(spark, d)
    val bMemo = TextStats.bigramCounts(spark, d)
    assert(uMemo eq TextStats.unigramCounts(spark, d))
    assert(bMemo eq TextStats.bigramCounts(spark, d))
    val docs = graft.ops.TextCore.docShingles(spark, d)
    val wantU = docs.select(explode(col("words")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotU = uMemo.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotU == wantU)
    assert(gotU.nonEmpty)
    // the q279 totals derivation: Σ cw == Σ size(words),
    // Σ cab == Σ max(size − 1, 0) — one row each, exact
    val direct = docs.agg(
      sum(size(col("words")).cast("long")).as("nt"),
      sum(greatest(size(col("words")).cast("long") - 1L, lit(0L))).as("nb"))
      .head()
    assert(uMemo.agg(sum("cw")).head().getLong(0) == direct.getLong(0))
    assert(bMemo.agg(sum("cab")).head().getLong(0) == direct.getLong(1))
  }

  test("wordIdCells equals the direct (ib, word) marginal; ib slices and the sketch fold are token-identical (r19)") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val cells = TextStats.wordIdCells(spark, d)
    assert(cells eq TextStats.wordIdCells(spark, d)) // memo: one build
    val docs = graft.ops.TextCore.docShingles(spark, d)
    val direct = docs
      .select(graft.ops.TextCore.idBucket(col("doc_id")).as("ib"),
        explode(col("words")).as("w"))
      .groupBy("ib", "w").agg(count(lit(1)).as("cw")).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = cells.collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == direct)
    assert(got.nonEmpty)
    // an ib-range slice folds to exactly the doc-split marginal
    // (buckets partition docs) — the q151/q106/bpeVocab0 derivation
    val wantHalf = docs
      .where(graft.ops.TextCore.idBucket(col("doc_id")) < 50)
      .select(explode(col("words")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotHalf = cells.where(col("ib") < 50)
      .groupBy("w").agg(sum("cw").as("cw")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotHalf == wantHalf)
    // the count-weighted sketch fold is token-identical to the
    // stream build — q147/q151's cells come from the type table
    val tok = docs.select(explode(col("words")).as("word"))
    val wantCms = TextStats.cmsCells(tok).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val wc = cells.groupBy("w").agg(sum("cw").as("cw"))
    val gotCms = TextStats.cmsCellsFromCounts(wc).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(gotCms == wantCms)
    // the (source, word) cells equal the direct marginal (q307/q316)
    val swMemo = TextStats.sourceWordCells(spark, d)
    assert(swMemo eq TextStats.sourceWordCells(spark, d))
    val wantSw = docs.select(col("source"), explode(col("words")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val gotSw = swMemo.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(gotSw == wantSw)
  }
}
