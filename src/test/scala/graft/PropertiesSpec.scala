package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import graft.etl.Star

/** Property layer (SURVEY.md §5): the deterministic-rounding and IPS/IPK
  * invariants hold for ScalaCheck-generated inputs, evaluated through the
  * real Spark expressions (batched per property to keep this fast). */
class PropertiesSpec extends AnyFunSuite with SparkTestBase {

  test("round2/round4 equal the scalar floor formula for arbitrary doubles") {
    import spark.implicits._
    val xs = Gen.listOfN(200, Gen.chooseNum(-1e6, 1e6)).sample.get
    val got = xs.toDF("x")
      .select(Star.round2(col("x")).as("r2"), Star.round4(col("x")).as("r4"))
      .collect()
    xs.zip(got).foreach { case (x, r) =>
      assert(r.getDouble(0) == math.floor(x * 100 + 0.5) / 100)
      assert(r.getDouble(1) == math.floor(x * 10000 + 0.5) / 10000)
    }
  }

  test("q79 scrub is idempotent: replacement tokens never re-match a pattern") {
    import spark.implicits._
    import graft.ops.Curation
    // random text with PII fragments spliced in at random positions —
    // idempotence would break if <EMAIL>/<IP>/<TERM> matched any pattern
    val word = Gen.oneOf("spark", "sparkly", "data", "a.b@c.de", "1.2.3.4",
      "999.999.999.999", "x@y", "10.0.0.1.9", "the", "spark.")
    val texts = Gen.listOfN(120, Gen.listOfN(8, word).map(_.mkString(" "))).sample.get
    val got = texts.toDF("t")
      .select(Curation.scrubbed(col("t")).as("once"))
      .select(col("once"), Curation.scrubbed(col("once")).as("twice"),
        Curation.scrubHits(col("twice")).as("residual_hits"))
      .collect()
    got.foreach { r =>
      assert(r.getAs[String]("once") == r.getAs[String]("twice"))
      assert(r.getAs[Int]("residual_hits") == 0)
    }
  }

  test("densePairGrid equals the self-join grid on random interaction multisets") {
    import spark.implicits._
    import graft.ops.Events
    // random (container, item) rows WITH duplicates — the dense plan's
    // collect_set must absorb them exactly like the general plan's
    // caller-side distinct; small domains force heavy collisions
    val gen = Gen.listOfN(300, for {
      u <- Gen.chooseNum(1L, 25L)
      k <- Gen.chooseNum(1L, 8L)
    } yield (u, k))
    val rows = gen.sample.get
    val raw = rows.toDF("user_id", "k")
    def set(df: org.apache.spark.sql.DataFrame) = df
      .select("k1", "k2", "co_users", "jaccard_bp", "lift_bp")
      .collect().map(_.toSeq).toSet
    val dense = set(Events.densePairGrid(raw))
    assert(dense == set(Events.cooccurrencePairGrid(raw.distinct())))
    assert(dense.nonEmpty, "8x25 multisets must co-occur")
  }

  test("ips is bounded by [min, max] course weight for random semesters") {
    import spark.implicits._
    val gen = Gen.listOfN(40, for {
      sks <- Gen.chooseNum(1, 6)
      w <- Gen.oneOf(Star.gradeWeights.map(_._2))
    } yield (sks.toDouble, w))
    val courses = gen.sample.get
    val df = courses.toDF("sks", "bobot")
      .agg(Star.round2(sum(col("sks") * col("bobot")) / sum(col("sks"))).as("ips"))
    val ips = df.collect().head.getDouble(0)
    val ws = courses.map(_._2)
    // floor-rounding can dip at most half a cent below the true minimum
    assert(ips >= ws.min - 0.005 && ips <= ws.max + 0.005)
  }

  test("tableDiff/applyChanges round-trip: base + feed reconstructs neu exactly") {
    import spark.implicits._
    import graft.etl.StarBuilder.{applyChanges, tableDiff}
    // random key-unique snapshots with overlapping keys and null-heavy
    // values: diff-then-apply must reproduce the new snapshot row-for-row
    val snapGen = Gen.mapOfN(30, for {
      k <- Gen.chooseNum(0L, 40L)
      s <- Gen.option(Gen.oneOf("a", "b", "c"))
      x <- Gen.option(Gen.chooseNum(-5.0, 5.0))
    } yield k -> (s, x))
    (1 to 5).foreach { _ =>
      val (oldM, neuM) = (snapGen.sample.get, snapGen.sample.get)
      val old = oldM.toSeq.map { case (k, (s, x)) => (k, s, x) }.toDF("k", "s", "x")
      val neu = neuM.toSeq.map { case (k, (s, x)) => (k, s, x) }.toDF("k", "s", "x")
      val applied = applyChanges(old, tableDiff(old, neu, Seq("k")), Seq("k"))
        .collect().map(r => (r.getAs[Long]("k"),
          Option(r.getAs[String]("s")), Option(r.getAs[java.lang.Double]("x")).map(_.doubleValue)))
        .toSet
      val want = neuM.map { case (k, (s, x)) => (k, s, x) }.toSet
      assert(applied == want)
      // schema evolution: the SAME round trip with the old snapshot
      // missing a column entirely (absent ≡ null on both halves)
      val oldNarrow = old.drop("x")
      val appliedN = applyChanges(oldNarrow,
          tableDiff(oldNarrow, neu, Seq("k")), Seq("k"))
        .collect().map(r => (r.getAs[Long]("k"),
          Option(r.getAs[String]("s")), Option(r.getAs[java.lang.Double]("x")).map(_.doubleValue)))
        .toSet
      assert(appliedN == want)
    }
  }

  test("mergeInto law: result = source rows + untouched base remainder, minus deletes") {
    import spark.implicits._
    import graft.etl.StarBuilder.mergeInto
    // the MERGE algebra on random key-unique frames with overlapping
    // keys and null-heavy values: without a delete clause the result is
    // exactly src ∪ base⟨keys ∉ src⟩; with one, matched source rows
    // satisfying it vanish while unmatched ones still insert (ANSI)
    val snapGen = Gen.mapOfN(30, for {
      k <- Gen.chooseNum(0L, 40L)
      s <- Gen.option(Gen.oneOf("a", "b", "c"))
      x <- Gen.option(Gen.chooseNum(-5.0, 5.0))
    } yield k -> (s, x))
    (1 to 5).foreach { _ =>
      val (baseM, srcM) = (snapGen.sample.get, snapGen.sample.get)
      val base = baseM.toSeq.map { case (k, (s, x)) => (k, s, x) }.toDF("k", "s", "x")
      val src = srcM.toSeq.map { case (k, (s, x)) => (k, s, x) }.toDF("k", "s", "x")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getAs[Long]("k"), Option(r.getAs[String]("s")),
          Option(r.getAs[java.lang.Double]("x")).map(_.doubleValue))).toSet
      val plain = rows(mergeInto(base, src, Seq("k")))
      val want = srcM.map { case (k, (s, x)) => (k, s, x) }.toSet ++
        baseM.filterNot { case (k, _) => srcM.contains(k) }
          .map { case (k, (s, x)) => (k, s, x) }
      assert(plain == want)
      // delete clause: matched src rows with x > 0 go; unmatched insert
      val del = rows(mergeInto(base, src, Seq("k"),
        Some(col("x") > 0.0)))
      val wantDel = want -- srcM.collect {
        case (k, (s, x)) if baseM.contains(k) && x.exists(_ > 0.0) => (k, s, x)
      }
      assert(del == wantDel)
    }
  }

  test("IVM delta fold equals from-scratch recompute on random fact splits") {
    import spark.implicits._
    import graft.etl.StarBuilder.maintainStudentSummary
    // random graded-event facts over the real grade scale; any split into
    // (surviving base, removed-from-base, newly-added) must satisfy
    //   maintain(view(base), removed, added) ≡ view(base − removed + added)
    // bit-exactly — partials are exact doubles, so the fold and the
    // recompute round the identical quotient (the q132 gate's argument,
    // exercised on adversarial splits: groups that vanish, groups born
    // from deltas alone, untouched groups)
    val factRow = for {
      student <- Gen.chooseNum(0L, 8L)
      sks <- Gen.chooseNum(1, 6).map(_.toDouble)
      bobot <- Gen.oneOf(Star.gradeWeights.map(_._2))
    } yield (student, sks, bobot)
    (1 to 5).foreach { _ =>
      val base = Gen.listOfN(40, factRow).sample.get
      val removed = base.zipWithIndex.collect {
        case (r, i) if i % 3 == 0 => r } // a third of the base leaves
      val added = Gen.listOfN(15, factRow).sample.get
      def df(rows: Seq[(Long, Double, Double)]) =
        rows.toDF("student", "sks", "bobot")
      def summarize(rows: Seq[(Long, Double, Double)]) =
        df(rows).groupBy("student").agg(
          count(lit(1)).as("n_rows"), sum("sks").as("total_sks"),
          sum(col("sks") * col("bobot")).as("total_w"))
          .withColumn("gpa", Star.round2(col("total_w") / col("total_sks")))
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getAs[Long]("student"), r.getAs[Long]("n_rows"),
          r.getAs[Double]("total_sks"), r.getAs[Double]("total_w"),
          r.getAs[Double]("gpa"))).sortBy(_._1).toSeq
      val maintained = maintainStudentSummary(summarize(base),
        df(removed), df(added))
      // multiset subtraction: removed was TAKEN FROM base by position
      val survivors = base.zipWithIndex.collect {
        case (r, i) if i % 3 != 0 => r }
      assert(rows(maintained) == rows(summarize(survivors ++ added)))
    }
  }

  test("SignLshSignature equals the HOF fold for random vectors and planes") {
    import spark.implicits._
    val vec = Gen.listOfN(64, Gen.chooseNum(-1.0, 1.0))
    val planes = Gen.listOfN(16, Gen.listOfN(64, Gen.chooseNum(-1.0, 1.0)))
    val rows = Gen.listOfN(30, Gen.zip(vec, planes)).sample.get
    val got = rows.toDF("v", "planes")
      .select(
        graft.functions.VectorOps.signLshSignature(col("v"), col("planes")).as("fast"),
        array_join(transform(col("planes"), p =>
          when(aggregate(zip_with(col("v"), p, (x, y) => x * y),
            lit(0.0), (a, x) => a + x) > 0, "1").otherwise("0")), "").as("spec"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("sortedIntersectCount equals size(array_intersect) on sorted distinct arrays") {
    import spark.implicits._
    val arr = Gen.listOfN(30, Gen.stringOfN(4, Gen.alphaLowerChar)).map(_.distinct.sorted)
    val pairs = Gen.listOfN(40, Gen.zip(arr, arr)).sample.get
    val got = pairs.toDF("a", "b")
      .select(
        graft.functions.VectorOps.sortedIntersectCount(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).as("spec"))
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("avgOfRound2ed equals the exact hundredths-average of round2'd inputs") {
    import spark.implicits._
    val xs = Gen.listOfN(100, Gen.chooseNum(0.0, 4.0)).sample.get
      .map(x => math.floor(x * 100 + 0.5) / 100)
    val got = xs.toDF("x")
      .agg(Star.avgOfRound2ed(col("x")).as("a")).collect().head.getDouble(0)
    val cents = xs.map(x => math.floor(x * 100 + 0.5).toLong)
    val want = math.floor(cents.sum.toDouble / (xs.size * 100).toDouble * 100 + 0.5) / 100
    assert(got == want)
  }

  test("q102 merge sequence equals an in-memory BPE reference on random corpora") {
    import graft.ops.TextStats
    // The trivial driver-side BPE: pair counts with multiplicity over the
    // word-count vocab, argmax by (freq desc, l, r), left-to-right
    // non-overlapping merge — the semantics the boundary-string replace
    // implements distributedly. Random small corpora over a 3-letter
    // alphabet force ties and overlapping pairs (aaa, abab...), the
    // cases where greedy BPE implementations classically diverge.
    def mergePass(syms: Vector[String], l: String, r: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    def refBpe(words: Seq[String], k: Int): Vector[(Long, String, String, Long)] = {
      var vocab = words.groupBy(identity).toVector
        .map { case (w, ws) => (w.map(_.toString).toVector, ws.size.toLong) }
      var merges = Vector.empty[(Long, String, String, Long)]
      var step = 1L
      var done = false
      while (step <= k && !done) {
        val pc = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, c) <- vocab; i <- 0 until syms.length - 1)
          pc((syms(i), syms(i + 1))) = pc.getOrElse((syms(i), syms(i + 1)), 0L) + c
        if (pc.isEmpty) done = true
        else {
          val ((l, r), f) = pc.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
          merges = merges :+ ((step, l, r, f))
          vocab = vocab.map { case (syms, c) => (mergePass(syms, l, r), c) }
          step += 1
        }
      }
      merges
    }
    val wordGen = for {
      n <- Gen.chooseNum(2, 6)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val corpusGen = for {
      nw <- Gen.chooseNum(2, 5)
      ws <- Gen.listOfN(nw, wordGen)
      counts <- Gen.listOfN(nw, Gen.chooseNum(1, 4))
    } yield ws.zip(counts).flatMap { case (w, c) => Seq.fill(c)(w) }
    (1 to 6).foreach { i =>
      // fixed seeds: a divergent corpus must fail every run, not flake
      val words = corpusGen.pureApply(Gen.Parameters.default,
        org.scalacheck.rng.Seed(42L + i))
      val dir = writeMiniDocs(Seq((0L, words.mkString(" "))))
      val got = TextStats.q102_bpe_train(spark, dir).collect()
        .map(r => (r.getAs[Long]("step"), r.getAs[String]("left_sym"),
          r.getAs[String]("right_sym"), r.getAs[Long]("freq"))).toVector
      assert(got == refBpe(words, 6), s"corpus: ${words.mkString(" ")}")
    }
  }

  test("batched BPE with batch=1 equals the sequential trainer on random corpora") {
    import graft.ops.TextStats
    // the batched scale path's degenerate case IS the gated sequential
    // semantics: one pick per pass from the frozen table = recount-after-
    // every-merge greedy. Fixed seeds as in the reference-parity test.
    val wordGen = for {
      n <- Gen.chooseNum(2, 6)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val corpusGen = for {
      nw <- Gen.chooseNum(2, 5)
      ws <- Gen.listOfN(nw, wordGen)
      counts <- Gen.listOfN(nw, Gen.chooseNum(1, 4))
    } yield ws.zip(counts).flatMap { case (w, c) => Seq.fill(c)(w) }
    (1 to 4).foreach { i =>
      val words = corpusGen.pureApply(Gen.Parameters.default,
        org.scalacheck.rng.Seed(142L + i))
      val dir = writeMiniDocs(Seq((0L, words.mkString(" "))))
      val seq = TextStats.q102_bpe_train(spark, dir).collect()
        .map(r => (r.getAs[Long]("step"), r.getAs[String]("left_sym"),
          r.getAs[String]("right_sym"), r.getAs[Long]("freq"))).toVector
      val batched = TextStats.bpeTrainBatched(spark, dir, numMerges = 6, batch = 1)
      assert(batched == seq, s"corpus: ${words.mkString(" ")}")
    }
    // and a batch > 1 run picks pairwise-disjoint merges per pass: on a
    // corpus with two independent high-frequency pairs, one pass learns
    // both, and their recorded frozen freqs are the true initial counts
    val dir = writeMiniDocs(Seq((0L, Seq.fill(5)("abab cdcd").mkString(" "))))
    val two = TextStats.bpeTrainBatched(spark, dir, numMerges = 2, batch = 2)
    assert(two.map { case (_, l, r, f) => (l, r, f) }.toSet ==
      Set(("a", "b", 10L), ("c", "d", 10L)))
  }

  test("q163: the distilled quality classifier beats the one-class floor") {
    import graft.ops.TextStats
    // the failure mode that killed the first (hashed-unigram) design:
    // a degenerate one-class predictor still produces a gated confusion
    // matrix — pin that the learned model actually separates: both
    // classes predicted, accuracy above BOTH the majority-class floor
    // and a 65% absolute bar (measured: 73–81% across driver scales)
    val rows = TextStats.q163_quality_perceptron(spark, "/root/testdata/sf0.001")
      .collect()
    val n = rows.map(_.getAs[Long]("n_docs")).sum.toDouble
    val correct = rows.filter(r => r.getAs[Long]("label") == r.getAs[Long]("pred"))
      .map(_.getAs[Long]("n_docs")).sum.toDouble
    val byLabel = rows.groupBy(_.getAs[Long]("label"))
      .map { case (_, rs) => rs.map(_.getAs[Long]("n_docs")).sum.toDouble }
    val majority = byLabel.max / n
    assert(rows.map(_.getAs[Long]("pred")).distinct.length == 2,
      s"one-class predictor: ${rows.mkString(";")}")
    assert(correct / n > majority,
      f"accuracy ${correct / n}%.3f not above majority floor $majority%.3f")
    assert(correct / n > 0.65, f"accuracy ${correct / n}%.3f below the 65%% bar")
  }

  test("batched BPE depth: refill fills every starved pass until the table dries") {
    import graft.ops.TextStats
    // r10 verdict item 3, measured on the probe corpus: a letters-only
    // symbol space makes the ranked pool dense over few symbols, so the
    // frozen-pool pass picks ≪ batch (the sf0.1 depth probe: 8/32 on
    // pass 1). The spec pins both halves of the finding:
    val b = 32
    val (plain, ps) = TextStats.bpeTrainBatchedStats(
      spark, "/root/testdata/sf0.001", numMerges = 64, batch = b)
    assert(ps.nonEmpty)
    // (1) starvation is REAL here — the fallback is required, not
    // hypothetical (first frozen pool admits under half the batch)
    assert(ps.head.picks < b / 2,
      s"expected a starved first pass, got ${ps.head.picks}/$b")
    // (2) the refill fallback fills EVERY pass to quota until the pair
    // table itself is dry (the sequential trainer's early stop)
    val (refilled, rs) = TextStats.bpeTrainBatchedStats(
      spark, "/root/testdata/sf0.001", numMerges = 64, batch = b, refill = true)
    rs.dropRight(1).foreach(st =>
      assert(st.picks == b, s"refill pass underfilled: ${rs.map(_.picks)}"))
    // refill learns at least as many merges in no more passes
    assert(refilled.size >= plain.size && rs.size <= ps.size)
    info(s"plain per-pass: ${ps.map(st => s"${st.picks}/${st.poolSize}")}; " +
      s"refill per-pass: ${rs.map(st => s"${st.picks}/${st.poolSize}")}")
  }

  test("two compiled vector expressions share one projection without codegen collision") {
    import spark.implicits._
    import graft.functions.VectorOps
    // regression: DotProduct/SquaredL2 used fixed local names (n/acc/i) in
    // doGenCode — two instances in ONE projection (q124's c1/c2 was the
    // first) generated colliding locals and silently fell back to the
    // interpreter. fallback=false turns that silent downgrade into a test
    // failure.
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0), Seq(5.0, 6.0)))
        .toDF("v", "a", "b")
        .select(VectorOps.dot(col("v"), col("a")).as("d1"),
          VectorOps.dot(col("v"), col("b")).as("d2"),
          VectorOps.squaredL2(col("a"), col("b")).as("l2"))
      val r = df.collect().head
      assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 17.0 && r.getDouble(2) == 8.0)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("SquaredL2 equals the HOF fold for random vector pairs") {
    import spark.implicits._
    import graft.functions.VectorOps
    val vec = Gen.listOfN(16, Gen.chooseNum(-10.0, 10.0))
    val pairs = Gen.listOfN(60, Gen.zip(vec, vec)).sample.get
    val got = pairs.toDF("a", "b")
      .select(VectorOps.squaredL2(col("a"), col("b")).as("c"),
        aggregate(sequence(lit(1), lit(16)), lit(0.0), (acc, i) =>
          acc + (element_at(col("a"), i) - element_at(col("b"), i)) *
            (element_at(col("a"), i) - element_at(col("b"), i))).as("h"))
      .collect()
    // bit-identical, not approximately equal: the PQ oracle parity
    // depends on the exact fold
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("hamming distance is 0 iff bitstrings equal, symmetric, <= 64") {
    import spark.implicits._
    val bits = Gen.listOfN(64, Gen.oneOf('0', '1')).map(_.mkString)
    val pairs = Gen.listOfN(50, Gen.zip(bits, bits)).sample.get
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.ops.TextCore.hamming(col("a"), col("b")).as("h"))
      .collect()
    got.foreach { r =>
      val (a, b, h) = (r.getString(0), r.getString(1), r.getInt(2))
      val want = a.zip(b).count { case (x, y) => x != y }
      assert(h == want)
      assert((h == 0) == (a == b))
      assert(h >= 0 && h <= 64)
    }
  }
}
