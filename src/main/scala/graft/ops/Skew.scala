package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.etl.Star
import graft.etl.Star.withFact

/** Skew-mitigation primitives (100 TB posture; SURVEY.md §7.6 scale
  * notes). None of the sandbox datasets are skewed enough to need these —
  * AQE's skew-join handling covers the join side at runtime — but the
  * two-phase salted aggregation is the standard manual tool when one key
  * dominates a groupBy, and it is spec-tested for equivalence with the
  * direct aggregation. */
object Skew {

  /** Deterministic per-row salt: xxhash64 over the caller-designated
    * `saltOn` columns, mod `numSalts`. Deterministic across task
    * retries, which is the property that makes salting safe under
    * shuffle-fetch failures: a recomputed map task re-derives the SAME
    * salt for every row, so reducers that already fetched the lost
    * task's output and reducers backfilling from the recompute see one
    * consistent assignment. A
    * `spark_partition_id`/`monotonically_increasing_id` salt re-rolls on
    * retry — rows can migrate between shuffle partitions mid-stage,
    * silently dropping or duplicating them, and Spark does not mark the
    * SQL map stage indeterminate for those expressions, so no rollback
    * protects the fetch-side state. The caller picks `saltOn` — the key
    * and value plus enough high-cardinality payload (timestamp, id) to
    * spread a hot key — rather than the salt hashing every column, which
    * would force the scan to materialize the full row width and defeat
    * column pruning. Rows identical across `saltOn` share a salt
    * (documented degradation, not a bug). */
  private[graft] def rowSalt(saltOn: Seq[Column], numSalts: Int): Column =
    pmod(xxhash64(saltOn: _*), lit(numSalts.toLong))

  /** Two-phase salted aggregation: count + sum per key, computed as
    * groupBy(key, salt) partials followed by a final groupBy(key) merge.
    * The salt spreads a hot key over `numSalts` reducers in phase 1; the
    * phase-2 input has at most `numSalts` rows per key. Sums must be
    * re-aggregatable (here: counts and exact integer/half-step sums).
    * The salt is [[rowSalt]] over `saltOn` — deterministic under task
    * retries (see there for why that matters at the 100 TB regime this
    * operator is for). SkewSpec pins layout-invariance; the q74 oracle
    * (plain group-by in DuckDB) gates the rewrite's equivalence
    * per-round. */
  def saltedCountSum(df: DataFrame, key: Column, value: Column,
      numSalts: Int, saltOn: Seq[Column]): DataFrame = {
    val salted = df.select(key.as("k"), value.as("v"),
      rowSalt(saltOn, numSalts).as("salt"))
    salted
      .groupBy("k", "salt")
      .agg(count(lit(1)).as("pn"), sum(col("v")).as("ps"))
      .groupBy("k")
      .agg(sum(col("pn")).as("n"), sum(col("ps")).as("s"))
  }

  /** q74: the salted aggregation as an oracle-checked operator — grade
    * (`huruf`, 6 distinct values over the whole fact) is exactly the
    * hot-key shape salting exists for: a plain groupBy funnels each
    * grade's rows through one reducer; the salted form spreads each over
    * 8, then merges ≤ 8 partials per key. The oracle computes the PLAIN
    * group-by, so the equivalence of the two-phase rewrite is checked by
    * the gate itself (sks sums are integral doubles — exact,
    * order-free). */
  val q74_salted_agg: (SparkSession, String) => DataFrame = (s, d) =>
    // salt on key+value plus (student, course) — the high-cardinality
    // pair that spreads a hot grade without touching the fact's other
    // columns (column pruning keeps the scan at these 4)
    saltedCountSum(Star.fact(s, d), col("huruf"), col("sks"), 8,
        Seq(col("huruf"), col("sks"), col("student"), col("course")))
      .select(col("k").as("huruf"), col("n").as("n_rows"), col("s").as("sum_sks"))
      .orderBy("huruf")

  /** Salted skew JOIN: equi-join `left` to `right` on `key` with the hot
    * key spread over `numSalts` reducers — the manual fallback when AQE's
    * runtime skew-split can't apply (e.g. the join feeds an operator that
    * pins the partitioning, or AQE is off). The probe side gets a
    * deterministic [[rowSalt]] over the caller's `saltOn` columns (each
    * probe row matches EXACTLY the replica of its key carrying its salt,
    * so join multiplicity is unchanged, and the salt survives task
    * retries — see [[rowSalt]]); the build side is replicated ×numSalts
    * — its size cost is the price of spreading the hot key, which is why
    * numSalts stays single-digit. The join key becomes (key, salt):
    * still a hash-partitionable equi-join. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      numSalts: Int, saltOn: Seq[Column]): DataFrame = {
    // the working column must not shadow (left) or drop (right) a real
    // business column — fail loudly rather than silently losing data
    val salt = "__graft_salt"
    require(!left.columns.contains(salt) && !right.columns.contains(salt),
      s"saltedJoin reserves the column name '$salt'")
    val salted = left.withColumn(salt, rowSalt(saltOn, numSalts))
    val replicated = right.withColumn(salt,
      explode(sequence(lit(0L), lit(numSalts.toLong - 1L))))
    salted.join(replicated, Seq(key, salt)).drop(salt)
  }

  /** q103: the salted join as an oracle-checked operator — each event
    * joined to its user's profile row (event count), the canonical
    * hot-user fact⋈profile shape: one bot user's events all hash to one
    * reducer in a plain shuffle join, and the salt spreads them over 8.
    * The per-user profile here is derived from the same table (so the
    * oracle is self-contained); at scale it stands in for any
    * user-keyed table too large to broadcast. The oracle computes the
    * PLAIN join + aggregate, so the gate checks the rewrite's
    * equivalence, exactly like q74. Aggregated output (per event type)
    * keeps the result set small; sums are of integer counts — exact,
    * order-free. */
  val q103_salted_join: (SparkSession, String) => DataFrame = (s, d) => {
    // the ONE events reader (TIMESTAMP(NANOS) session contract enforced
    // there); the unused es column is pruned by Catalyst. ts rides along
    // as the high-cardinality payload rowSalt needs — a hot user's events
    // are identical in (user_id, event_type) but distinct in ts, so the
    // deterministic salt still spreads them; the final aggregate never
    // reads ts, so Catalyst prunes it right after the salt projection.
    val ev = Events.events(s, d).select("user_id", "event_type", "ts")
    val prof = ev.groupBy("user_id").agg(count(lit(1)).as("n_user_events"))
    saltedJoin(ev, prof, "user_id", 8,
        Seq(col("user_id"), col("event_type"), col("ts")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum("n_user_events").as("sum_profile"))
      .orderBy("event_type")
  }

  /** q192 Bloom-prune geometry: m = 2^20 bit positions, k = 2 probes
    * per key — the first and second 8 md5 hex digits of the key's
    * fingerprint, each mod m (the q171 position scheme at a join-sized
    * m). The filter travels as the DISTINCT set of SET positions —
    * ≤ min(2·n_build, m) rows — so its size is bounded by BOTH the
    * build-key count and the geometry, and it broadcasts at the build
    * sizes this operator targets. */
  private val bloomJoinBits = 1L << 20

  /** The two bit positions of a join key (any type; fingerprinted via
    * its canonical string form). */
  private def bloomJoinPos(key: Column): Column = {
    val fp = md5(key.cast("string"))
    array(
      pmod(conv(substring(fp, 1, 8), 16, 10).cast("long"), lit(bloomJoinBits)),
      pmod(conv(substring(fp, 9, 8), 16, 10).cast("long"), lit(bloomJoinBits)))
  }

  /** Bloom pre-filter for a semi-join: keep the rows of `big` whose
    * `key` MIGHT appear in `buildKeys` — both of the key's Bloom
    * positions are set in the filter built from the build side. No
    * false negatives by construction (a true match's positions are set
    * by its own build key), so the follow-up exact join loses nothing;
    * false positives merely survive until that join. The prune is two
    * BROADCAST semi-joins against the kilobyte position set, applied
    * BEFORE any shuffle — at 100 TB this is the difference between
    * shuffling the full fact and shuffling roughly its matching slice,
    * the same job Spark's runtime row-level filtering does when it
    * applies, available here as an explicit, composable operator. */
  private[graft] def bloomPruned(big: DataFrame, buildKeys: DataFrame,
      key: String): DataFrame = {
    val work = "__graft_bpos"
    require(!big.columns.contains(work),
      s"bloomPruned reserves the column name '$work'")
    val bits = buildKeys.select(explode(bloomJoinPos(col(key))).as("pos"))
      .distinct()
    big.withColumn(work, bloomJoinPos(col(key)))
      .join(broadcast(bits), col(work).getItem(0) === col("pos"), "leftsemi")
      .join(broadcast(bits), col(work).getItem(1) === col("pos"), "leftsemi")
      .drop(work)
  }

  /** Bloom-pruned EXACT semi-join: [[bloomPruned]] to shed non-matching
    * rows map-side, then the exact semi-join on the survivors. Result
    * is identical to `big.join(buildKeys, key, "leftsemi")` — the q74/
    * q103 contract: the gate runs the plain join as the oracle, so the
    * rewrite's equivalence is checked per-round. */
  def bloomSemiJoin(big: DataFrame, buildKeys: DataFrame,
      key: String): DataFrame =
    bloomPruned(big, buildKeys, key)
      .join(buildKeys.select(key).distinct(), Seq(key), "leftsemi")

  /** q192: the Bloom-pruned semi-join as an oracle-checked operator —
    * lineitem rows belonging to URGENT orders, revenue by return flag.
    * The build side (one priority class of orders) is the shape too
    * big to broadcast at the 100 TB regime but whose kilobyte Bloom
    * positions still travel to every scan task; the oracle computes
    * the PLAIN `IN` join, gating the rewrite's equivalence. Cents are
    * rounded per row before the BIGINT sum (house float rule). */
  val q192_bloom_semijoin: (SparkSession, String) => DataFrame = (s, d) => {
    val urgent = s.read.parquet(s"$d/orders.parquet")
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"))
    val items = s.read.parquet(s"$d/lineitem.parquet")
      .select(col("l_orderkey"), col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("price_c"))
    bloomSemiJoin(items, urgent, "l_orderkey")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"), sum("price_c").as("rev_c"))
      .orderBy("l_returnflag")
  }

  /** q199: JOIN-CARDINALITY estimation from per-key count statistics —
    * the optimizer arithmetic behind every skew decision in this
    * module: |A ⋈ₖ B| = Σₖ nₐ(k)·n_b(k) exactly, so the SIZE of the
    * clicks⋈purchases-by-user join (and its hottest key — the q74/q103
    * salting trigger) is computable from two narrow count aggregates
    * WITHOUT ever shuffling a wide row or materializing a pair. The
    * DuckDB oracle counts the ACTUAL join, so the gate proves the
    * estimate is the true cardinality, not an approximation of it —
    * that exactness is why the product-sum is what a cost model plans
    * shuffles with. Output also carries the max per-key pair count and
    * its key (deterministic (cnt desc, key) min-string tie-break, the
    * house total-order rule). Scale shape: two user-keyed count
    * aggregates (co-partitioned equi-join) + one 1-row rollup; the
    * estimated join itself — quadratic per hot user — is never
    * executed. */
  val q199_join_cardinality: (SparkSession, String) => DataFrame = (s, d) => {
    val ev = graft.ops.Events.events(s, d).select("user_id", "event_type")
    def perUser(t: String, as: String) =
      ev.where(col("event_type") === t)
        .groupBy("user_id").agg(count(lit(1)).as(as))
    perUser("click", "na").join(perUser("purchase", "nb"), "user_id")
      .select(col("user_id"), (col("na") * col("nb")).as("pairs"))
      .agg(count(lit(1)).as("n_users_both"),
        sum("pairs").as("est_pairs"),
        max("pairs").as("max_key_pairs"),
        // (pairs desc, user asc) as a lexicographic struct min — total
        // over the whole int64 domain (the r13 string encoding silently
        // inverted once a per-key pair count reached its 10^18 padding
        // constant, exactly the hot-key regime this statistic targets;
        // r13 advice)
        min(struct((-col("pairs")).as("np"), col("user_id").as("u"))).as("hot"))
      .select(col("n_users_both"), col("est_pairs"), col("max_key_pairs"),
        col("hot.u").as("hot_user"))
  }

  /** q346's advisory threshold: salt when the hottest key exceeds 4×
    * the mean key frequency (top·n_keys > 4·N in exact integers). */
  private[graft] val saltHotFactor = 4L

  /** q346: KEY-SKEW DIAGNOSIS REPORT — the readout that DECIDES when
    * q74/q103's salting is worth its shuffle (the module ships the
    * remedies and the q199 cost arithmetic; an operator first asks
    * "which keys are actually skewed?"): for each candidate
    * partitioning column of the event feed (user, type, day), the key
    * count, the hottest key's frequency and bp share, the p99 key
    * frequency off the frequency-value histogram (two-phase selection,
    * ceil rank — value-domain-bounded, never key count), and the
    * advisory flag top > [[saltHotFactor]]·mean evaluated as the exact
    * cross-product top·n_keys > 4·N in DECIMAL(38,0) (both sides pass
    * 2⁶³ at corpus scale). Scale shape: one narrow count aggregate per
    * column, a frequency histogram, bounded windows. */
  val q346_skew_report: (SparkSession, String) => DataFrame = (s, d) => {
    val ev = graft.ops.Events.events(s, d)
    def arm(label: String, k: Column) =
      keySkewStats(ev.select(k.cast("string").as("k")), label)
    arm("day", expr("CAST(es div 86400 AS BIGINT)"))
      .unionByName(arm("event_type", col("event_type")))
      .unionByName(arm("user_id", col("user_id")))
      .orderBy("key_col")
  }

  /** q346's per-column core over a single-column (k) frame — factored
    * so the spec can pin the ceil-rank p99 and the advisory
    * cross-product on hand keys. */
  private[graft] def keySkewStats(keyed: DataFrame, label: String): DataFrame = {
    val hist = keyed.groupBy("k").agg(count(lit(1)).as("cnt"))
      .groupBy("cnt").agg(count(lit(1)).as("nk"))
    val tot = hist.agg(sum(expr("cnt * nk")).as("n_rows"),
      sum("nk").as("n_keys"), max("cnt").as("top_cnt"))
    val w = Window.orderBy("cnt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.withColumn("cum", sum("nk").over(w))
      .crossJoin(broadcast(tot))
      .where(col("cum") >= expr("(99 * n_keys + 99) div 100"))
      .agg(min("cnt").as("p99_cnt"), max("n_rows").as("n_rows"),
        max("n_keys").as("n_keys"), max("top_cnt").as("top_cnt"))
      .select(lit(label).as("key_col"), col("n_rows"), col("n_keys"),
        col("top_cnt"),
        expr("top_cnt * 10000L div n_rows").as("top_share_bp"),
        col("p99_cnt"),
        expr(s"""CAST(CASE WHEN CAST(top_cnt AS DECIMAL(38, 0)) * n_keys
                 > $saltHotFactor * CAST(n_rows AS DECIMAL(38, 0))
                 THEN 1 ELSE 0 END AS BIGINT)""").as("salt_advised"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q74_salted_agg" -> q74_salted_agg,
      "q103_salted_join" -> q103_salted_join,
      "q192_bloom_semijoin" -> q192_bloom_semijoin,
      "q346_skew_report" -> q346_skew_report,
      "q199_join_cardinality" -> q199_join_cardinality)

  val oracle: Map[String, String] = Map(
    // per-column frequency histogram, ceil-rank p99, HUGEINT advisory
    "q346_skew_report" -> {
      val arms = Seq(
        ("day", "CAST(floor(epoch(ts)) AS BIGINT) // 86400"),
        ("event_type", "event_type"),
        ("user_id", "user_id"))
      val ctes = arms.map { case (label, keyExpr) =>
        s"""h_$label AS (
           |  SELECT cnt, CAST(count(*) AS BIGINT) AS nk FROM (
           |    SELECT CAST(count(*) AS BIGINT) AS cnt
           |    FROM events GROUP BY $keyExpr)
           |  GROUP BY 1),
           |t_$label AS (
           |  SELECT CAST(sum(cnt * nk) AS BIGINT) AS n_rows,
           |         CAST(sum(nk) AS BIGINT) AS n_keys,
           |         CAST(max(cnt) AS BIGINT) AS top_cnt FROM h_$label),
           |c_$label AS (
           |  SELECT cnt, CAST(sum(nk) OVER (ORDER BY cnt
           |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
           |  FROM h_$label),
           |r_$label AS (
           |  SELECT '$label' AS key_col, t.n_rows, t.n_keys, t.top_cnt,
           |         CAST(t.top_cnt * 10000 // t.n_rows AS BIGINT)
           |           AS top_share_bp,
           |         (SELECT CAST(min(cnt) AS BIGINT) FROM c_$label
           |          WHERE cum >= (99 * t.n_keys + 99) // 100) AS p99_cnt,
           |         CAST(CASE WHEN CAST(t.top_cnt AS HUGEINT) * t.n_keys
           |                        > $saltHotFactor * CAST(t.n_rows AS HUGEINT)
           |                   THEN 1 ELSE 0 END AS BIGINT) AS salt_advised
           |  FROM t_$label t)""".stripMargin
      }.mkString(",\n")
      val union = arms.map { case (l, _) => s"SELECT * FROM r_$l" }
        .mkString("\nUNION ALL\n")
      s"""WITH $ctes
         |SELECT * FROM (
         |$union
         |) ORDER BY key_col""".stripMargin
    },
    // est_pairs in the oracle is the COUNT OF THE ACTUAL JOIN — the
    // gate proves the product-sum estimate IS the true cardinality
    "q199_join_cardinality" ->
      """WITH e AS (SELECT user_id, event_type FROM events),
        |a AS (SELECT user_id, count(*) AS na FROM e
        |      WHERE event_type = 'click' GROUP BY 1),
        |b AS (SELECT user_id, count(*) AS nb FROM e
        |      WHERE event_type = 'purchase' GROUP BY 1),
        |p AS (SELECT a.user_id AS user_id, na * nb AS pairs
        |      FROM a JOIN b USING (user_id)),
        |truth AS (
        |  SELECT count(*) AS true_pairs
        |  FROM (SELECT user_id FROM e WHERE event_type = 'click') c
        |  JOIN (SELECT user_id FROM e WHERE event_type = 'purchase') pu
        |    USING (user_id))
        |SELECT CAST(count(*) AS BIGINT) AS n_users_both,
        |       CAST((SELECT true_pairs FROM truth) AS BIGINT) AS est_pairs,
        |       CAST(max(pairs) AS BIGINT) AS max_key_pairs,
        |       CAST((min({'np': -pairs, 'u': user_id})).u AS BIGINT) AS hot_user
        |FROM p""".stripMargin,
    "q192_bloom_semijoin" ->
      """SELECT l_returnflag,
        |       CAST(count(*) AS BIGINT) AS n_items,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |         AS rev_c
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |                     WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q74_salted_agg" -> withFact(
      """SELECT huruf, CAST(count(*) AS BIGINT) AS n_rows, sum(sks) AS sum_sks
        |FROM fact GROUP BY huruf ORDER BY huruf""".stripMargin),
    "q103_salted_join" ->
      """WITH ev AS (SELECT user_id, event_type FROM events),
        |prof AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_user_events
        |  FROM ev GROUP BY user_id)
        |SELECT event_type,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(n_user_events) AS BIGINT) AS sum_profile
        |FROM ev JOIN prof USING (user_id)
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
}
