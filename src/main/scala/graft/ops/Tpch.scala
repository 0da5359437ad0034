package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import graft.etl.Star.{round2, round2Sql}

/** The two most-cited TPC-H queries run VERBATIM-semantics over the
  * driver's TPC-H-ish tables — the recognition check that this engine
  * speaks the standard warehouse benchmark, not only its own surface.
  * Money/discount/tax arithmetic is integer-quantized by the house
  * float rule (cents and basis points; per-row truncating div where
  * the spec multiplies rates — defined identically in both engines),
  * so every gated value is exact. Dates compare as epoch seconds (the
  * NTZ-safe double cast under the pinned-UTC session).
  *
  * Reference queries: TPC-H specification rev 2.18 §B (Q1 pricing
  * summary, Q3 shipping priority).
  */
object Tpch {
  type Q = (SparkSession, String) => DataFrame

  private def es(c: Column): Column =
    c.cast(TimestampType).cast(LongType)

  /** 1998-09-02 / 1995-03-15 00:00:00 UTC — Q1's delta=90d cutoff and
    * Q3's date. BOTH engines filter the RAW timestamp column against a
    * literal of the same instant (Spark: NTZ literal, pushed to the
    * parquet scan — TpchSpec pins PushedFilters; DuckDB: ::TIMESTAMP
    * literal), so the predicates are form-identical even for
    * fractional-second timestamps — a floor(epoch(ts)) comparison on
    * the oracle side would diverge in the 1-second window past each
    * cutoff (r13 advice). Epoch constants remain only where an OUTPUT
    * column derives an epoch value. */
  private val q1CutoffTs = "TIMESTAMP_NTZ '1998-09-02 00:00:00'"
  private val q3DateTs = "TIMESTAMP_NTZ '1995-03-15 00:00:00'"

  private def lineitem(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/lineitem.parquet")
      .withColumn("ship_es", es(col("l_shipdate")))
      .withColumn("qty", round(col("l_quantity")).cast("long"))
      .withColumn("ext_c", round(col("l_extendedprice") * 100).cast("long"))
      .withColumn("disc_bp", round(col("l_discount") * 10000).cast("long"))
      .withColumn("tax_bp", round(col("l_tax") * 10000).cast("long"))
      // the spec's ext·(1−disc) and ·(1+tax), per-row truncated to
      // cents so the running sums stay far inside int64
      .withColumn("disc_price_c",
        expr("ext_c * (10000 - disc_bp) div 10000"))
      .withColumn("charge_c",
        expr("disc_price_c * (10000 + tax_bp) div 10000"))

  /** q203: TPC-H Q1 — the pricing summary report: per (returnflag,
    * linestatus) over everything shipped by the cutoff, quantity /
    * base / discounted / charged sums, three averages and the row
    * count. ONE scan, one narrow 4-group aggregate — the canonical
    * map-side-combine query; averages are the single round2 division
    * each (house rule). */
  val q203_tpch_q1: Q = (s, d) =>
    lineitem(s, d)
      .where(expr(s"l_shipdate <= $q1CutoffTs"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("qty").as("sum_qty"),
        sum("ext_c").as("sum_base_price_c"),
        sum("disc_price_c").as("sum_disc_price_c"),
        sum("charge_c").as("sum_charge_c"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty",
        round2(col("sum_qty").cast("double") / col("count_order").cast("double")))
      .withColumn("avg_price_c",
        round2(col("sum_base_price_c").cast("double") / col("count_order").cast("double")))
      .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
        col("sum_base_price_c"), col("sum_disc_price_c"), col("sum_charge_c"),
        col("avg_qty"), col("avg_price_c"), col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** q204: TPC-H Q3 — shipping priority: BUILDING-segment customers'
    * orders placed before the date, revenue from their lineitems
    * shipped after it, top 10 by (revenue desc, orderdate asc) with
    * o_orderkey completing the deterministic total order. Scale shape:
    * two hash equi-joins on the key columns (customer side reduced by
    * the segment filter BEFORE the join; order/lineitem dates pushed
    * to the scans), a (orderkey, orderdate)-keyed aggregate, and the
    * global top-10 as one TakeOrderedAndProject — no window, no full
    * sort. */
  val q204_tpch_q3: Q = (s, d) => {
    val cust = s.read.parquet(s"$d/customer.parquet")
      .where(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = s.read.parquet(s"$d/orders.parquet")
      .where(expr(s"o_orderdate < $q3DateTs"))
      .withColumn("order_es", es(col("o_orderdate")))
      .select("o_orderkey", "o_custkey", "order_es")
    val li = lineitem(s, d)
      .where(expr(s"l_shipdate > $q3DateTs"))
      .select(col("l_orderkey"), col("disc_price_c"))
    ord.join(cust, col("o_custkey") === col("c_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey", "order_es")
      .agg(sum("disc_price_c").as("revenue_c"))
      .orderBy(col("revenue_c").desc, col("order_es").asc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("revenue_c"), col("order_es"))
  }

  /** q206-adjacent constants: Q5's year window (the generated data's
    * order dates start in 1995, so the spec's 1994 window is shifted
    * to a populated year — semantics unchanged). */
  private val q5Lo = "TIMESTAMP_NTZ '1996-01-01 00:00:00'"
  private val q5Hi = "TIMESTAMP_NTZ '1997-01-01 00:00:00'"

  /** q205: TPC-H Q5 — local-supplier revenue per nation: the 6-table
    * star (region→nation broadcast dims; customer⋈orders⋈lineitem the
    * fact chain; supplier closing the "customer and supplier share a
    * nation" condition as an extra equi conjunct, NOT a theta filter).
    * The canonical broadcast-the-dims / shuffle-the-facts plan: region
    * and nation are kilobytes at any scale and pinned `broadcast()`;
    * the fact joins are key-partitioned equi joins; both date bounds
    * and the region name push to their scans. Revenue is the Q1/Q3
    * integer disc_price. */
  val q205_tpch_q5: Q = (s, d) => {
    val nations = broadcast(
      s.read.parquet(s"$d/region.parquet").where(col("r_name") === "ASIA")
        .join(s.read.parquet(s"$d/nation.parquet"),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name"))
    val cust = s.read.parquet(s"$d/customer.parquet")
      .join(nations, col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "c_nationkey", "n_name")
    val ord = s.read.parquet(s"$d/orders.parquet")
      .where(expr(s"o_orderdate >= $q5Lo AND o_orderdate < $q5Hi"))
      .select("o_orderkey", "o_custkey")
    val li = lineitem(s, d).select("l_orderkey", "l_suppkey", "disc_price_c")
    val supp = s.read.parquet(s"$d/supplier.parquet")
      .select("s_suppkey", "s_nationkey")
    ord.join(cust, col("o_custkey") === col("c_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .join(supp, col("s_suppkey") === col("l_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .groupBy("n_name")
      .agg(sum("disc_price_c").as("revenue_c"))
      .orderBy(col("revenue_c").desc, col("n_name").asc)
  }

  private val q14Lo = "TIMESTAMP_NTZ '1996-03-01 00:00:00'"
  private val q14Hi = "TIMESTAMP_NTZ '1996-04-01 00:00:00'"

  /** q206: TPC-H Q14 — promotion revenue share for one ship-month:
    * `100 · Σ(promo disc_price) / Σ(disc_price)` over lineitem⋈part
    * (this corpus's p_type is the single word the spec prefixes with
    * 'PROMO'). Reported as exact integer basis points
    * (`promo·10000 div total`) plus both cent sums, so the gate needs
    * no float at all. Scale shape: the month filter pushes to the
    * lineitem scan; part is dim-sized and rides a key equi-join; one
    * 1-row conditional aggregate. */
  val q206_tpch_q14: Q = (s, d) => {
    val li = lineitem(s, d)
      .where(expr(s"l_shipdate >= $q14Lo AND l_shipdate < $q14Hi"))
      .select("l_partkey", "disc_price_c")
    val part = s.read.parquet(s"$d/part.parquet").select("p_partkey", "p_type")
    li.join(part, col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", col("disc_price_c"))
          .otherwise(0L)).as("promo_rev_c"),
        sum("disc_price_c").as("total_rev_c"))
      .withColumn("promo_share_bp",
        expr("CAST(promo_rev_c * 10000 div total_rev_c AS BIGINT)"))
  }

  /** q214: TPC-H Q13 — customer order-count distribution: LEFT OUTER
    * join customer→orders (with a join-side order filter, so excluded
    * orders still leave their customer counted at 0 — the semantics an
    * inner join cannot express), count orders per customer, then the
    * count-of-counts histogram. This corpus has no o_comment, so the
    * spec's `NOT LIKE '%special%requests%'` order exclusion becomes
    * `o_orderpriority NOT LIKE '%URGENT%'` — same shape (a pattern
    * anti-filter INSIDE the outer join's right side), documented
    * substitution. Scale: one shuffle equi-join on custkey (orders
    * filtered before the join), a custkey-keyed count, and a
    * distribution aggregate over ≤ #distinct-counts rows. */
  val q214_tpch_q13: Q = (s, d) => {
    val ord = s.read.parquet(s"$d/orders.parquet")
      .where(not(col("o_orderpriority").like("%URGENT%")))
      .select("o_orderkey", "o_custkey")
    s.read.parquet(s"$d/customer.parquet").select("c_custkey")
      .join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** q215: TPC-H Q18 — large-volume customers: orders whose total
    * line quantity exceeds 300 (spec threshold; integer qty under the
    * house rule), with customer, order date and price. The HAVING
    * subquery materializes FIRST as a per-orderkey aggregate and the
    * filtered survivor set joins back — the semi-join-against-aggregate
    * shape; lineitem is scanned twice but never self-joined row-to-row.
    * The survivor set is NOT output-bound: the qty>300 tail is a small
    * constant FRACTION of orders (~0.004% under TPC-H qty
    * distributions), i.e. linear in the corpus — so no broadcast hint
    * (a hint bypasses AQE's size check and would force-ship millions of
    * rows at sf100k). AQE elects broadcast at runtime while the set is
    * actually under threshold and falls back to a shuffled hash join
    * when it is not (r14 verdict item 2). Deterministic total order:
    * (price desc, date asc, orderkey asc), top 100. */
  val q215_tpch_q18: Q = (s, d) => {
    val big = s.read.parquet(s"$d/lineitem.parquet")
      .groupBy("l_orderkey")
      .agg(sum(round(col("l_quantity")).cast("long")).as("sum_qty"))
      .where(col("sum_qty") > 300L)
    val ord = s.read.parquet(s"$d/orders.parquet")
      .withColumn("order_es", es(col("o_orderdate")))
      .withColumn("total_price_c", round(col("o_totalprice") * 100).cast("long"))
      .select("o_orderkey", "o_custkey", "order_es", "total_price_c")
    ord.join(big, col("o_orderkey") === col("l_orderkey"))
      .join(s.read.parquet(s"$d/customer.parquet")
        .select("c_custkey", "c_name"), col("c_custkey") === col("o_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("order_es"), col("total_price_c"), col("sum_qty"))
      .orderBy(col("total_price_c").desc, col("order_es").asc,
        col("o_orderkey").asc)
      .limit(100)
  }

  /** q216: TPC-H Q21 — suppliers who kept orders waiting: for finished
    * ('F') orders, count lineitem rows whose supplier shipped LATE
    * while at least one OTHER supplier fed the same order (EXISTS) and
    * no other supplier was late on it (NOT EXISTS) — the
    * who-actually-blocked-the-order audit. This corpus carries no
    * receipt/commit dates, so "late" is the documented substitution
    * `l_shipdate > o_orderdate + 60 days`; nation filter NATION_7
    * (spec: SAUDI ARABIA). The correlated EXISTS + NOT EXISTS pair
    * DECORRELATES to one per-order aggregate — distinct suppliers and
    * distinct LATE suppliers — joined back to the fact rows: a row
    * qualifies iff late ∧ ns > 1 ∧ n_late_supp = 1 (it is late and the
    * ONLY late supplier among several). No self-join of lineitem at
    * row grain, no correlated re-scan per row — two passes over the
    * same orderkey-shuffled frame; the oracle states the spec's
    * correlated form verbatim, so the gate proves the decorrelation.
    * The supplier/nation dims are broadcast. */
  val q216_tpch_q21: Q = (s, d) => {
    // the 3-column joined frame feeds BOTH the per-order aggregate and
    // the late-row probe side — persist it narrow (Ckpt-scoped, spills
    // under pressure) instead of running the join twice
    val lo = graft.Ckpt.persisted(s.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(s.read.parquet(s"$d/orders.parquet")
        .where(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        expr("CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAYS THEN 1L ELSE 0L END"))
      .select("l_orderkey", "l_suppkey", "late"))
    val perOrder = lo.groupBy("l_orderkey")
      .agg(countDistinct(col("l_suppkey")).as("ns"),
        countDistinct(when(col("late") === 1L, col("l_suppkey"))).as("nls"))
    val supp = broadcast(s.read.parquet(s"$d/supplier.parquet")
      .join(s.read.parquet(s"$d/nation.parquet")
        .where(col("n_name") === "NATION_7"),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name"))
    lo.where(col("late") === 1L)
      .join(perOrder, "l_orderkey")
      .where(col("ns") > 1L && col("nls") === 1L)
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(100)
  }

  // ---- r14: the remaining TPC-H queries expressible over this
  // corpus's seven tables. (r16: Q2/Q9/Q11/Q16/Q20 — which need
  // partsupp, a table the driver data does not ship — are now gated
  // end-to-end over the DERIVED partsupp below, retiring the r14/r15
  // shape-coverage argument: TPC-H coverage is 22 of 22.)

  private val q4Lo = "TIMESTAMP_NTZ '1996-07-01 00:00:00'"
  private val q4Hi = "TIMESTAMP_NTZ '1996-10-01 00:00:00'"

  /** q218: TPC-H Q4 — order priority checking: orders placed in one
    * quarter with at least one late lineitem, counted per priority.
    * This corpus has no commit/receipt dates, so "late" is the q216
    * substitution `l_shipdate > o_orderdate + 60 days`. Shape: the
    * spec's correlated EXISTS becomes one LEFT SEMI hash join on
    * orderkey with the date comparison as a join-side conjunct — no
    * per-row re-scan; the quarter bounds push to the orders scan. */
  val q218_tpch_q4: Q = (s, d) => {
    val ord = s.read.parquet(s"$d/orders.parquet")
      .where(expr(s"o_orderdate >= $q4Lo AND o_orderdate < $q4Hi"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = s.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey", "l_shipdate")
    ord.join(li, col("o_orderkey") === col("l_orderkey") &&
        expr("l_shipdate > o_orderdate + INTERVAL 60 DAYS"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  private val q6Lo = "TIMESTAMP_NTZ '1996-01-01 00:00:00'"
  private val q6Hi = "TIMESTAMP_NTZ '1997-01-01 00:00:00'"

  /** q219: TPC-H Q6 — the forecasting-revenue-change query: ONE scan,
    * three pushed raw-column predicates (ship year, discount band,
    * quantity cap — all on the stored columns, so every one reaches
    * PushedFilters), zero joins, a 1-row sum. Revenue is the house
    * integer `ext_c · disc_bp div 10000` (the spec's
    * l_extendedprice·l_discount). The raw-double discount bounds are
    * exact: both engines compare the same stored IEEE values against
    * the same literals. */
  val q219_tpch_q6: Q = (s, d) =>
    s.read.parquet(s"$d/lineitem.parquet")
      .where(expr(s"l_shipdate >= $q6Lo AND l_shipdate < $q6Hi") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24.0)
      .select(
        (round(col("l_extendedprice") * 100).cast("long") *
          round(col("l_discount") * 10000).cast("long")).as("rev_num"))
      .agg(expr("CAST(sum(rev_num) div 10000 AS BIGINT)").as("revenue_c"))

  private val q7Lo = "TIMESTAMP_NTZ '1996-01-01 00:00:00'"
  private val q7Hi = "TIMESTAMP_NTZ '1998-01-01 00:00:00'"

  /** q220: TPC-H Q7 — volume shipping between two nations: lineitems
    * shipped in a two-year window where (supplier, customer) nations
    * are (A,B) or (B,A), revenue per (supp_nation, cust_nation,
    * ship_year). Shape: the nation dims pre-filtered to the two names
    * and broadcast onto supplier/customer (which shrink to ~2/25 of
    * their rows BEFORE the fact joins); the disjunctive pair predicate
    * is applied after both nations are attached — 2×2 rows minus the
    * two same-nation cases, never a theta join. Year extraction is
    * calendar-exact in both engines under the pinned-UTC session. */
  val q220_tpch_q7: Q = (s, d) => {
    val nat = broadcast(s.read.parquet(s"$d/nation.parquet")
      .where(col("n_name").isin("NATION_3", "NATION_8")))
    val supp = s.read.parquet(s"$d/supplier.parquet")
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = s.read.parquet(s"$d/customer.parquet")
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ord = s.read.parquet(s"$d/orders.parquet")
      .select("o_orderkey", "o_custkey")
    lineitem(s, d)
      .where(expr(s"l_shipdate >= $q7Lo AND l_shipdate < $q7Hi"))
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
        col("disc_price_c"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .where((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_8") ||
        (col("supp_nation") === "NATION_8" && col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum("disc_price_c").as("revenue_c"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** q221: TPC-H Q8 — national market share: of the ASIA-region
    * customers' STANDARD-part order volume in 1996–1997, the share
    * supplied from NATION_7, per order year. The share is exact
    * integer basis points (`nation_rev · 10000 div total_rev`) so the
    * gate needs no float. Shape: part/nation/region dims broadcast;
    * the conditional numerator and the total ride ONE aggregate —
    * never two passes over the joined fact. */
  val q221_tpch_q8: Q = (s, d) => {
    val cust = s.read.parquet(s"$d/customer.parquet")
      .join(broadcast(s.read.parquet(s"$d/region.parquet")
        .where(col("r_name") === "ASIA")
        .join(s.read.parquet(s"$d/nation.parquet"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cnk"))),
        col("c_nationkey") === col("cnk"))
      .select("c_custkey")
    val ord = s.read.parquet(s"$d/orders.parquet")
      .where(expr(s"o_orderdate >= $q7Lo AND o_orderdate < $q7Hi"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val part = broadcast(s.read.parquet(s"$d/part.parquet")
      .where(col("p_type") === "STANDARD").select("p_partkey"))
    val supp = broadcast(s.read.parquet(s"$d/supplier.parquet")
      .join(s.read.parquet(s"$d/nation.parquet"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation")))
    lineitem(s, d)
      .select("l_orderkey", "l_partkey", "l_suppkey", "disc_price_c")
      .join(part, col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_7", col("disc_price_c"))
          .otherwise(0L)).as("nation_rev_c"),
        sum("disc_price_c").as("total_rev_c"))
      .withColumn("mkt_share_bp",
        expr("CAST(nation_rev_c * 10000 div total_rev_c AS BIGINT)"))
      .orderBy("o_year")
  }

  private val q10Lo = "TIMESTAMP_NTZ '1996-01-01 00:00:00'"
  private val q10Hi = "TIMESTAMP_NTZ '1996-04-01 00:00:00'"

  /** q222: TPC-H Q10 — returned-item reporting: revenue lost to
    * returns ('R' lineitems) on one quarter's orders, per customer,
    * top 20. Shape: quarter bounds push to the orders scan and the
    * returnflag to the lineitem scan; two key equi-joins, a
    * custkey-keyed aggregate, nation broadcast last (AFTER the
    * aggregate — one row per customer, not per lineitem), top-20 as
    * TakeOrderedAndProject with acctbal cents + custkey completing the
    * deterministic order. */
  val q222_tpch_q10: Q = (s, d) => {
    val ord = s.read.parquet(s"$d/orders.parquet")
      .where(expr(s"o_orderdate >= $q10Lo AND o_orderdate < $q10Hi"))
      .select("o_orderkey", "o_custkey")
    val li = lineitem(s, d)
      .where(col("l_returnflag") === "R")
      .select("l_orderkey", "disc_price_c")
    val cust = s.read.parquet(s"$d/customer.parquet")
      .withColumn("acctbal_c", round(col("c_acctbal") * 100).cast("long"))
      .select("c_custkey", "c_name", "c_nationkey", "acctbal_c")
    val nat = broadcast(s.read.parquet(s"$d/nation.parquet")
      .select("n_nationkey", "n_name"))
    ord.join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_custkey")
      .agg(sum("disc_price_c").as("revenue_c"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue_c"),
        col("acctbal_c"), col("n_name"))
      .orderBy(col("revenue_c").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** q223: TPC-H Q12 — shipping-priority audit: for lineitems shipped
    * in one year that arrived LATE (the q216 60-day substitution — no
    * receipt date exists), count high- vs low-priority orders per
    * lineitem category. The corpus carries no l_shipmode; the grouping
    * rides l_linestatus, the lineitem categorical of the same grain
    * (documented substitution, shape unchanged: a fact→orders equi
    * join with a conditional two-way classification aggregate). */
  val q223_tpch_q12: Q = (s, d) => {
    val li = s.read.parquet(s"$d/lineitem.parquet")
      .where(expr(s"l_shipdate >= $q6Lo AND l_shipdate < $q6Hi"))
      .select("l_orderkey", "l_linestatus", "l_shipdate")
    val ord = s.read.parquet(s"$d/orders.parquet")
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .where(expr("l_shipdate > o_orderdate + INTERVAL 60 DAYS"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  /** q224: TPC-H Q15 — top supplier: per-supplier revenue over one
    * quarter, return the supplier(s) achieving the global maximum.
    * The spec's scalar-subquery-against-a-view becomes: aggregate once,
    * take the 1-row global max of that aggregate, and join it back as
    * a BROADCAST HASH EQUI-join on the revenue value itself — the
    * max-selection is a value join, not a cartesian or a global
    * window. Ties (spec-possible) all surface, ordered by suppkey. */
  val q224_tpch_q15: Q = (s, d) => {
    val rev = lineitem(s, d)
      .where(expr(s"l_shipdate >= $q10Lo AND l_shipdate < $q10Hi"))
      .groupBy(col("l_suppkey"))
      .agg(sum("disc_price_c").as("total_revenue_c"))
    val top = broadcast(rev.agg(max("total_revenue_c").as("max_rev_c")))
    rev.join(top, col("total_revenue_c") === col("max_rev_c"))
      .join(s.read.parquet(s"$d/supplier.parquet")
        .select("s_suppkey", "s_name"), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue_c"))
      .orderBy("s_suppkey")
  }

  /** q225: TPC-H Q17 — small-quantity-order revenue: for one brand's
    * small parts (p_size ≤ 10 substitutes the absent p_container),
    * revenue from lineitems whose quantity is below 20% of that part's
    * average, scaled to a yearly figure. The correlated per-part AVG
    * decorrelates to ONE per-partkey aggregate joined back; the float
    * `qty < 0.2·avg(qty)` is the exact integer cross-multiplication
    * `5·qty·cnt < sum_qty` (all positive — no truncation anywhere).
    * avg_yearly_c is the single spec division, exact under div 7. */
  val q225_tpch_q17: Q = (s, d) => {
    val part = broadcast(s.read.parquet(s"$d/part.parquet")
      .where(col("p_brand") === "Brand#1" && col("p_size") <= 10)
      .select("p_partkey"))
    val li = lineitem(s, d)
      .join(part, col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "qty", "ext_c")
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum("qty").as("sum_qty"), count(lit(1)).as("cnt"))
    li.join(perPart, col("l_partkey") === col("pk"))
      .where(col("qty") * lit(5L) * col("cnt") < col("sum_qty"))
      .agg(expr("CAST(sum(ext_c) div 7 AS BIGINT)").as("avg_yearly_c"))
  }

  /** q226: TPC-H Q19 — discounted revenue under three disjunctive
    * brand/size/quantity blocks (p_size bands substitute the absent
    * p_container): one lineitem⋈part broadcast equi-join on partkey
    * with the OR-of-conjuncts as a post-join filter — exactly how the
    * spec's disjunction (which shares the partkey equi conjunct)
    * should plan; per-block quantity windows keep it selective. */
  val q226_tpch_q19: Q = (s, d) => {
    val part = broadcast(s.read.parquet(s"$d/part.parquet")
      .select("p_partkey", "p_brand", "p_size"))
    lineitem(s, d)
      .select("l_partkey", "qty", "disc_price_c")
      .join(part, col("l_partkey") === col("p_partkey"))
      .where(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
          col("qty").between(1L, 11L)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
          col("qty").between(10L, 20L)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
          col("qty").between(20L, 30L)))
      .agg(coalesce(sum("disc_price_c"), lit(0L)).as("revenue_c"))
  }

  private val q22Cut = "TIMESTAMP_NTZ '2000-01-01 00:00:00'"

  /** q227: TPC-H Q22 — global sales opportunity: customers from seven
    * nations (c_nationkey substitutes the absent phone country code)
    * with above-average positive balances and no RECENT orders (the
    * spec's 7-year dormancy window, sized to this corpus's 1995–2001
    * date range as "nothing since 2000" — every customer here has
    * SOME order, so the literal no-orders-ever form is vacuous),
    * counted and summed per nation. The scalar AVG subquery is a
    * 1-row bounded collect (two longs) folded in as the exact integer
    * cross-multiplication `bal_c · cnt > sum_c` — no float, no
    * cartesian; the dormancy predicate is a LEFT ANTI hash join
    * against the date-pruned orders scan. */
  val q227_tpch_q22: Q = (s, d) => {
    val nations = Seq(1, 3, 5, 7, 9, 11, 13)
    val cust = s.read.parquet(s"$d/customer.parquet")
      .where(col("c_nationkey").isin(nations: _*))
      .withColumn("bal_c", round(col("c_acctbal") * 100).cast("long"))
      .select("c_custkey", "c_nationkey", "bal_c")
    val Array(sumC, cnt) = cust.where(col("bal_c") > 0L)
      .agg(sum("bal_c"), count(lit(1))).head().toSeq
      .map(v => v.asInstanceOf[Long]).toArray
    cust.where(col("bal_c") * lit(cnt) > lit(sumC))
      .join(s.read.parquet(s"$d/orders.parquet")
        .where(expr(s"o_orderdate >= $q22Cut")).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").cast("long").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"), sum("bal_c").as("totacctbal_c"))
      .orderBy("cntrycode")
  }

  // ---- r16: the five queries previously excluded for the missing
  // partsupp table, now gated end-to-end over a DERIVED partsupp.

  /** Derived PARTSUPP — the one TPC-H table the driver corpus does not
    * ship, synthesized deterministically at (l_partkey, l_suppkey)
    * grain from lineitem so Q2/Q9/Q11/Q16/Q20 gate their ACTUAL nested
    * shapes end-to-end instead of arguing shape coverage (SURVEY §8,
    * retired in r16). One row per pair that ever traded; the two spec
    * columns are md5-derived by the documented house hex-prefix trick
    * (TextCore.idBucket's), so BOTH engines rebuild the identical
    * table from the identical parquet bytes:
    *   ps_availqty     = 1 + hex(md5(key)[1..4])  % 9999   (spec 1..9999)
    *   ps_supplycost_c = 1 + hex(md5(key)[5..8]) % 100000  (cents ≤ $1000)
    * with key = partkey || '_' || suppkey. Hash-derived rather than
    * aggregate-derived on purpose: availqty INDEPENDENT of the pair's
    * own demand keeps Q20's availqty-vs-shipped threshold genuinely
    * selective, and supplycost varying across a part's suppliers keeps
    * Q2's min-cost subquery discriminating. Scale: one distinct
    * (part, supp) aggregate over lineitem — the same shuffle grain
    * loading the real table would cost. */
  private[graft] def partsupp(s: SparkSession, d: String): DataFrame =
    // session-memoized: the derivation stands in for a STORED table (a
    // real TPC-H deployment loads partsupp once, it is not part of any
    // query's work), so all five consumers read one persisted build —
    // the memoPairs policy, with the first toucher paying the build
    graft.SessionMemo(s, d, "tpch:partsupp") {
      val key = concat(col("ps_partkey").cast("string"), lit("_"),
        col("ps_suppkey").cast("string"))
      s.read.parquet(s"$d/lineitem.parquet")
        .select(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
        .distinct()
        .withColumn("ps_availqty", lit(1L) +
          pmod(conv(substring(md5(key), 1, 4), 16, 10).cast("long"), lit(9999L)))
        .withColumn("ps_supplycost_c", lit(1L) +
          pmod(conv(substring(md5(key), 5, 4), 16, 10).cast("long"), lit(100000L)))
    }(_.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** The oracle-side replay of [[partsupp]], shared by all five
    * consumers so the derivation exists exactly once per engine. */
  // NOTE: this string is interpolated into oracle SQL literals that
  // call .stripMargin AFTER interpolation, so no line here may begin
  // with whitespace + '|' — keep every `||` at end-of-line.
  private val psCte: String =
    """ps AS (
      |  SELECT ps_partkey, ps_suppkey,
      |         1 + CAST('0x' || substr(md5(CAST(ps_partkey AS VARCHAR) || '_' ||
      |             CAST(ps_suppkey AS VARCHAR)), 1, 4) AS BIGINT) % 9999
      |           AS ps_availqty,
      |         1 + CAST('0x' || substr(md5(CAST(ps_partkey AS VARCHAR) || '_' ||
      |             CAST(ps_suppkey AS VARCHAR)), 5, 4) AS BIGINT) % 100000
      |           AS ps_supplycost_c
      |  FROM (SELECT DISTINCT l_partkey AS ps_partkey,
      |               l_suppkey AS ps_suppkey FROM lineitem))""".stripMargin

  /** q256: TPC-H Q2 — min-cost supplier: for each STANDARD-type size-15
    * part, the EUROPE supplier(s) quoting the minimum ps_supplycost,
    * ordered by account balance. Adaptations from spec rev 2.18 §B.2,
    * each forced by the corpus schema: p_type is a single word here so
    * the spec's `LIKE '%BRASS'` suffix match becomes equality on
    * 'STANDARD'; the output's p_mfgr/s_address/s_phone/s_comment
    * columns don't exist, so the report carries the keys and balance,
    * with (p_partkey, s_suppkey) completing the deterministic total
    * order. The spec's correlated scalar-MIN subquery is decorrelated
    * to a per-part MIN window over the SAME region-filtered frame —
    * one partkey shuffle, no self-join, no second scan — while the
    * oracle states the correlated form verbatim, so the gate proves
    * the decorrelation. Scale: supplier⋈nation⋈region is a broadcast
    * probe; partsupp flows through one hash partition by partkey. */
  val q256_tpch_q2: Q = (s, d) => {
    val sup = broadcast(s.read.parquet(s"$d/supplier.parquet")
      .join(s.read.parquet(s"$d/nation.parquet"),
        col("s_nationkey") === col("n_nationkey"))
      .join(s.read.parquet(s"$d/region.parquet").where(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        round(col("s_acctbal") * 100).cast("long").as("s_acctbal_c")))
    val prt = s.read.parquet(s"$d/part.parquet")
      .where(col("p_size") === 15 && col("p_type") === "STANDARD")
      .select("p_partkey")
    val eligible = partsupp(s, d)
      .join(sup, col("ps_suppkey") === col("s_suppkey"))
      .join(prt, col("ps_partkey") === col("p_partkey"))
    eligible
      .withColumn("min_cost_c",
        min("ps_supplycost_c").over(Window.partitionBy("ps_partkey")))
      .where(col("ps_supplycost_c") === col("min_cost_c"))
      .select(col("s_acctbal_c"), col("s_name"), col("n_name"),
        col("p_partkey"), col("s_suppkey"),
        col("ps_supplycost_c").as("cost_c"))
      .orderBy(col("s_acctbal_c").desc, col("n_name").asc, col("s_name").asc,
        col("p_partkey").asc, col("s_suppkey").asc)
      .limit(100)
  }

  /** q257: TPC-H Q9 — product-type profit: for every lineitem whose
    * part name contains 'red' (spec: '%green%'; same two-word name
    * grammar), profit = disc_price − supplycost·qty, aggregated at
    * (supplier nation, order year) grain. All-integer money: the
    * per-row truncated disc_price_c minus the exact supplycost_c·qty.
    * Scale shape: part-name filter reaches the part scan and prunes
    * lineitem through an equi-join BEFORE the (partkey, suppkey) join
    * against partsupp (both corpus-sized → shuffle hash join, AQE
    * elects); supplier⋈nation broadcasts; the orders join brings the
    * year; final agg is 25 nations × ~7 years. */
  val q257_tpch_q9: Q = (s, d) => {
    val li = lineitem(s, d)
      .join(s.read.parquet(s"$d/part.parquet")
        .where(col("p_name").like("%red%")).select("p_partkey"),
        col("l_partkey") === col("p_partkey"))
      .join(partsupp(s, d),
        col("l_partkey") === col("ps_partkey") &&
          col("l_suppkey") === col("ps_suppkey"))
      .join(broadcast(s.read.parquet(s"$d/supplier.parquet")
          .join(s.read.parquet(s"$d/nation.parquet"),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "n_name")),
        col("l_suppkey") === col("s_suppkey"))
      .join(s.read.parquet(s"$d/orders.parquet")
          .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
    li.withColumn("profit_c",
        col("disc_price_c") - col("ps_supplycost_c") * col("qty"))
      .groupBy(col("n_name").as("nation"), col("o_year"))
      .agg(sum("profit_c").as("sum_profit_c"))
      .orderBy(col("nation").asc, col("o_year").desc)
  }

  /** q258: TPC-H Q11 — important stock: the value (supplycost·availqty)
    * held by EUROPE suppliers per part, keeping parts whose value
    * exceeds TWICE the average per-part value (spec: nation GERMANY,
    * fraction 0.0001/SF of the total — the spec scales its fraction by
    * 1/SF precisely because a FLAT fraction empties as the part count
    * grows, so the scale-free analog compares against the mean; same
    * grouped-HAVING-vs-global-scalar shape; region EUROPE keeps the
    * probe non-empty at every driver scale). The threshold is the
    * exact integer cross-multiplication sum_part·n_parts > 2·total
    * with the sums lifted to DECIMAL(38,0) — at 100 TB the grand total
    * of cost·qty products (each ≤ 10⁹) over ~10¹⁰ pairs passes int64.
    * Scale: one partkey aggregate; the 1-row total+count rides a
    * broadcast cross join (the q224 pattern). */
  val q258_tpch_q11: Q = (s, d) => {
    val sup = broadcast(s.read.parquet(s"$d/supplier.parquet")
      .join(s.read.parquet(s"$d/nation.parquet"),
        col("s_nationkey") === col("n_nationkey"))
      .join(s.read.parquet(s"$d/region.parquet").where(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey"))
    val held = partsupp(s, d)
      .join(sup, col("ps_suppkey") === col("s_suppkey"))
      .withColumn("value_c",
        (col("ps_supplycost_c") * col("ps_availqty")).cast("decimal(38,0)"))
    val perPart = held.groupBy("ps_partkey")
      .agg(sum("value_c").as("value_dec"))
    perPart
      .crossJoin(broadcast(perPart.agg(sum("value_dec").as("total_dec"),
        count(lit(1)).as("n_parts"))))
      .where(col("value_dec") * col("n_parts") > col("total_dec") * 2)
      .select(col("ps_partkey"), col("value_dec").cast("long").as("value_c"))
      .orderBy(col("value_c").desc, col("ps_partkey").asc)
  }

  /** q259: TPC-H Q16 — supplier-part counts: distinct suppliers able to
    * supply each (brand, type, size) bucket over the spec's 8-size
    * IN-list, excluding Brand#1 / PROMO parts and excluding suppliers
    * on the complaints list — adapted to `s_acctbal < 0` because the
    * corpus ships no s_comment (the spec's `LIKE '%Customer%
    * Complaints%'`); the exclusion is the same NOT-IN → broadcast
    * left-anti shape (an EMPTY exclusion list at sf0.001 is fine —
    * anti-join of nothing drops nothing, and the oracle replays it).
    * Scale: part-side filters reach the scan; the partsupp⋈part join
    * shuffles on partkey; countDistinct at the composite grain. */
  val q259_tpch_q16: Q = (s, d) => {
    val prt = s.read.parquet(s"$d/part.parquet")
      .where(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 9, 15, 22, 30, 38, 44, 50))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val complaints = s.read.parquet(s"$d/supplier.parquet")
      .where(col("s_acctbal") < 0).select(col("s_suppkey").as("ps_suppkey"))
    partsupp(s, d)
      .join(broadcast(complaints), Seq("ps_suppkey"), "left_anti")
      .join(prt, col("ps_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("ps_suppkey").as("supplier_cnt"))
      .select(col("p_brand"), col("p_type"),
        col("p_size").cast("long").as("p_size"), col("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
        col("p_type").asc, col("p_size").asc)
  }

  private val q20Lo = "TIMESTAMP_NTZ '1996-01-01 00:00:00'"
  private val q20Hi = "TIMESTAMP_NTZ '1997-01-01 00:00:00'"

  /** q260: TPC-H Q20 — excess stock: ASIA suppliers (spec: CANADA;
    * region keeps the probe non-empty at sf0.001) holding, for some
    * 'small'-named part (spec: 'forest%'), stock above half of what
    * that (part, supplier) pair shipped in 1996. The spec's nested
    * semi-join chain — suppliers ⊃ partsupp ⊃ parts, with a correlated
    * per-pair shipped-qty subquery — decorrelates to: the 1996
    * lineitem aggregate at (partkey, suppkey) grain, INNER-joined to
    * partsupp (the spec's NULL-compares-false semantics for pairs with
    * no 1996 shipments, exactly), a part-name semi-join, the integer
    * cross-multiplied threshold availqty·2 > shipped, then one
    * LEFT SEMI onto suppliers. The oracle states the correlated
    * IN-chain verbatim, so the gate proves the whole decorrelation.
    * Scale: every join is equi on (part, supp) or suppkey; the name
    * filter reaches the part scan; no row ever multiplies. */
  val q260_tpch_q20: Q = (s, d) => {
    val shipped = s.read.parquet(s"$d/lineitem.parquet")
      .where(expr(s"l_shipdate >= $q20Lo") && expr(s"l_shipdate < $q20Hi"))
      .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .agg(sum(round(col("l_quantity")).cast("long")).as("shipped_qty"))
    val smallParts = s.read.parquet(s"$d/part.parquet")
      .where(col("p_name").like("small%"))
      .select(col("p_partkey").as("ps_partkey"))
    val excess = partsupp(s, d)
      .join(smallParts, Seq("ps_partkey"), "left_semi")
      .join(shipped, Seq("ps_partkey", "ps_suppkey"))
      .where(col("ps_availqty") * 2 > col("shipped_qty"))
      .select(col("ps_suppkey").as("s_suppkey")).distinct()
    s.read.parquet(s"$d/supplier.parquet")
      .join(broadcast(s.read.parquet(s"$d/nation.parquet")
          .join(s.read.parquet(s"$d/region.parquet").where(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"), "left_semi")
      .join(excess, Seq("s_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_name").asc, col("s_suppkey").asc)
  }

  val queries: Map[String, Q] = Map(
    "q203_tpch_q1" -> q203_tpch_q1,
    "q204_tpch_q3" -> q204_tpch_q3,
    "q205_tpch_q5" -> q205_tpch_q5,
    "q206_tpch_q14" -> q206_tpch_q14,
    "q214_tpch_q13" -> q214_tpch_q13,
    "q215_tpch_q18" -> q215_tpch_q18,
    "q216_tpch_q21" -> q216_tpch_q21,
    "q218_tpch_q4" -> q218_tpch_q4,
    "q219_tpch_q6" -> q219_tpch_q6,
    "q220_tpch_q7" -> q220_tpch_q7,
    "q221_tpch_q8" -> q221_tpch_q8,
    "q222_tpch_q10" -> q222_tpch_q10,
    "q223_tpch_q12" -> q223_tpch_q12,
    "q224_tpch_q15" -> q224_tpch_q15,
    "q225_tpch_q17" -> q225_tpch_q17,
    "q226_tpch_q19" -> q226_tpch_q19,
    "q227_tpch_q22" -> q227_tpch_q22,
    "q256_tpch_q2" -> q256_tpch_q2,
    "q257_tpch_q9" -> q257_tpch_q9,
    "q258_tpch_q11" -> q258_tpch_q11,
    "q259_tpch_q16" -> q259_tpch_q16,
    "q260_tpch_q20" -> q260_tpch_q20)

  val oracle: Map[String, String] = Map(
    // the same quantization, cutoffs and single-division averages
    "q203_tpch_q1" ->
      s"""WITH li AS (
         |  SELECT l_returnflag, l_linestatus,
         |         CAST(round(l_quantity) AS BIGINT) AS qty,
         |         CAST(round(l_extendedprice * 100) AS BIGINT) AS ext_c,
         |         CAST(round(l_discount * 10000) AS BIGINT) AS disc_bp,
         |         CAST(round(l_tax * 10000) AS BIGINT) AS tax_bp
         |  FROM lineitem
         |  WHERE l_shipdate <= ${q1CutoffTs.stripPrefix("TIMESTAMP_NTZ ")}::TIMESTAMP),
         |x AS (
         |  SELECT *, ext_c * (10000 - disc_bp) // 10000 AS disc_price_c
         |  FROM li),
         |y AS (
         |  SELECT *, disc_price_c * (10000 + tax_bp) // 10000 AS charge_c
         |  FROM x),
         |g AS (
         |  SELECT l_returnflag, l_linestatus,
         |         CAST(sum(qty) AS BIGINT) AS sum_qty,
         |         CAST(sum(ext_c) AS BIGINT) AS sum_base_price_c,
         |         CAST(sum(disc_price_c) AS BIGINT) AS sum_disc_price_c,
         |         CAST(sum(charge_c) AS BIGINT) AS sum_charge_c,
         |         CAST(count(*) AS BIGINT) AS count_order
         |  FROM y GROUP BY 1, 2)
         |SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price_c,
         |       sum_disc_price_c, sum_charge_c,
         |       ${round2Sql("CAST(sum_qty AS DOUBLE) / CAST(count_order AS DOUBLE)")} AS avg_qty,
         |       ${round2Sql("CAST(sum_base_price_c AS DOUBLE) / CAST(count_order AS DOUBLE)")} AS avg_price_c,
         |       count_order
         |FROM g ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q205_tpch_q5" ->
      s"""SELECT n_name,
         |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
         |         * (10000 - CAST(round(l_discount * 10000) AS BIGINT))
         |         // 10000) AS BIGINT) AS revenue_c
         |FROM region
         |JOIN nation ON n_regionkey = r_regionkey
         |JOIN customer ON c_nationkey = n_nationkey
         |JOIN orders ON o_custkey = c_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= ${q5Lo.stripPrefix("TIMESTAMP_NTZ ")}::TIMESTAMP
         |  AND o_orderdate < ${q5Hi.stripPrefix("TIMESTAMP_NTZ ")}::TIMESTAMP
         |GROUP BY n_name
         |ORDER BY revenue_c DESC, n_name ASC""".stripMargin,
    "q206_tpch_q14" ->
      s"""WITH li AS (
         |  SELECT l_partkey,
         |         CAST(round(l_extendedprice * 100) AS BIGINT)
         |           * (10000 - CAST(round(l_discount * 10000) AS BIGINT))
         |           // 10000 AS dp
         |  FROM lineitem
         |  WHERE l_shipdate >= ${q14Lo.stripPrefix("TIMESTAMP_NTZ ")}::TIMESTAMP
         |    AND l_shipdate < ${q14Hi.stripPrefix("TIMESTAMP_NTZ ")}::TIMESTAMP),
         |g AS (
         |  SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN dp ELSE 0 END)
         |           AS BIGINT) AS promo_rev_c,
         |         CAST(sum(dp) AS BIGINT) AS total_rev_c
         |  FROM li JOIN part ON p_partkey = l_partkey)
         |SELECT promo_rev_c, total_rev_c,
         |       CAST(promo_rev_c * 10000 // total_rev_c AS BIGINT)
         |         AS promo_share_bp
         |FROM g""".stripMargin,
    // the outer-join + count-of-counts stated directly
    "q214_tpch_q13" ->
      """WITH co AS (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey
        |   AND o_orderpriority NOT LIKE '%URGENT%'
        |  GROUP BY c_custkey)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM co GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    // the HAVING subquery stated as the spec's IN form
    "q215_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey,
        |       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS order_es,
        |       CAST(round(o_totalprice * 100) AS BIGINT) AS total_price_c,
        |       (SELECT CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
        |        FROM lineitem WHERE l_orderkey = o_orderkey) AS sum_qty
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 300)
        |ORDER BY total_price_c DESC, order_es ASC, o_orderkey ASC
        |LIMIT 100""".stripMargin,
    // the spec's correlated EXISTS + NOT EXISTS form verbatim — gating
    // the Spark side's per-order-aggregate decorrelation
    "q216_tpch_q21" ->
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier, lineitem l1, orders, nation
        |WHERE s_suppkey = l1.l_suppkey
        |  AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |  AND s_nationkey = n_nationkey
        |  AND n_name = 'NATION_7'
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name ASC
        |LIMIT 100""".stripMargin,
    // the spec's correlated EXISTS form verbatim — gating the Spark
    // side's left-semi-with-conjunct plan
    "q218_tpch_q4" ->
      s"""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
         |FROM orders
         |WHERE o_orderdate >= ${q4Lo.stripPrefix("TIMESTAMP_NTZ ")}::TIMESTAMP
         |  AND o_orderdate < ${q4Hi.stripPrefix("TIMESTAMP_NTZ ")}::TIMESTAMP
         |  AND EXISTS (
         |    SELECT 1 FROM lineitem
         |    WHERE l_orderkey = o_orderkey
         |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin,
    "q219_tpch_q6" ->
      s"""SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
         |         * CAST(round(l_discount * 10000) AS BIGINT)) // 10000
         |       AS BIGINT) AS revenue_c
         |FROM lineitem
         |WHERE l_shipdate >= ${q6Lo.stripPrefix("TIMESTAMP_NTZ ")}::TIMESTAMP
         |  AND l_shipdate < ${q6Hi.stripPrefix("TIMESTAMP_NTZ ")}::TIMESTAMP
         |  AND l_discount >= 0.05 AND l_discount <= 0.07
         |  AND l_quantity < 24.0""".stripMargin,
    "q220_tpch_q7" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |       CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
         |         * (10000 - CAST(round(l_discount * 10000) AS BIGINT))
         |         // 10000) AS BIGINT) AS revenue_c
         |FROM lineitem
         |JOIN supplier ON s_suppkey = l_suppkey
         |JOIN orders ON o_orderkey = l_orderkey
         |JOIN customer ON c_custkey = o_custkey
         |JOIN nation n1 ON n1.n_nationkey = s_nationkey
         |JOIN nation n2 ON n2.n_nationkey = c_nationkey
         |WHERE l_shipdate >= ${q7Lo.stripPrefix("TIMESTAMP_NTZ ")}::TIMESTAMP
         |  AND l_shipdate < ${q7Hi.stripPrefix("TIMESTAMP_NTZ ")}::TIMESTAMP
         |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
         |    OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
         |GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin,
    "q221_tpch_q8" ->
      s"""WITH vol AS (
         |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |         CAST(round(l_extendedprice * 100) AS BIGINT)
         |           * (10000 - CAST(round(l_discount * 10000) AS BIGINT))
         |           // 10000 AS dp,
         |         n2.n_name AS supp_nation
         |  FROM lineitem
         |  JOIN part ON p_partkey = l_partkey
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN customer ON c_custkey = o_custkey
         |  JOIN nation n1 ON n1.n_nationkey = c_nationkey
         |  JOIN region ON r_regionkey = n1.n_regionkey
         |  JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN nation n2 ON n2.n_nationkey = s_nationkey
         |  WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
         |    AND o_orderdate >= ${q7Lo.stripPrefix("TIMESTAMP_NTZ ")}::TIMESTAMP
         |    AND o_orderdate < ${q7Hi.stripPrefix("TIMESTAMP_NTZ ")}::TIMESTAMP)
         |SELECT o_year,
         |       CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN dp ELSE 0 END)
         |         AS BIGINT) AS nation_rev_c,
         |       CAST(sum(dp) AS BIGINT) AS total_rev_c,
         |       CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN dp ELSE 0 END)
         |         AS BIGINT) * 10000
         |         // CAST(sum(dp) AS BIGINT) AS BIGINT) AS mkt_share_bp
         |FROM vol GROUP BY o_year ORDER BY o_year""".stripMargin,
    "q222_tpch_q10" ->
      s"""SELECT c_custkey, c_name,
         |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
         |         * (10000 - CAST(round(l_discount * 10000) AS BIGINT))
         |         // 10000) AS BIGINT) AS revenue_c,
         |       CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c,
         |       n_name
         |FROM customer
         |JOIN orders ON o_custkey = c_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN nation ON n_nationkey = c_nationkey
         |WHERE o_orderdate >= ${q10Lo.stripPrefix("TIMESTAMP_NTZ ")}::TIMESTAMP
         |  AND o_orderdate < ${q10Hi.stripPrefix("TIMESTAMP_NTZ ")}::TIMESTAMP
         |  AND l_returnflag = 'R'
         |GROUP BY c_custkey, c_name, acctbal_c, n_name
         |ORDER BY revenue_c DESC, c_custkey ASC
         |LIMIT 20""".stripMargin,
    "q223_tpch_q12" ->
      s"""SELECT l_linestatus,
         |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         |WHERE l_shipdate >= ${q6Lo.stripPrefix("TIMESTAMP_NTZ ")}::TIMESTAMP
         |  AND l_shipdate < ${q6Hi.stripPrefix("TIMESTAMP_NTZ ")}::TIMESTAMP
         |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
         |GROUP BY l_linestatus
         |ORDER BY l_linestatus""".stripMargin,
    // the spec's scalar-subquery-against-a-view form — gating the
    // Spark side's broadcast value-join max selection
    "q224_tpch_q15" ->
      s"""WITH revenue AS (
         |  SELECT l_suppkey,
         |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
         |           * (10000 - CAST(round(l_discount * 10000) AS BIGINT))
         |           // 10000) AS BIGINT) AS total_revenue_c
         |  FROM lineitem
         |  WHERE l_shipdate >= ${q10Lo.stripPrefix("TIMESTAMP_NTZ ")}::TIMESTAMP
         |    AND l_shipdate < ${q10Hi.stripPrefix("TIMESTAMP_NTZ ")}::TIMESTAMP
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue_c
         |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
         |WHERE total_revenue_c = (SELECT max(total_revenue_c) FROM revenue)
         |ORDER BY s_suppkey""".stripMargin,
    // the spec's correlated per-part AVG stated via the exact integer
    // cross-multiplication (qty < 0.2·avg ⟺ 5·qty·cnt < sum)
    "q225_tpch_q17" ->
      """WITH pl AS (
        |  SELECT l_partkey, CAST(round(l_quantity) AS BIGINT) AS qty,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS ext_c
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_brand = 'Brand#1' AND p_size <= 10),
        |pp AS (
        |  SELECT l_partkey AS pk, CAST(sum(qty) AS BIGINT) AS sum_qty,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM pl GROUP BY 1)
        |SELECT CAST(sum(ext_c) // 7 AS BIGINT) AS avg_yearly_c
        |FROM pl JOIN pp ON l_partkey = pk
        |WHERE qty * 5 * cnt < sum_qty""".stripMargin,
    "q226_tpch_q19" ->
      """SELECT CAST(coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |         * (10000 - CAST(round(l_discount * 10000) AS BIGINT))
        |         // 10000), 0) AS BIGINT) AS revenue_c
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
        |        AND CAST(round(l_quantity) AS BIGINT) BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
        |        AND CAST(round(l_quantity) AS BIGINT) BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |        AND CAST(round(l_quantity) AS BIGINT) BETWEEN 20 AND 30)""".stripMargin,
    // the spec's scalar AVG + NOT EXISTS form verbatim, with the AVG
    // comparison cross-multiplied to exact integers on both sides
    "q227_tpch_q22" ->
      s"""WITH cust AS (
         |  SELECT c_custkey, c_nationkey,
         |         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
         |  FROM customer
         |  WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
         |pos AS (
         |  SELECT CAST(sum(bal_c) AS BIGINT) AS sum_c,
         |         CAST(count(*) AS BIGINT) AS cnt
         |  FROM cust WHERE bal_c > 0)
         |SELECT CAST(c_nationkey AS BIGINT) AS cntrycode,
         |       CAST(count(*) AS BIGINT) AS numcust,
         |       CAST(sum(bal_c) AS BIGINT) AS totacctbal_c
         |FROM cust
         |WHERE bal_c * (SELECT cnt FROM pos) > (SELECT sum_c FROM pos)
         |  AND NOT EXISTS (
         |    SELECT 1 FROM orders WHERE o_custkey = c_custkey
         |      AND o_orderdate >= ${q22Cut.stripPrefix("TIMESTAMP_NTZ ")}::TIMESTAMP)
         |GROUP BY c_nationkey
         |ORDER BY cntrycode""".stripMargin,
    // Q2 stated in the spec's CORRELATED scalar-MIN form — the gated
    // query decorrelates it to a per-part window; the gate proves the
    // equivalence end-to-end
    "q256_tpch_q2" ->
      s"""WITH $psCte,
         |sup AS (
         |  SELECT s_suppkey, s_name, n_name,
         |         CAST(round(s_acctbal * 100) AS BIGINT) AS s_acctbal_c
         |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'EUROPE')
         |SELECT s_acctbal_c, s_name, n_name, p_partkey, s_suppkey,
         |       ps_supplycost_c AS cost_c
         |FROM ps JOIN sup ON ps_suppkey = s_suppkey
         |JOIN part ON ps_partkey = p_partkey
         |WHERE p_size = 15 AND p_type = 'STANDARD'
         |  AND ps_supplycost_c = (
         |    SELECT min(ps2.ps_supplycost_c)
         |    FROM ps ps2 JOIN sup s2 ON ps2.ps_suppkey = s2.s_suppkey
         |    WHERE ps2.ps_partkey = ps.ps_partkey)
         |ORDER BY s_acctbal_c DESC, n_name, s_name, p_partkey, s_suppkey
         |LIMIT 100""".stripMargin,
    "q257_tpch_q9" ->
      s"""WITH $psCte,
         |li AS (
         |  SELECT l_orderkey, l_partkey, l_suppkey,
         |         CAST(round(l_quantity) AS BIGINT) AS qty,
         |         CAST(round(l_extendedprice * 100) AS BIGINT)
         |           * (10000 - CAST(round(l_discount * 10000) AS BIGINT))
         |           // 10000 AS disc_price_c
         |  FROM lineitem JOIN part ON p_partkey = l_partkey
         |  WHERE p_name LIKE '%red%')
         |SELECT n_name AS nation,
         |       CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |       CAST(sum(disc_price_c - ps_supplycost_c * qty) AS BIGINT)
         |         AS sum_profit_c
         |FROM li
         |JOIN ps ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
         |JOIN supplier ON s_suppkey = l_suppkey
         |JOIN nation ON n_nationkey = s_nationkey
         |JOIN orders ON o_orderkey = l_orderkey
         |GROUP BY 1, 2
         |ORDER BY nation, o_year DESC""".stripMargin,
    "q258_tpch_q11" ->
      s"""WITH $psCte,
         |sup AS (
         |  SELECT s_suppkey FROM supplier
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'EUROPE'),
         |held AS (
         |  SELECT ps_partkey, ps_supplycost_c * ps_availqty AS value_c
         |  FROM ps JOIN sup ON ps_suppkey = s_suppkey),
         |per AS (SELECT ps_partkey, sum(value_c) AS v FROM held GROUP BY 1),
         |tot AS (SELECT sum(v) AS t, count(*) AS np FROM per)
         |SELECT ps_partkey, CAST(v AS BIGINT) AS value_c
         |FROM per, tot WHERE v * np > 2 * t
         |ORDER BY value_c DESC, ps_partkey""".stripMargin,
    "q259_tpch_q16" ->
      s"""WITH $psCte
         |SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
         |       CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
         |FROM ps JOIN part ON p_partkey = ps_partkey
         |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
         |  AND p_size IN (1, 9, 15, 22, 30, 38, 44, 50)
         |  AND ps_suppkey NOT IN
         |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         |GROUP BY p_brand, p_type, p_size
         |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    // Q20 stated in the spec's nested IN-chain with the correlated
    // per-pair shipped-qty subquery — the gated query decorrelates it
    // to one aggregate + inner join; the gate proves the equivalence
    "q260_tpch_q20" ->
      s"""WITH $psCte
         |SELECT s_suppkey, s_name
         |FROM supplier
         |WHERE s_nationkey IN (
         |    SELECT n_nationkey FROM nation
         |    JOIN region ON n_regionkey = r_regionkey
         |    WHERE r_name = 'ASIA')
         |  AND s_suppkey IN (
         |    SELECT ps_suppkey FROM ps
         |    WHERE ps_partkey IN
         |        (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
         |      AND ps_availqty * 2 > (
         |        SELECT sum(CAST(round(l_quantity) AS BIGINT))
         |        FROM lineitem
         |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
         |          AND l_shipdate >= ${q20Lo.stripPrefix("TIMESTAMP_NTZ ")}::TIMESTAMP
         |          AND l_shipdate < ${q20Hi.stripPrefix("TIMESTAMP_NTZ ")}::TIMESTAMP))
         |ORDER BY s_name, s_suppkey""".stripMargin,
    "q204_tpch_q3" ->
      s"""WITH li AS (
         |  SELECT l_orderkey,
         |         CAST(round(l_extendedprice * 100) AS BIGINT)
         |           * (10000 - CAST(round(l_discount * 10000) AS BIGINT)) // 10000
         |           AS disc_price_c
         |  FROM lineitem
         |  WHERE l_shipdate > ${q3DateTs.stripPrefix("TIMESTAMP_NTZ ")}::TIMESTAMP),
         |o AS (
         |  SELECT o_orderkey, o_custkey,
         |         CAST(floor(epoch(o_orderdate)) AS BIGINT) AS order_es
         |  FROM orders
         |  WHERE o_orderdate < ${q3DateTs.stripPrefix("TIMESTAMP_NTZ ")}::TIMESTAMP),
         |c AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
         |SELECT o_orderkey, CAST(sum(disc_price_c) AS BIGINT) AS revenue_c,
         |       order_es
         |FROM o JOIN c ON o_custkey = c_custkey
         |       JOIN li ON o_orderkey = l_orderkey
         |GROUP BY o_orderkey, order_es
         |ORDER BY revenue_c DESC, order_es ASC, o_orderkey ASC
         |LIMIT 10""".stripMargin)
}
