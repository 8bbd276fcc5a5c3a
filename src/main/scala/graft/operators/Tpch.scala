package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The remaining TPC-H query shapes (reference: the public TPC-H spec;
  * adapted to the synthetic schema, which has no partsupp table and no
  * comment/commit/receipt columns — each adaptation keeps the query's
  * canonical PLAN shape, which is the thing being tested).
  *
  * Together with q1_agg (Q1) and the shapes in Analytics
  * (Q3/Q5/Q12/Q16/Q17/Q18/Q21/Q22) and Aggregates (Q19), this completes all
  * 22 TPC-H query shapes, each hash-checked against DuckDB running the
  * literal form (correlated subqueries stated as subqueries — the oracle
  * decorrelates its way, we decorrelate ours).
  *
  * partsupp surrogate: `DISTINCT (l_partkey, l_suppkey)` from lineitem —
  * "the suppliers that supplied this part". At scale that distinct is a
  * map-side-combining hash aggregate at pair grain, the same cost class as
  * scanning a real partsupp.
  */
object Tpch {

  private def dsum(c: Column) = sum(c.cast(DecimalType(18, 6))).cast("double")
  private def rev: Column = col("l_extendedprice") * (lit(1) - col("l_discount"))

  /** TPC-H Q1 in its FULL literal form — the shipdate predicate and all
    * eight aggregates, including the three averages (q1_agg keeps the
    * historical simplified shape; this row closes the "is Q1 literally
    * there" question). Averages are DOUBLE divisions of an exact
    * decimal-sum by an exact count — two correctly-rounded IEEE ops,
    * deterministic on both engines with NO rounding contract (the
    * ranking-family rule bans rounded ratios; unrounded exact-over-exact
    * needs no ban). One 2-phase hash aggregate over the filtered scan;
    * the filter reaches the parquet scan as a pushed predicate.
    */
  val tpchQ1 = Q(
    "q_tpch_q1",
    (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-12-01").cast("timestamp") - expr("INTERVAL 90 DAYS"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(rev).as("sum_disc_price"),
          dsum(rev * (lit(1) + col("l_tax"))).as("sum_charge"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
          (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
    """SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(sum(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
      |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_qty,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_price,
      |  CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-12-01' - INTERVAL 90 DAY
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )

  /** TPC-H Q2 shape (min-cost supplier): the correlated-min + join-back
    * pattern. The oracle states "the supplier whose acctbal equals the
    * minimum over this part's European suppliers" as a correlated subquery;
    * the engine computes the per-part min ONCE as an aggregate over the
    * candidate relation and joins it back — the candidate relation is built
    * a single time and feeds both sides, so the "subquery" costs one extra
    * small-agg broadcast, never a per-row re-scan. Dims (filtered part,
    * region-filtered supplier) broadcast onto the deduped pair relation.
    */
  val tpchQ2 = Q(
    "q_tpch_q2",
    (s, d) => {
      val eu = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_acctbal"), col("s_name"), col("n_name"))
      val p = Tables.part(s, d)
        .filter(col("p_size") === 15 && col("p_type") === "SMALL")
        .select(col("p_partkey"))
      // the selective part filter goes BELOW the pair dedup: the broadcast
      // join prunes the fact rows before the distinct's shuffle, so the
      // exchange carries only the ~1/200 surviving pairs (dedup grain is
      // unchanged — p_partkey is the join key itself). The previous form
      // deduped ALL (part, supp) pairs first: a full-corpus shuffle at
      // 100 TB for rows the next join would discard.
      val cand = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .distinct()
        .join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
      val minb = cand.groupBy(col("p_partkey").as("m_partkey"))
        .agg(min(col("s_acctbal")).as("min_bal"))
      cand.join(broadcast(minb),
          col("p_partkey") === col("m_partkey") && col("s_acctbal") === col("min_bal"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    },
    """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      |SELECT s_acctbal, s_name, n_name, p_partkey
      |FROM part, ps, supplier, nation, region
      |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      |  AND p_size = 15 AND p_type = 'SMALL'
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'EUROPE'
      |  AND s_acctbal = (
      |    SELECT min(s2.s_acctbal) FROM ps ps2, supplier s2, nation n2, region r2
      |    WHERE ps2.l_partkey = p_partkey AND s2.s_suppkey = ps2.l_suppkey
      |      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      |      AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin
  )

  /** TPC-H Q4 shape (order-priority checking): EXISTS → LEFT SEMI join. The
    * quantifier ("some line shipped after the order date" — the synthetic
    * schema's stand-in for commit < receipt) becomes a semi-join on the
    * order key with the inequality as a residual probe condition: lineitem
    * is never widened, each order emits at most once, and the date window
    * pushes to the orders scan. The oracle runs the literal EXISTS.
    */
  val tpchQ4 = Q(
    "q_tpch_q4",
    (s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
      val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
      o.join(l, o("o_orderkey") === l("l_orderkey") &&
            l("l_shipdate") > o("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },
    """SELECT o_orderpriority, count(*) AS order_count FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      |  AND o_orderdate < TIMESTAMP '1997-10-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY 1 ORDER BY 1""".stripMargin
  )

  /** TPC-H Q6 shape (forecast-revenue change): the pure pushdown showcase —
    * every predicate (date range, discount band, quantity cap) reaches the
    * parquet scan as a pushed filter, the projection prunes to two columns,
    * and the whole query is one scan + one partial-aggregated scalar. The
    * query every engine should run at I/O speed.
    */
  val tpchQ6 = Q(
    "q_tpch_q6",
    (s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(dsum(col("l_extendedprice") * col("l_discount")), 6).as("revenue"))
    },
    """SELECT round(CAST(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE), 6) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin
  )

  /** TPC-H Q7 shape (volume shipping): the two-fact join with BOTH join
    * graph legs carrying a geography attribute — supplier side from the
    * lineitem leg, customer side through orders. Region pair rather than
    * Q7's nation pair (the sf0.001 fixture has only 10 suppliers, so any
    * single nation pair can be empty; the two-sided pair-predicate shape is
    * identical). The pair filter runs at the broadcast probes; the only
    * fact-fact shuffle is lineitem ⋈ orders on the order key. Year comes
    * off l_shipdate row-locally.
    */
  val tpchQ7 = Q(
    "q_tpch_q7",
    (s, d) => {
      val supR = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d).select(col("n_nationkey").as("sn_key"), col("n_regionkey").as("sr_key"))),
          col("s_nationkey") === col("sn_key"))
        .join(broadcast(Tables.region(s, d).select(col("r_regionkey").as("sr_rkey"), col("r_name").as("supp_region"))),
          col("sr_key") === col("sr_rkey"))
        .select(col("s_suppkey"), col("supp_region"))
      val custR = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d).select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cr_key"))),
          col("c_nationkey") === col("cn_key"))
        .join(broadcast(Tables.region(s, d).select(col("r_regionkey").as("cr_rkey"), col("r_name").as("cust_region"))),
          col("cr_key") === col("cr_rkey"))
        .select(col("c_custkey"), col("cust_region"))
      // The pair predicate only ever accepts AMERICA/ASIA on either side, so
      // both broadcast dims pre-filter to those regions and probe BELOW the
      // fact-fact exchange: lineitem's shuffle carries only qualifying-
      // region suppliers' lines (~2/5) and orders' only qualifying-region
      // customers' orders (~2/5); the cross-side pair filter then runs on
      // the join output as before (the q_tpch_q3 broadcast-below-shuffle
      // argument, applied to both legs).
      val regions = Seq("AMERICA", "ASIA")
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"), rev.as("volume"))
        .join(broadcast(supR.filter(col("supp_region").isin(regions: _*))),
          col("l_suppkey") === col("s_suppkey"))
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        .join(broadcast(custR.filter(col("cust_region").isin(regions: _*))),
          col("o_custkey") === col("c_custkey"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .filter((col("supp_region") === "AMERICA" && col("cust_region") === "ASIA") ||
          (col("supp_region") === "ASIA" && col("cust_region") === "AMERICA"))
        .groupBy(col("supp_region"), col("cust_region"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(dsum(col("volume")).as("revenue"))
        .orderBy(col("supp_region"), col("cust_region"), col("l_year"))
    },
    """SELECT supp_region, cust_region, l_year, CAST(sum(volume) AS DOUBLE) AS revenue FROM (
      |  SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
      |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume
      |  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
      |  JOIN orders ON o_orderkey = l_orderkey JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
      |  JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      |  WHERE ((r1.r_name = 'AMERICA' AND r2.r_name = 'ASIA')
      |      OR (r1.r_name = 'ASIA' AND r2.r_name = 'AMERICA'))
      |    AND l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1998-01-01')
      |GROUP BY 1,2,3 ORDER BY 1,2,3""".stripMargin
  )

  /** TPC-H Q8 shape (national market share): conditional share — the
    * numerator is a CASE inside the SAME aggregate as the denominator (one
    * pass, never two scans). Six-table join: customer side reduces to a
    * region-filtered broadcast, part filter broadcasts onto lineitem, the
    * one fact-fact shuffle is lineitem ⋈ orders. Division in double AFTER
    * both decimal sums, rounded once — the cross-engine division contract.
    */
  val tpchQ8 = Q(
    "q_tpch_q8",
    (s, d) => {
      val amCust = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"))
      val supN = Tables.supplier(s, d)
        .join(Tables.nation(s, d).select(col("n_nationkey").as("sn_key"), col("n_name").as("nation")),
          col("s_nationkey") === col("sn_key"))
        .select(col("s_suppkey"), col("nation"))
      val p = Tables.part(s, d).filter(col("p_type") === "ECONOMY").select(col("p_partkey"))
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          rev.cast(DecimalType(18, 6)).as("volume"))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(amCust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(round(
          sum(when(col("nation") === "NATION_1", col("volume")).otherwise(lit(0))).cast("double") /
            sum(col("volume")).cast("double"), 6).as("mkt_share"))
        .orderBy(col("o_year"))
    },
    """SELECT o_year,
      |  round(CAST(sum(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END) AS DOUBLE)
      |      / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
      |FROM (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume,
      |    n2.n_name AS nation
      |  FROM part JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01'
      |    AND o_orderdate < TIMESTAMP '1998-01-01')
      |GROUP BY o_year ORDER BY o_year""".stripMargin
  )

  /** TPC-H Q9 shape (product-type profit): profit per (supplier nation,
    * order year) over a name-pattern part filter. supplycost surrogate:
    * 0.5 * p_retailprice (the schema has no partsupp) — the amount
    * expression keeps Q9's exact form `rev - cost * qty`, computed in
    * double and cast to decimal ONCE, row-locally, before the aggregate.
    * The amount needs per-line (retailprice, qty, rev) together, so the
    * part join can't pre-reduce — and a %pattern% filter keeps ~1/25 of a
    * table that is fact-sized at 100 TB, so it carries NO broadcast hint:
    * statically it's a shuffled equi-join on l_partkey, and AQE is free to
    * broadcast when the filtered side measures small (as it does at test
    * SF). lineitem ⋈ orders is the other fact shuffle.
    */
  val tpchQ9 = Q(
    "q_tpch_q9",
    (s, d) => {
      val p = Tables.part(s, d)
        .filter(col("p_name").like("%bolt%"))
        .select(col("p_partkey"), col("p_retailprice"))
      val supN = Tables.supplier(s, d)
        .join(Tables.nation(s, d).select(col("n_nationkey").as("sn_key"), col("n_name").as("nation")),
          col("s_nationkey") === col("sn_key"))
        .select(col("s_suppkey"), col("nation"))
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate"))
      Tables.lineitem(s, d)
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
        .select(col("nation"), year(col("o_orderdate")).cast("long").as("o_year"),
          (rev - lit(0.5) * col("p_retailprice") * col("l_quantity"))
            .cast(DecimalType(18, 6)).as("amount"))
        .groupBy(col("nation"), col("o_year"))
        .agg(sum(col("amount")).cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },
    """SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit FROM (
      |  SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |    CAST(l_extendedprice * (1 - l_discount) - 0.5 * p_retailprice * l_quantity
      |         AS DECIMAL(18,6)) AS amount
      |  FROM part JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey JOIN orders ON o_orderkey = l_orderkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE p_name LIKE '%bolt%')
      |GROUP BY 1,2 ORDER BY nation, o_year DESC""".stripMargin
  )

  /** TPC-H Q10 shape (returned-item reporting): revenue lost to returns per
    * customer in a quarter, top 20. Date filter pushes to the orders scan,
    * returnflag to the lineitem scan; the fact-fact join shuffles once on
    * the order key; customer + nation broadcast onto the aggregate's
    * output side. Top-20 is TakeOrderedAndProject (per-partition heaps).
    */
  val tpchQ10 = Q(
    "q_tpch_q10",
    (s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-10-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), rev.as("r"))
      val cn = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cn), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(dsum(col("r")).as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"), col("c_acctbal"), col("n_name"))
        .orderBy(round(col("revenue"), 6).desc, col("c_custkey"))
        .limit(20)
    },
    """SELECT c_custkey, c_name,
      |  CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS revenue,
      |  c_acctbal, n_name
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1997-10-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01' AND l_returnflag = 'R'
      |GROUP BY 1,2,4,5 ORDER BY round(revenue,6) DESC, c_custkey LIMIT 20""".stripMargin
  )

  /** TPC-H Q11 shape (important stock): grouped value with HAVING above a
    * scalar-subquery fraction of the total. The nation-filtered fact
    * pre-aggregates to part grain BEFORE touching the part table — at 100 TB
    * part is itself fact-sized, so the join runs at part grain (one reduced
    * shuffle), never as a broadcast of an unfiltered dimension. Quantity
    * sums are integer-exact in double, so `0.5 * retailprice * qty_sum` is
    * bit-identical on both engines before the single decimal cast. The
    * total is a 1-row aggregate broadcast back as a cross join (the
    * sanctioned 1-row crossJoin shape); the threshold comparison runs in
    * double over identical decimals, so the cut is bit-deterministic.
    * Inventory-value surrogate: 0.5 * p_retailprice * shipped quantity.
    */
  val tpchQ11 = Q(
    "q_tpch_q11",
    (s, d) => {
      val supN = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d).filter(col("n_regionkey") === 3)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val perPart = Tables.lineitem(s, d)
        .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey").as("ps_partkey"))
        .agg(sum(col("l_quantity")).as("qty_sum"))
      val vals = perPart
        .join(Tables.part(s, d).select(col("p_partkey"), col("p_retailprice")),
          col("ps_partkey") === col("p_partkey"))
        .select(col("ps_partkey"),
          (lit(0.5) * col("p_retailprice") * col("qty_sum"))
            .cast(DecimalType(18, 6)).as("value_dec"))
      val total = vals.agg(sum(col("value_dec")).cast("double").as("total_val"))
      vals.crossJoin(broadcast(total))
        .filter(col("value_dec").cast("double") > col("total_val") * 0.001)
        .select(col("ps_partkey"), col("value_dec").cast("double").as("value"))
        .orderBy(round(col("value"), 6).desc, col("ps_partkey"))
    },
    """WITH vals AS (
      |  SELECT ps_partkey,
      |         CAST(0.5 * p_retailprice * qty_sum AS DECIMAL(18,6)) AS value_dec
      |  FROM (
      |    SELECT l_partkey AS ps_partkey, sum(l_quantity) AS qty_sum
      |    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |    JOIN nation ON s_nationkey = n_nationkey
      |    WHERE n_regionkey = 3 GROUP BY 1)
      |  JOIN part ON ps_partkey = p_partkey)
      |SELECT ps_partkey, CAST(value_dec AS DOUBLE) AS value FROM vals
      |WHERE CAST(value_dec AS DOUBLE) > (SELECT CAST(sum(value_dec) AS DOUBLE) * 0.001 FROM vals)
      |ORDER BY round(CAST(value_dec AS DOUBLE), 6) DESC, ps_partkey""".stripMargin
  )

  /** TPC-H Q13 shape (customer distribution): the outer-join double
    * aggregate. LEFT OUTER customer → filtered orders keeps zero-order
    * customers (their count is 0, not absent); the filter lives in the JOIN
    * condition, not WHERE (the classic Q13 trap — a WHERE would turn the
    * outer join inner). First aggregate at customer grain reuses the join's
    * hash partitioning on c_custkey; the second (histogram of counts) is a
    * tiny shuffle.
    */
  val tpchQ13 = Q(
    "q_tpch_q13",
    (s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"))
      Tables.customer(s, d).select(col("c_custkey"))
        .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin
  )

  /** TPC-H Q14 shape (promotion effect): the conditional ratio — promo
    * revenue over total revenue, CASE in the numerator of the SAME aggregate
    * as the denominator. The month-windowed fact pre-aggregates to part
    * grain first (decimal revenue per part — decimal addition is
    * associative, so regrouping is exact), THEN joins part at part grain:
    * at 100 TB part is fact-sized, and this shape joins it against an
    * already-reduced relation instead of broadcasting an unfiltered
    * dimension onto every line.
    */
  val tpchQ14 = Q(
    "q_tpch_q14",
    (s, d) => {
      val perPart = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
        .groupBy(col("l_partkey"))
        .agg(sum(rev.cast(DecimalType(18, 6))).as("rev_dec"))
      perPart
        .join(Tables.part(s, d).select(col("p_partkey"), col("p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100.0) *
          sum(when(col("p_type") === "PROMO", col("rev_dec")).otherwise(lit(0))).cast("double") /
          sum(col("rev_dec")).cast("double"), 6).as("promo_revenue"))
    },
    """WITH perpart AS (
      |  SELECT l_partkey,
      |         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS rev_dec
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      |    AND l_shipdate < TIMESTAMP '1997-10-01'
      |  GROUP BY 1)
      |SELECT round(100.0 *
      |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_dec ELSE 0 END) AS DOUBLE)
      |  / CAST(sum(rev_dec) AS DOUBLE), 6) AS promo_revenue
      |FROM perpart JOIN part ON l_partkey = p_partkey""".stripMargin
  )

  /** TPC-H Q15 shape (top supplier): aggregate feeding a max-equality scalar
    * join — the "view + scalar subquery" pattern. Per-supplier revenue is
    * kept as EXACT decimal for the max comparison (cast to double only at
    * output), so the winner is bit-deterministic on both engines. The rev
    * relation feeds both the scalar max and the final join; exchange reuse
    * demonstrably fails here (the join branch acquires an isnotnull on its
    * equality key, de-canonicalizing the two aggregate subplans → lineitem
    * scanned twice), so revs is localCheckpointed — the repo convention for
    * multi-consumer mid-plan relations where reuse fails. It materializes
    * at SUPPLIER grain (bounded at any corpus scale); lineitem is scanned
    * once (TpchPlanSpec pins it).
    */
  val tpchQ15 = Q(
    "q_tpch_q15",
    (s, d) => {
      val revs = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum(rev.cast(DecimalType(18, 6))).as("total_rev_dec"))
        .localCheckpoint()
      val mx = revs.agg(max(col("total_rev_dec")).as("max_rev"))
      Tables.supplier(s, d)
        .join(revs, col("s_suppkey") === col("supplier_no"))
        .crossJoin(broadcast(mx))
        .filter(col("total_rev_dec") === col("max_rev"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev_dec").cast("double").as("total_revenue"))
        .orderBy(col("s_suppkey"))
    },
    """WITH rev AS (
      |  SELECT l_suppkey AS supplier_no,
      |         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS total_rev_dec
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, CAST(total_rev_dec AS DOUBLE) AS total_revenue
      |FROM supplier JOIN rev ON s_suppkey = supplier_no
      |WHERE total_rev_dec = (SELECT max(total_rev_dec) FROM rev)
      |ORDER BY s_suppkey""".stripMargin
  )

  /** TPC-H Q20 shape (potential part promotion): the nested IN over a
    * grouped HAVING — "suppliers who moved more than the threshold of some
    * promoted part". The inner relation aggregates lineitem at
    * (suppkey, partkey) grain (map-side combine bounds hot pairs), HAVING
    * cuts it small, and the outer IN becomes a LEFT SEMI against the
    * distinct supplier keys; the nation filter broadcasts. Quantities are
    * integer-valued doubles, so the HAVING sum is exact.
    */
  val tpchQ20 = Q(
    "q_tpch_q20",
    (s, d) => {
      val p = Tables.part(s, d).filter(col("p_name").like("red%")).select(col("p_partkey"))
      val movers = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(col("l_quantity")).as("qty"))
        .filter(col("qty") > 50)
        .select(col("l_suppkey"))
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d).filter(col("n_regionkey") === 3)),
          col("s_nationkey") === col("n_nationkey"))
        .join(movers, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_name"), col("s_acctbal"))
        .orderBy(col("s_name"))
    },
    """SELECT s_name, s_acctbal FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_regionkey = 3
      |  AND s_suppkey IN (
      |    SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
      |    WHERE p_name LIKE 'red%'
      |      AND l_shipdate >= TIMESTAMP '1997-01-01'
      |      AND l_shipdate < TIMESTAMP '1998-01-01'
      |    GROUP BY l_suppkey, l_partkey HAVING sum(l_quantity) > 50)
      |ORDER BY s_name""".stripMargin
  )

  val all: Seq[Q] = Seq(tpchQ1, tpchQ2, tpchQ4, tpchQ6, tpchQ7, tpchQ8, tpchQ9,
    tpchQ10, tpchQ11, tpchQ13, tpchQ14, tpchQ15, tpchQ20)
}
