package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import scala.jdk.CollectionConverters._

/** Star-schema extension queries (SURVEY §2.12 "extension queries"): the
  * join / window / rollup surface the reference lacks (SURVEY §2.6, §2.7
  * — "none in the reference"), expressed Spark-first over the TPC-H-ish
  * test tables.
  *
  * Scale design (100 TB):
  *  - the bounded dims (region/nation — fixed 25-row enums) are broadcast
  *    explicitly; the SCALABLE dims (customer/supplier/part) carry no
  *    hint — parquet size stats auto-broadcast them below the threshold,
  *    and AQE demotes to a shuffled join when a big-dim tier outgrows it
  *    (a forced hint would instead OOM the driver at 100 TB dim sizes;
  *    BigDimPlanSpec pins both directions);
  *  - fact-fact joins (lineitem ⋈ orders) shuffle on the join key once and
  *    group on the same key where possible, so the exchange is reused;
  *  - top-k goes through TakeOrderedAndProject (no global sort);
  *  - money aggregates cast to DECIMAL before SUM: exact, order-independent
  *    addition — required for oracle parity AND the right answer at scale
  *    (fp sums drift with partitioning).
  */
object StarQueries {

  val all: Seq[Q] = Seq(
    // --- TPC-H Q1-style scan-heavy aggregation ---------------------------
    Q(
      "q1_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val cnt = count(lit(1))
      val sumQty = sum(col("l_quantity").cast("decimal(18,2)"))
      Tables.lineitem(s, d)
        .where(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sumQty.cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("sum_disc_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))).cast("decimal(18,6)")).cast("double")
            .as("sum_charge"),
          (sumQty.cast("double") / cnt).as("avg_qty"),
          (sum(col("l_discount").cast("decimal(18,2)")).cast("double") / cnt)
            .as("avg_disc"),
          cnt.as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // --- TPC-H Q3-style: fact-fact-dim join + top-k revenue --------------
    Q(
      "q3_shipping_priority",
      """SELECT o_orderkey,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  CAST(o_orderdate AS DATE) AS order_date, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
        |GROUP BY o_orderkey, order_date, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey NULLS FIRST
        |LIMIT 10""".stripMargin
    ) { (s, d) =>
      // customer joins on parquet size stats + AQE (no forced hint):
      // under the broadcast threshold the lineitem ⋈ orders shuffle stays
      // the only exchange; past it (big-dim tier) AQE demotes to a
      // shuffled join instead of a multi-GB driver broadcast.
      Tables.lineitem(s, d)
        .where(col("l_shipdate") > lit("1996-03-15 00:00:00").cast("timestamp"))
        .join(
          Tables.orders(s, d)
            .where(col("o_orderdate") < lit("1998-03-15 00:00:00").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(
          Tables.customer(s, d)
            .where(col("c_mktsegment") === "BUILDING"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(
          col("o_orderkey"),
          to_date(col("o_orderdate")).as("order_date"),
          col("o_orderpriority"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
        .select(col("o_orderkey"), col("revenue"), col("order_date"),
          col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },

    // --- TPC-H Q5-style: 6-way join, dims broadcast ----------------------
    Q(
      "q5_local_supplier_volume",
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val nationAsia = broadcast(
        Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d).where(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey")))
      Tables.lineitem(s, d)
        .join(
          Tables.orders(s, d)
            .where(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp")
              && col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey")
            && col("c_nationkey") === col("s_nationkey"))
        .join(nationAsia, col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // --- left-semi: customers that HAVE orders (EXISTS) ------------------
    Q(
      "q_semi_active_customers",
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    },

    // --- left-anti: customers with NO big orders (NOT EXISTS) ------------
    Q(
      "q_anti_inactive_customers",
      """SELECT c_custkey, c_name
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 300000)
        |ORDER BY c_custkey NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).where(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // --- window: top-2 orders per customer by totalprice -----------------
    Q(
      "q_window_top_orders",
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders)
        |WHERE rn <= 2
        |ORDER BY o_custkey NULLS FIRST, rn""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).cast("long").as("rn"))
        .where(col("rn") <= 2)
        .orderBy(col("o_custkey"), col("rn"))
    },

    // --- native physical top-k per group ---------------------------------
    // Same semantics as the window formulation above, executed by the
    // custom two-phase bounded-heap operator ([[graft.plans
    // .TopKPerGroupNode]] — see its scaladoc for the honest comparison
    // against Spark's own WindowGroupLimit plan: equal shuffle volume,
    // but heap SELECTION in O(n log k) instead of full per-partition
    // SORTS on both sides of the exchange). The oracle states the
    // row_number formulation; result parity IS the operator's
    // correctness certificate.
    Q(
      "q_topk_per_group_native",
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_extendedprice DESC, l_linenumber) AS rn
        |  FROM lineitem)
        |WHERE rn <= 2
        |ORDER BY l_orderkey NULLS FIRST, l_extendedprice DESC,
        |  l_linenumber NULLS FIRST""".stripMargin
    ) { (s, d) =>
      graft.operators.TopK.perGroup(
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice")),
        2,
        Seq("l_orderkey"),
        Seq(graft.operators.TopK.desc("l_extendedprice"),
          graft.operators.TopK.asc("l_linenumber")))
        .orderBy(col("l_orderkey"), col("l_extendedprice").desc,
          col("l_linenumber"))
    },

    // --- window: running revenue per customer over time ------------------
    Q(
      "q_window_running_spend",
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_spend
        |FROM orders
        |ORDER BY o_custkey NULLS FIRST, o_orderkey NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
            .cast("double").as("running_spend"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // --- rollup: hierarchical counts (grouping-sets family) --------------
    Q(
      "q_rollup_order_status",
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // --- union all across filtered branches ------------------------------
    Q(
      "q_union_order_events",
      """SELECT kind, k FROM (
        |  SELECT 'high_value' AS kind, o_orderkey AS k FROM orders
        |    WHERE o_totalprice > 400000
        |  UNION ALL
        |  SELECT 'urgent' AS kind, o_orderkey AS k FROM orders
        |    WHERE o_orderpriority = '1-URGENT')
        |ORDER BY kind NULLS FIRST, k NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val o = Tables.orders(s, d)
      o.where(col("o_totalprice") > 400000)
        .select(lit("high_value").as("kind"), col("o_orderkey").as("k"))
        .unionAll(
          o.where(col("o_orderpriority") === "1-URGENT")
            .select(lit("urgent").as("kind"), col("o_orderkey").as("k")))
        .orderBy(col("kind"), col("k"))
    },

    // --- TPC-H Q4-style: EXISTS + count by priority ----------------------
    Q(
      "q4_order_priority",
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val o = Tables.orders(s, d)
        .where(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp")
          && col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
      val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
      o.join(l, col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },

    // --- TPC-H Q18-style: HAVING on an aggregate over a join -------------
    Q(
      "q18_large_orders",
      """SELECT c_custkey, o_orderkey, total_qty FROM (
        |  SELECT c_custkey, o_orderkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |  FROM customer JOIN orders ON c_custkey = o_custkey
        |    JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY c_custkey, o_orderkey)
        |WHERE total_qty > 250
        |ORDER BY total_qty DESC, o_orderkey NULLS FIRST""".stripMargin
    ) { (s, d) =>
      // aggregate lineitem by orderkey FIRST, then join: the heavy table
      // shrinks before any join shuffle (same rewrite Catalyst cannot do
      // automatically because the HAVING references the joined grouping)
      val qtyPerOrder = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("total_qty"))
        .where(col("total_qty") > 250)
      qtyPerOrder
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("o_orderkey"), col("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
    },

    // --- TPC-H Q17-style: correlated scalar subquery (decorrelated by ---
    // Catalyst into an aggregate+join), via the spark.sql entry point
    Q(
      "q17_small_quantity_revenue",
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / 7.0 AS avg_yearly,
        |  COUNT(*) AS n_lines
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_type = 'STANDARD'
        |  AND l.l_quantity < (
        |    SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |                  / COUNT(*))
        |    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin
    ) { (s, d) =>
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
      Tables.part(s, d).createOrReplaceTempView("part_v")
      s.sql(
        """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
          |    / 7.0 AS avg_yearly,
          |  COUNT(*) AS n_lines
          |FROM lineitem_v l JOIN part_v p ON p.p_partkey = l.l_partkey
          |WHERE p.p_type = 'STANDARD'
          |  AND l.l_quantity < (
          |    SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
          |                  / COUNT(*))
          |    FROM lineitem_v l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin)
    },

    // --- global scalar subquery: orders above the average total ----------
    Q(
      "q_above_avg_orders",
      """SELECT o_orderpriority, COUNT(*) AS n
        |FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         / COUNT(*) FROM orders)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT o_orderpriority, COUNT(*) AS n
          |FROM orders_v
          |WHERE o_totalprice > (
          |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |         / COUNT(*) FROM orders_v)
          |GROUP BY o_orderpriority
          |ORDER BY o_orderpriority NULLS FIRST""".stripMargin)
    },

    // --- part/supplier join with numeric predicate -----------------------
    Q(
      "q_parts_by_size",
      """SELECT p_brand, p_size, COUNT(DISTINCT p_partkey) AS n_parts,
        |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_retail
        |FROM part
        |WHERE p_size >= 10 AND p_type LIKE 'STA%'
        |GROUP BY p_brand, p_size
        |ORDER BY p_brand NULLS FIRST, p_size NULLS FIRST""".stripMargin
    ) { (s, d) =>
      Tables.part(s, d)
        .where(col("p_size") >= 10 && col("p_type").like("STA%"))
        .groupBy(col("p_brand"), col("p_size"))
        .agg(
          count_distinct(col("p_partkey")).as("n_parts"),
          sum(col("p_retailprice").cast("decimal(18,2)")).cast("double")
            .as("total_retail"))
        .orderBy(col("p_brand"), col("p_size"))
    },

    // --- Bloom-pruned fact join (graft.operators.BloomPrune) ------------
    // A selective dimension slice (high-balance suppliers) joined to the
    // fact with the fact side bloom-pruned BEFORE its exchange. The
    // oracle is the PLAIN join — bloom pruning admits false positives
    // only, so the result is provably identical while the fact shuffle
    // shrinks to roughly the selectivity of the slice (BloomPruneSpec
    // covers the identity + pruning-rate properties at the operator
    // level; this entry proves it end-to-end against the oracle).
    Q(
      "q_bloom_pruned_join",
      """SELECT s.s_suppkey, s.s_name,
        |  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
        |        AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |WHERE s.s_acctbal > 4500.0
        |GROUP BY s.s_suppkey, s.s_name
        |ORDER BY s_suppkey NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val richSuppliers = Tables.supplier(s, d)
        .where(col("s_acctbal") > 4500.0)
      // expectedItems sized to the key side (~half the supplier table;
      // suppliers are 0.01% of rows at any SF) — a bloom built for the
      // 1M-item default is 2000x oversized here, and the oversized
      // bitset is what the probe walks per fact row
      graft.operators.BloomPrune.prunedJoin(
          Tables.lineitem(s, d), richSuppliers, "l_suppkey", "s_suppkey",
          expectedItems = 65536L)
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("s_suppkey"))
    },

    // --- SCD2 dimension-history merge (graft.operators.Scd2) ------------
    // Deterministic snapshot + update batch built from `customer`: keys
    // divisible by 7 change segment, keys divisible by 11 (and not 7)
    // send a no-op update, everyone else is untouched. The oracle
    // re-derives the full post-merge history — closed old rows, new open
    // rows, pass-throughs — from the same rules.
    Q(
      "q_scd2_history",
      """WITH base AS (SELECT c_custkey, c_mktsegment, c_nationkey
        |              FROM customer)
        |SELECT c_custkey, c_mktsegment, c_nationkey,
        |       valid_from, valid_to FROM (
        |  -- changed keys: original row closed at the batch ts
        |  SELECT c_custkey, c_mktsegment, c_nationkey,
        |    TIMESTAMP '2025-01-01 00:00:00' AS valid_from,
        |    TIMESTAMP '2025-02-01 00:00:00' AS valid_to
        |  FROM base WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  -- changed keys: new open row with the updated segment
        |  SELECT c_custkey, c_mktsegment || '_v2', c_nationkey,
        |    TIMESTAMP '2025-02-01 00:00:00', NULL
        |  FROM base WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  -- no-op updates and untouched keys pass through open
        |  SELECT c_custkey, c_mktsegment, c_nationkey,
        |    TIMESTAMP '2025-01-01 00:00:00', NULL
        |  FROM base WHERE c_custkey % 7 <> 0)
        |ORDER BY c_custkey NULLS FIRST, valid_from NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val base = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"))
      val dim = base
        .withColumn("valid_from", lit("2025-01-01 00:00:00").cast("timestamp"))
        .withColumn("valid_to", lit(null).cast("timestamp"))
      val updates = base
        .where(pmod(col("c_custkey"), lit(7)) === 0
          || pmod(col("c_custkey"), lit(11)) === 0)
        .select(col("c_custkey"),
          when(pmod(col("c_custkey"), lit(7)) === 0,
            concat(col("c_mktsegment"), lit("_v2")))
            .otherwise(col("c_mktsegment")).as("c_mktsegment"),
          col("c_nationkey"),
          lit("2025-02-01 00:00:00").cast("timestamp").as("effective_ts"))
      graft.operators.Scd2.merge(dim, updates, "c_custkey",
          Seq("c_mktsegment", "c_nationkey"))
        .orderBy(col("c_custkey"), col("valid_from"))
    },

    // --- SCD2 point-in-time read (temporal AS OF) ------------------------
    // The read half of the SCD2 contract: reconstruct the dimension AS IT
    // WAS at any instant from the history q_scd2_history writes —
    // valid_from ≤ t < coalesce(valid_to, ∞), one predicate, no joins.
    // Probed at two instants bracketing the merge (Jan 15: every key
    // still original; Feb 15: the ÷7 keys show their _v2 segment), so
    // both the closed-row and open-row paths are value-checked. The
    // oracle restates the same instants from the generation rules. At
    // scale the predicate prunes on valid_from/valid_to column stats —
    // the reason SCD2 tables sort by validity range.
    Q(
      "q_scd2_asof",
      """WITH base AS (SELECT c_custkey, c_mktsegment FROM customer),
        |pit AS (
        |  SELECT DATE '2025-01-15' AS as_of, c_mktsegment FROM base
        |  UNION ALL
        |  SELECT DATE '2025-02-15',
        |    CASE WHEN c_custkey % 7 = 0 THEN c_mktsegment || '_v2'
        |         ELSE c_mktsegment END
        |  FROM base)
        |SELECT as_of, c_mktsegment,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM pit GROUP BY as_of, c_mktsegment
        |ORDER BY as_of NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val base = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"))
      val dim = base
        .withColumn("valid_from",
          lit("2025-01-01 00:00:00").cast("timestamp"))
        .withColumn("valid_to", lit(null).cast("timestamp"))
      val updates = base
        .where(pmod(col("c_custkey"), lit(7)) === 0
          || pmod(col("c_custkey"), lit(11)) === 0)
        .select(col("c_custkey"),
          when(pmod(col("c_custkey"), lit(7)) === 0,
            concat(col("c_mktsegment"), lit("_v2")))
            .otherwise(col("c_mktsegment")).as("c_mktsegment"),
          col("c_nationkey"),
          lit("2025-02-01 00:00:00").cast("timestamp").as("effective_ts"))
      val hist = graft.operators.Scd2.merge(dim, updates, "c_custkey",
        Seq("c_mktsegment", "c_nationkey"))
      def asOf(t: String) = hist
        .where(col("valid_from") <= lit(t).cast("timestamp")
          && (col("valid_to").isNull
            || col("valid_to") > lit(t).cast("timestamp")))
        .select(lit(t.take(10)).cast("date").as("as_of"),
          col("c_mktsegment"))
      asOf("2025-01-15 00:00:00")
        .unionByName(asOf("2025-02-15 00:00:00"))
        .groupBy(col("as_of"), col("c_mktsegment"))
        .agg(count(lit(1)).cast("long").as("n_customers"))
        .orderBy(col("as_of"), col("c_mktsegment"))
    },

    // --- FIFO allocation via cumulative-interval matching -----------------
    // The classic "hard in SQL" matching problem (FIFO inventory/lot
    // allocation, payment-to-invoice application) solved with the
    // scalable trick: stamp each supply and demand row with its
    // cumulative-quantity interval [cum − q, cum) in arrival order, and
    // FIFO matching becomes INTERVAL INTERSECTION — supply i fills
    // demand j by |[s_lo,s_hi) ∩ [d_lo,d_hi)| — with no iteration, no
    // recursion, no per-row state. Per part: odd line numbers supply,
    // even demand (a deterministic split of real rows), two per-(part,
    // side) windows for the cumsums, one part-keyed self-join whose
    // fanout is O(supply+demand) per part BY CONSTRUCTION (FIFO
    // intervals are sorted and disjoint, so each supply overlaps a
    // contiguous demand run — matched pairs ≈ rows, not rows²).
    // Rolled up to 8 part-hash cells; quantities floored to integers
    // (floor, not cast: DuckDB CAST rounds doubles, Spark truncates).
    Q(
      "q_fifo_allocation",
      """WITH li AS (SELECT l_partkey AS pk, l_orderkey, l_linenumber,
        |    l_shipdate, CAST(FLOOR(l_quantity) AS BIGINT) AS q,
        |    l_linenumber % 2 = 1 AS is_supply
        |  FROM lineitem),
        |r AS (SELECT pk, is_supply, q,
        |    SUM(q) OVER (PARTITION BY pk, is_supply
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber) AS hi
        |  FROM li),
        |rr AS (SELECT pk, is_supply, q, hi, hi - q AS lo FROM r),
        |m AS (SELECT s.pk,
        |    LEAST(s.hi, d.hi) - GREATEST(s.lo, d.lo) AS mq
        |  FROM rr s JOIN rr d ON s.pk = d.pk
        |    AND s.is_supply AND NOT d.is_supply
        |    AND s.lo < d.hi AND d.lo < s.hi),
        |tot AS (SELECT pk,
        |    CAST(SUM(CASE WHEN is_supply THEN q ELSE 0 END) AS BIGINT)
        |      AS supply,
        |    CAST(SUM(CASE WHEN is_supply THEN 0 ELSE q END) AS BIGINT)
        |      AS demand
        |  FROM li GROUP BY pk),
        |mm AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS n_matches,
        |    CAST(SUM(mq) AS BIGINT) AS matched
        |  FROM m GROUP BY pk)
        |SELECT CAST(pk % 8 AS BIGINT) AS cell,
        |  CAST(COUNT(*) AS BIGINT) AS n_parts,
        |  CAST(SUM(COALESCE(n_matches, 0)) AS BIGINT) AS n_matches,
        |  CAST(SUM(COALESCE(matched, 0)) AS BIGINT) AS matched_qty,
        |  CAST(SUM(supply - COALESCE(matched, 0)) AS BIGINT)
        |    AS unmatched_supply,
        |  CAST(SUM(demand - COALESCE(matched, 0)) AS BIGINT)
        |    AS unmatched_demand
        |FROM tot LEFT JOIN mm USING (pk)
        |GROUP BY cell ORDER BY cell NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val li = Tables.lineitem(s, d).select(
        col("l_partkey").as("pk"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"),
        floor(col("l_quantity")).cast("long").as("q"),
        (pmod(col("l_linenumber"), lit(2)) === 1).as("is_supply"))
      val w = Window.partitionBy(col("pk"), col("is_supply"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      val ranged = li
        .withColumn("hi", sum(col("q")).over(w))
        .withColumn("lo", col("hi") - col("q"))
        .select(col("pk"), col("is_supply"), col("q"), col("lo"), col("hi"))
      val sup = ranged.where(col("is_supply"))
        .select(col("pk"), col("lo").as("slo"), col("hi").as("shi"))
      val dem = ranged.where(!col("is_supply"))
        .select(col("pk").as("pk2"), col("lo").as("dlo"),
          col("hi").as("dhi"))
      val m = sup.join(dem, col("pk") === col("pk2")
          && col("slo") < col("dhi") && col("dlo") < col("shi"))
        .select(col("pk"),
          (least(col("shi"), col("dhi"))
            - greatest(col("slo"), col("dlo"))).as("mq"))
        .groupBy(col("pk"))
        .agg(count(lit(1)).cast("long").as("n_matches"),
          sum(col("mq")).cast("long").as("matched"))
      val tot = li.groupBy(col("pk"))
        .agg(sum(when(col("is_supply"), col("q")).otherwise(0L))
          .cast("long").as("supply"),
          sum(when(!col("is_supply"), col("q")).otherwise(0L))
            .cast("long").as("demand"))
      tot.join(m, Seq("pk"), "left")
        .groupBy(pmod(col("pk"), lit(8)).cast("long").as("cell"))
        .agg(count(lit(1)).as("n_parts"),
          sum(coalesce(col("n_matches"), lit(0L))).cast("long")
            .as("n_matches"),
          sum(coalesce(col("matched"), lit(0L))).cast("long")
            .as("matched_qty"),
          sum(col("supply") - coalesce(col("matched"), lit(0L)))
            .cast("long").as("unmatched_supply"),
          sum(col("demand") - coalesce(col("matched"), lit(0L)))
            .cast("long").as("unmatched_demand"))
        .orderBy(col("cell"))
    },

    // --- CDC MERGE-INTO apply (graft.operators.Merge) --------------------
    // The warehouse write primitive as a batch transform: deterministic
    // change batch derived from `customer` (keys ÷7 update acctbal,
    // keys ≡3 mod 11 delete, keys ≡1 mod 13 insert under a shifted key),
    // applied in ONE full-outer equi-join — deletes ride the same join,
    // no second snapshot scan. The oracle restates the same derivation
    // and join. acctbal+100 is exact double arithmetic on both engines.
    Q(
      "q_merge_upsert",
      """WITH base AS (SELECT c_custkey, c_mktsegment, c_acctbal
        |              FROM customer),
        |chg AS (
        |  SELECT c_custkey, 'U' AS op, c_mktsegment,
        |         c_acctbal + 100 AS c_acctbal
        |  FROM base WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  SELECT c_custkey, 'D', c_mktsegment, c_acctbal
        |  FROM base WHERE c_custkey % 7 <> 0 AND c_custkey % 11 = 3
        |  UNION ALL
        |  SELECT c_custkey + 10000000, 'I', c_mktsegment || '_new', 0.5
        |  FROM base WHERE c_custkey % 13 = 1)
        |SELECT COALESCE(b.c_custkey, g.c_custkey) AS c_custkey,
        |  CASE WHEN g.c_custkey IS NOT NULL THEN g.c_mktsegment
        |       ELSE b.c_mktsegment END AS c_mktsegment,
        |  CASE WHEN g.c_custkey IS NOT NULL THEN g.c_acctbal
        |       ELSE b.c_acctbal END AS c_acctbal,
        |  CASE WHEN g.c_custkey IS NULL THEN 'kept'
        |       WHEN b.c_custkey IS NULL THEN 'inserted'
        |       WHEN g.op = 'U' THEN 'updated'
        |       ELSE 'inserted' END AS merge_status
        |FROM base b FULL OUTER JOIN chg g ON b.c_custkey = g.c_custkey
        |WHERE g.c_custkey IS NULL OR g.op <> 'D'
        |ORDER BY c_custkey NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val base = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      val upd = base.where(pmod(col("c_custkey"), lit(7)) === 0)
        .select(col("c_custkey"), lit("U").as("op"), col("c_mktsegment"),
          (col("c_acctbal") + 100).as("c_acctbal"))
      val del = base.where(pmod(col("c_custkey"), lit(7)) =!= 0
          && pmod(col("c_custkey"), lit(11)) === 3)
        .select(col("c_custkey"), lit("D").as("op"), col("c_mktsegment"),
          col("c_acctbal"))
      val ins = base.where(pmod(col("c_custkey"), lit(13)) === 1)
        .select((col("c_custkey") + 10000000L).as("c_custkey"),
          lit("I").as("op"),
          concat(col("c_mktsegment"), lit("_new")).as("c_mktsegment"),
          lit(0.5).as("c_acctbal"))
      graft.operators.Merge.upsert(base,
          upd.unionByName(del).unionByName(ins), "c_custkey",
          Seq("c_mktsegment", "c_acctbal"))
        .orderBy(col("c_custkey"))
    },

    // --- 2-D skyline (Pareto frontier) per brand -------------------------
    // "Cheapest part at every size point that isn't beaten on both
    // axes" — the multi-criteria-optimization operator. The ORACLE
    // states the declarative dominance spec (NOT EXISTS a part of the
    // same brand that is ≤ on both axes and < on one): O(n²) pairs and
    // exactly how a user would write it. The ENGINE computes the same
    // rows in O(n log n): sort each brand by size, then a point is on
    // the frontier iff its price is (a) minimal within its size and
    // (b) strictly below every smaller size's minimum — one window pass
    // with a strict-predecessor RANGE frame, no self-join. Equal
    // (size, price) ties dominate neither way and all surface, matching
    // the spec. Scale: one shuffle on brand; frames are per-partition
    // sorted streams.
    Q(
      "q_skyline_parts",
      """SELECT p_brand, p_partkey, CAST(p_size AS BIGINT) AS p_size,
        |  p_retailprice
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_brand = p.p_brand
        |    AND q.p_size <= p.p_size
        |    AND q.p_retailprice <= p.p_retailprice
        |    AND (q.p_size < p.p_size
        |         OR q.p_retailprice < p.p_retailprice))
        |ORDER BY p_brand NULLS FIRST, p_size NULLS FIRST,
        |  p_partkey NULLS FIRST""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.{Window => W}
      val strictlySmaller = W.partitionBy(col("p_brand"))
        .orderBy(col("p_size"))
        .rangeBetween(W.unboundedPreceding, -1)
      val sameSize = W.partitionBy(col("p_brand"), col("p_size"))
      Tables.part(s, d)
        .select(col("p_brand"), col("p_partkey"),
          col("p_size").cast("long").as("p_size"), col("p_retailprice"))
        .withColumn("min_prev",
          min(col("p_retailprice")).over(strictlySmaller))
        .withColumn("min_same", min(col("p_retailprice")).over(sameSize))
        .where((col("min_prev").isNull
            || col("min_prev") > col("p_retailprice"))
          && col("p_retailprice") === col("min_same"))
        .select(col("p_brand"), col("p_partkey"), col("p_size"),
          col("p_retailprice"))
        .orderBy(col("p_brand"), col("p_size"), col("p_partkey"))
    },

    // --- discount elasticity of quantity per brand -----------------------
    // The pricing readout: least-squares slope of quantity on discount
    // points (x = discount·100, an exact 0–10 integer grid; y =
    // quantity, integer-valued) per brand. Moments are exact BIGINT
    // sums off ONE fact-scan + dim join (stats-driven join strategy —
    // no broadcast hint, per the big-dim tier contract), and the slope
    // is the q_trend_slope closing chain: one guarded IEEE division,
    // ROUND 6.
    Q(
      "q_discount_elasticity",
      """WITH x AS (SELECT p.p_brand,
        |    CAST(CAST(l.l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
        |    CAST(l.l_quantity AS BIGINT) AS y
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |m AS (SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy
        |  FROM x GROUP BY p_brand)
        |SELECT p_brand, n,
        |  ROUND(CASE WHEN n * sxx - sx * sx > 0 THEN
        |      (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    ELSE CAST(0 AS DOUBLE) END, 6) AS qty_per_discount_pt
        |FROM m ORDER BY p_brand NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val x = Tables.lineitem(s, d)
        .join(Tables.part(s, d),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"),
          (col("l_discount").cast("decimal(18,2)") * 100).cast("long")
            .as("x"),
          col("l_quantity").cast("long").as("y"))
      val m = x.groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).cast("long").as("sx"),
          sum(col("y")).cast("long").as("sy"),
          sum(col("x") * col("x")).cast("long").as("sxx"),
          sum(col("x") * col("y")).cast("long").as("sxy"))
      def dd(n: String) = col(n).cast("double")
      val slope = (dd("n") * dd("sxy") - dd("sx") * dd("sy")) /
        (dd("n") * dd("sxx") - dd("sx") * dd("sx"))
      m.select(col("p_brand"), col("n"),
        round(when(col("n") * col("sxx") - col("sx") * col("sx") > 0,
          slope).otherwise(lit(0.0)), 6).as("qty_per_discount_pt"))
        .orderBy(col("p_brand"))
    },

    // --- weighted median price per return flag ---------------------------
    // Quantity-weighted median of the extended price: the "typical
    // UNIT's price", not the typical line's. RANK-defined in exact
    // integers (smallest price cents whose doubled cumulative weight
    // reaches the total — no interpolation, so no cross-engine float
    // risk). The ENGINE side is the two-phase distributed exact
    // median: a cumulative window straight over (flag, cents) would be
    // one task per flag — 3-way parallelism forever, a 100 TB cliff —
    // so phase 1 rolls up $1000 coarse buckets (≤ ~105 rows per flag,
    // bounded by the price GRID, not the corpus), walks the tiny
    // cumulative to locate the target bucket + its prior mass, and
    // phase 2 runs the fine cumulative ONLY inside that one bucket
    // (1/105th of the data, narrowed by a broadcast semi-filter). The
    // oracle states the same rank definition in one pass — value
    // identical by construction.
    Q(
      "q_weighted_median_price",
      """WITH g AS (SELECT l_returnflag,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem GROUP BY l_returnflag, cents),
        |c AS (SELECT l_returnflag, cents, w,
        |    CAST(SUM(w) OVER (PARTITION BY l_returnflag ORDER BY cents)
        |      AS BIGINT) AS cumw,
        |    CAST(SUM(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS totw
        |  FROM g)
        |SELECT l_returnflag, MAX(totw) AS total_qty,
        |  CAST(MIN(CASE WHEN 2 * cumw >= totw THEN cents END) AS BIGINT)
        |    AS wmedian_cents
        |FROM c GROUP BY l_returnflag
        |ORDER BY l_returnflag NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val g = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
            .as("cents"))
        .agg(sum(col("l_quantity").cast("long")).cast("long").as("w"))
        // both phases read this rollup — without persist each phase
        // re-scans and re-aggregates the fact table (the triangle-count
        // working-set discipline)
        .persist()
      import org.apache.spark.sql.expressions.{Window => W}
      // phase 1: coarse $1000 buckets -> target bucket + prior mass
      val coarse = g.groupBy(col("l_returnflag"),
          expr("cents div 100000").as("b"))
        .agg(sum(col("w")).cast("long").as("wsum"))
      val cumB = W.partitionBy(col("l_returnflag")).orderBy(col("b"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      val target = coarse
        .withColumn("cumb", sum(col("wsum")).over(cumB).cast("long"))
        .withColumn("totw", sum(col("wsum"))
          .over(W.partitionBy(col("l_returnflag"))).cast("long"))
        .where(lit(2) * col("cumb") >= col("totw"))
        .groupBy(col("l_returnflag"))
        .agg(min(struct(col("b"), (col("cumb") - col("wsum")).as("prior")))
          .as("t"), max(col("totw")).as("totw"))
        .select(col("l_returnflag").as("tf"), col("t.b").as("tb"),
          col("t.prior").as("prior"), col("totw"))
      // phase 2: fine cumulative inside the ONE target bucket per flag
      val cumC = W.partitionBy(col("l_returnflag")).orderBy(col("cents"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      val out = g.join(broadcast(target),
          col("l_returnflag") === col("tf") &&
            expr("cents div 100000") === col("tb"))
        .withColumn("cumf", sum(col("w")).over(cumC).cast("long"))
        .where(lit(2) * (col("prior") + col("cumf")) >= col("totw"))
        .groupBy(col("l_returnflag"))
        .agg(max(col("totw")).as("total_qty"),
          min(col("cents")).cast("long").as("wmedian_cents"))
        .orderBy(col("l_returnflag"))
      // materialize the ≤|flag-domain| result rows NOW so the rollup
      // cache can be released — without this the persisted blocks stay
      // resident for the remainder of a 250-query session (each such
      // leak compounds across the inventory). The collect is bounded by
      // the 3-value flag domain, not the corpus.
      val rows = out.collect().toSeq
      g.unpersist()
      s.createDataFrame(rows.asJava, out.schema)
    },

    // --- shipping-delay percentiles per order priority --------------------
    // The fulfilment SLA readout: order-date → ship-date lag in exact
    // integer days (one fact-fact equi-join on the order key), then
    // p50/p95 per priority class with the engines' shared sort-based
    // interpolation (percentile ≡ quantile_cont, ROUND 6 — the
    // q_value_percentiles precedent) and a breach flag against a 21-day
    // p95 SLA. Join strategy is stats-driven (orders vs lineitem is a
    // genuine fact-fact shuffle join at scale).
    Q(
      "q_ship_delay_percentiles",
      """WITH lag AS (SELECT o.o_orderpriority,
        |    CAST(CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
        |      AS BIGINT) AS delay_days
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        |SELECT o_orderpriority,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  ROUND(quantile_cont(delay_days, 0.5), 6) AS p50_days,
        |  ROUND(quantile_cont(delay_days, 0.95), 6) AS p95_days,
        |  (quantile_cont(delay_days, 0.95) > 21) AS sla_breach
        |FROM lag GROUP BY o_orderpriority
        |ORDER BY o_orderpriority NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val lag = Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          datediff(col("l_shipdate").cast("date"),
            col("o_orderdate").cast("date")).cast("long").as("delay_days"))
      lag.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          round(expr("percentile(delay_days, 0.5)"), 6).as("p50_days"),
          round(expr("percentile(delay_days, 0.95)"), 6).as("p95_days"),
          (expr("percentile(delay_days, 0.95)") > 21).as("sla_breach"))
        .orderBy(col("o_orderpriority"))
    },

    // --- interval-overlap aggregation via month tiling --------------------
    // The interval-JOIN shape the point-in-range family (RangeJoinRewrite,
    // q_range_join_bands) doesn't cover: each order-to-ship interval
    // [o_orderdate, l_shipdate] contributes its per-month overlap days to
    // a month × returnflag rollup (the "active contracts per period" /
    // "exposure overlap" query). Spark-first plan: EXPLODE the interval
    // onto its month tiles (sequence + explode — fanout bounded by the
    // interval length in months, ≤ the dataset's ~7-year span) and
    // equi-aggregate on the tile, instead of joining intervals against a
    // month table on an overlap predicate — the predicate form plans as
    // a nested loop at any scale, while tiling is one narrow projection
    // feeding one hash aggregate. Overlap days stay exact integers:
    // (min(end, tile_end) − max(start, tile_start)) + 1.
    Q(
      "q_interval_overlap",
      """WITH iv AS (SELECT l_returnflag,
        |    CAST(o_orderdate AS DATE) AS d0, CAST(l_shipdate AS DATE) AS d1
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE CAST(l_shipdate AS DATE) >= CAST(o_orderdate AS DATE)),
        |tiled AS (SELECT l_returnflag, d0, d1,
        |    CAST(unnest(generate_series(date_trunc('month', d0),
        |      date_trunc('month', d1), INTERVAL 1 MONTH)) AS DATE) AS m
        |  FROM iv)
        |SELECT m AS month, l_returnflag,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(date_diff('day', GREATEST(d0, m),
        |    LEAST(d1, last_day(m))) + 1) AS BIGINT) AS overlap_days
        |FROM tiled GROUP BY month, l_returnflag
        |ORDER BY month NULLS FIRST, l_returnflag NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val iv = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_returnflag"),
          col("o_orderdate").cast("date").as("d0"),
          col("l_shipdate").cast("date").as("d1"))
        .where(col("d1") >= col("d0"))
      iv
        .select(col("l_returnflag"), col("d0"), col("d1"),
          explode(expr(
            "sequence(trunc(d0, 'MM'), trunc(d1, 'MM'), interval 1 month)"))
            .as("m"))
        .groupBy(col("m").as("month"), col("l_returnflag"))
        .agg(count(lit(1)).as("n_lines"),
          sum(datediff(least(col("d1"), last_day(col("m"))),
            greatest(col("d0"), col("m"))) + 1).cast("long")
            .as("overlap_days"))
        .orderBy(col("month"), col("l_returnflag"))
    },

    // --- hierarchical rollup via pointer jumping ---------------------------
    // The recursive-hierarchy operator (bill-of-materials explosion, org
    // rollups — SQL's WITH RECURSIVE; no Spark built-in): every part is
    // linked into a synthesized tree by parent(p) = p div 7 (roots are
    // keys < 7 — a deterministic 7-ary hierarchy over real keys, the
    // text_url_dedup synthesis convention), and the query rolls each
    // root's subtree up: member count, exact retail-price mass, max
    // depth. Spark-first plan: POINTER JUMPING, not level-by-level
    // walking — each round joins the ancestor map to itself, squaring
    // the hop distance, so 5 rounds of equi-joins cover depth 2^5 = 32
    // ≥ log7(2^63): EVERY int64 key space converges, no data-dependent
    // iteration count (the alternating-star CC discipline; a per-level
    // walk would need depth rounds and a driver-side convergence probe).
    // Roots carry a self-loop with d = 0, so converged rows pass through
    // later rounds unchanged. Precondition (the standard BOM-table
    // invariant): ancestor CLOSURE — every parent key is itself a row,
    // which dense 1..N part keys satisfy by construction (k div 7 < k);
    // an orphaned parent would silently drop its subtree at the first
    // join (HierarchySpec documents this, and proves depth-21
    // convergence on a closed deep fixture). The oracle walks the same
    // tree with a recursive CTE.
    Q(
      "q_hierarchy_rollup",
      """WITH RECURSIVE walk AS (
        |  SELECT p_partkey AS node, p_partkey AS cur, 0 AS d FROM part
        |  UNION ALL
        |  SELECT node, cur // 7, d + 1 FROM walk WHERE cur >= 7),
        |r AS (SELECT node, cur AS root, d FROM walk WHERE cur < 7)
        |SELECT CAST(root AS BIGINT) AS root,
        |  CAST(COUNT(*) AS BIGINT) AS n_parts,
        |  CAST(SUM(CAST(p.p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS subtree_retail,
        |  CAST(MAX(d) AS BIGINT) AS max_depth
        |FROM r JOIN part p ON p.p_partkey = r.node
        |GROUP BY root ORDER BY root NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val part = Tables.part(s, d)
        .select(col("p_partkey").cast("long").as("node"),
          col("p_retailprice"))
      var anc = part.select(col("node"),
        when(col("node") < 7, col("node"))
          .otherwise(expr("node div 7")).as("anc"),
        when(col("node") < 7, 0L).otherwise(1L).as("d"))
      (1 to 5).foreach { _ =>
        anc = anc.as("x")
          .join(anc.select(col("node").as("j"), col("anc").as("anc2"),
            col("d").as("d2")), col("x.anc") === col("j"))
          .select(col("x.node").as("node"), col("anc2").as("anc"),
            (col("x.d") + col("d2")).as("d"))
      }
      anc.join(part, "node")
        .groupBy(col("anc").as("root"))
        .agg(count(lit(1)).as("n_parts"),
          sum(col("p_retailprice").cast("decimal(18,2)")).cast("double")
            .as("subtree_retail"),
          max(col("d")).cast("long").as("max_depth"))
        .orderBy(col("root"))
    },

    // --- spatial radius join by grid bucketing ----------------------------
    // The spatial-join class (point-radius self-join) expressed the only
    // way it survives 100 TB: hash every point into a grid cell sized to
    // the radius, explode each point into its 3×3 cell NEIGHBORHOOD, and
    // equi-join neighborhood→home-cell — candidates are O(points ×
    // local density), never the all-pairs cross join, and the join key
    // is a plain (gx, gy) equi-key so it shuffles and AQE-balances like
    // any other join. A pair is emitted exactly once: b's single home
    // cell lies in a's 3×3 iff they're neighbors, and a_id < b_id kills
    // the mirror. Coordinates are derived deterministically from
    // c_custkey (two quadratic mixes mod 100k — affine maps landed every
    // point on one 1-D lattice line with NO close pairs, a measured
    // dead end; the quadratic spread is a stand-in for a real lat/lon
    // column, identical integer ops in both engines);
    // the exact d² ≤ r² filter runs AFTER candidate generation, the
    // standard filter-refine split. Found pairs grow with density² on
    // verbatim scale-ups (documented, the near-dup-family caveat).
    Q(
      "q_spatial_grid_join",
      """WITH pt AS (SELECT c_custkey AS id,
        |    (c_custkey * c_custkey + 3 * c_custkey) % 100000 AS x,
        |    (7 * c_custkey * c_custkey + 11 * c_custkey) % 100000 AS y
        |  FROM customer),
        |cells AS (SELECT id, x, y, x // 500 AS gx, y // 500 AS gy
        |  FROM pt),
        |nb AS (SELECT id, x, y, gx + dx.d AS ngx, gy + dy.d AS ngy
        |  FROM cells,
        |    (SELECT unnest([-1, 0, 1]) AS d) dx,
        |    (SELECT unnest([-1, 0, 1]) AS d) dy),
        |pairs AS (SELECT a.id AS a_id, b.id AS b_id,
        |    CAST((a.x - b.x) * (a.x - b.x)
        |      + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS d2
        |  FROM nb a JOIN cells b
        |    ON a.ngx = b.gx AND a.ngy = b.gy AND a.id < b.id
        |  WHERE (a.x - b.x) * (a.x - b.x)
        |      + (a.y - b.y) * (a.y - b.y) <= 250000)
        |SELECT a_id, b_id, d2,
        |  CAST(COUNT(*) OVER () AS BIGINT) AS n_pairs
        |FROM pairs
        |ORDER BY d2, a_id, b_id LIMIT 20""".stripMargin
    ) { (s, d) =>
      val pt = Tables.customer(s, d)
        .select(col("c_custkey").as("id"),
          expr("(c_custkey * c_custkey + 3 * c_custkey) % 100000")
            .as("x"),
          expr("(7 * c_custkey * c_custkey + 11 * c_custkey) % 100000")
            .as("y"))
      val cells = pt
        .withColumn("gx", expr("x div 500"))
        .withColumn("gy", expr("y div 500"))
      val nb = cells
        .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
        .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
        .select(col("id"), col("x"), col("y"),
          (col("gx") + col("dx")).as("ngx"),
          (col("gy") + col("dy")).as("ngy"))
      val pairs = nb.as("a")
        .join(cells.as("b"),
          col("a.ngx") === col("b.gx") && col("a.ngy") === col("b.gy")
            && col("a.id") < col("b.id"))
        .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
          ((col("a.x") - col("b.x")) * (col("a.x") - col("b.x"))
            + (col("a.y") - col("b.y")) * (col("a.y") - col("b.y")))
            .cast("long").as("d2"))
        .where(col("d2") <= 250000L)
      // pair count via a broadcast 1-row aggregate, NOT a global window
      // (a data-sized single-partition window is the anti-pattern); the
      // top-20 rides TakeOrderedAndProject, so neither side sorts the
      // full pair stream
      val n = pairs.agg(count(lit(1)).cast("long").as("n_pairs"))
      pairs.orderBy(col("d2"), col("a_id"), col("b_id")).limit(20)
        .crossJoin(broadcast(n))
        .orderBy(col("d2"), col("a_id"), col("b_id"))
    },

    // --- catalog freshness: new items per ship week --------------------------
    // The assortment-growth curve (and, for a training corpus, the
    // new-entity analogue of text_ngram_novelty): per ship week, how
    // many distinct parts ship at all, how many ship for the FIRST
    // time, and the newcomer share. First-appearance is a min-aggregate
    // on the part key joined back to the per-week activity rollup —
    // the same first-seen shape as the n-gram novelty curve, two hash
    // aggregates and one join on the ≤weeks-sized frames after the
    // initial (part, week) distinct. Both engines truncate to Monday
    // weeks, so the keys agree bit-for-bit as DATEs.
    Q(
      "q_new_items_weekly",
      """WITH pw AS (SELECT l_partkey,
        |    CAST(date_trunc('week', l_shipdate) AS DATE) AS wk
        |  FROM lineitem GROUP BY l_partkey, wk),
        |fw AS (SELECT l_partkey, MIN(wk) AS first_wk FROM pw
        |  GROUP BY l_partkey),
        |act AS (SELECT wk, CAST(COUNT(*) AS BIGINT) AS n_active
        |  FROM pw GROUP BY wk),
        |nw AS (SELECT first_wk AS wk, CAST(COUNT(*) AS BIGINT) AS n_new
        |  FROM fw GROUP BY first_wk)
        |SELECT a.wk, a.n_active, COALESCE(n.n_new, 0) AS n_new,
        |  CAST(COALESCE(n.n_new, 0) * 1000000 // a.n_active AS BIGINT)
        |    AS new_share_ppm
        |FROM act a LEFT JOIN nw n ON a.wk = n.wk
        |ORDER BY a.wk NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val pw = Tables.lineitem(s, d)
        .select(col("l_partkey"),
          date_trunc("week", col("l_shipdate")).cast("date").as("wk"))
        .distinct()
      val fw = pw.groupBy(col("l_partkey"))
        .agg(min(col("wk")).as("first_wk"))
      val act = pw.groupBy(col("wk"))
        .agg(count(lit(1)).cast("long").as("n_active"))
      val nw = fw.groupBy(col("first_wk").as("nwk"))
        .agg(count(lit(1)).cast("long").as("n_new"))
      act.join(nw, col("wk") === col("nwk"), "left")
        .select(col("wk"), col("n_active"),
          coalesce(col("n_new"), lit(0L)).as("n_new"))
        .withColumn("new_share_ppm",
          expr("CAST(n_new * 1000000 div n_active AS BIGINT)"))
        .orderBy(col("wk"))
    },

    // --- year-over-year rank movers within brand -----------------------------
    // The "biggest movers" dashboard staple: each part's revenue rank
    // WITHIN ITS BRAND for 1996 vs 1997, and the top-20 largest rank
    // swings among parts active in both years. Ranking is partitioned
    // by (brand, year) — bounded, balanced groups over the part-level
    // rollup, never one global sort — and revenue is exact integer
    // cents·(100−pct), so ranks are deterministic under the
    // (revenue DESC, partkey) tiebreak. The data-scale work is one
    // filtered lineitem rollup keyed on (partkey, year); everything
    // after rides the dimension-sized frame. The inner join drops
    // single-year parts by design (they have no rank delta; the
    // new-items curve covers arrivals).
    Q(
      "q_rank_movers",
      """WITH r AS (SELECT l_partkey,
        |    CAST(year(l_shipdate) AS BIGINT) AS yr,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |          AS BIGINT)
        |        * (100 - CAST(CAST(l_discount AS DECIMAL(3,2)) * 100
        |            AS BIGINT))) AS BIGINT) AS rev
        |  FROM lineitem WHERE year(l_shipdate) IN (1996, 1997)
        |  GROUP BY l_partkey, yr),
        |j AS (SELECT p.p_brand, r.l_partkey, r.yr, r.rev
        |  FROM r JOIN part p ON r.l_partkey = p.p_partkey),
        |rk AS (SELECT p_brand, l_partkey, yr,
        |    CAST(row_number() OVER (PARTITION BY p_brand, yr
        |      ORDER BY rev DESC, l_partkey) AS BIGINT) AS rnk
        |  FROM j)
        |SELECT a.p_brand, a.l_partkey AS p_partkey,
        |  a.rnk AS rank_1996, b.rnk AS rank_1997,
        |  b.rnk - a.rnk AS rank_delta
        |FROM rk a JOIN rk b ON a.l_partkey = b.l_partkey
        |  AND a.yr = 1996 AND b.yr = 1997
        |ORDER BY ABS(b.rnk - a.rnk) DESC, a.p_brand, p_partkey
        |LIMIT 20""".stripMargin
    ) { (s, d) =>
      val r = Tables.lineitem(s, d)
        .where(year(col("l_shipdate")).isin(1996, 1997))
        .groupBy(col("l_partkey"),
          year(col("l_shipdate")).cast("long").as("yr"))
        .agg(sum(
          expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100" +
            " AS BIGINT)") *
          expr("100 - CAST(CAST(l_discount AS DECIMAL(3,2)) * 100" +
            " AS BIGINT)")).cast("long").as("rev"))
      val j = r.join(Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"), col("l_partkey"), col("yr"), col("rev"))
      val w = Window.partitionBy(col("p_brand"), col("yr"))
        .orderBy(col("rev").desc, col("l_partkey"))
      val rk = j.withColumn("rnk", row_number().over(w).cast("long"))
        .select(col("p_brand"), col("l_partkey"), col("yr"), col("rnk"))
      val a = rk.where(col("yr") === 1996)
        .select(col("p_brand"), col("l_partkey"), col("rnk").as("rank_1996"))
      val b = rk.where(col("yr") === 1997)
        .select(col("l_partkey").as("pk2"), col("rnk").as("rank_1997"))
      a.join(b, col("l_partkey") === col("pk2"))
        .select(col("p_brand"), col("l_partkey").as("p_partkey"),
          col("rank_1996"), col("rank_1997"),
          (col("rank_1997") - col("rank_1996")).as("rank_delta"))
        .orderBy(abs(col("rank_delta")).desc, col("p_brand"),
          col("p_partkey"))
        .limit(20)
    }
  )
}
