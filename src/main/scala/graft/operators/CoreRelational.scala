package graft.operators

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Exact._

/** First slice of the SURVEY §2 relational inventory, expressed over the
  * driver's TPC-H-ish parquet tables so every query has a DuckDB oracle.
  *
  * Scale posture: every aggregate here is a hash aggregate with map-side
  * partial combine; dimension sides of joins are broadcast; all filters and
  * projections sit directly on the parquet scan so Catalyst pushes them down.
  * Double aggregates go through [[Exact]] for engine-independent values.
  */
object CoreRelational {

  private def r4(c: org.apache.spark.sql.Column) = round(c, 4)

  val defs: Seq[QueryDef] = Seq(

    // SQL facade: the same engine surface through spark.sql over temp
    // views — users of the reference's notebooks can keep writing SQL text
    // while Catalyst plans it identically to the DataFrame forms.
    QueryDef(
      "q0_sql_facade",
      (s, d) => {
        T.orders(s, d).createOrReplaceTempView("orders_v")
        T.customer(s, d).createOrReplaceTempView("customer_v")
        s.sql("""
          SELECT c_mktsegment, count(*) AS n_orders,
                 count(DISTINCT o_custkey) AS n_customers
          FROM orders_v JOIN customer_v ON o_custkey = c_custkey
          WHERE o_orderstatus <> 'F'
          GROUP BY c_mktsegment ORDER BY c_mktsegment""")
      },
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
             |  count(DISTINCT o_custkey) AS n_customers
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |WHERE o_orderstatus <> 'F'
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
      doc = "SQL text entry point (SURVEY §7: the API is the query language; spark.sql for SQL users)"),

    // A1-style grouped aggregation — reference: per-strain avg/stddev GC/CAI,
    // 02_addNucleotideCompositionMetrics.cypher:13-28. TPC-H Q1 shape.
    QueryDef(
      "q1_agg",
      (s, d) => {
        T.lineitem(s, d)
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            (esum(col("l_quantity"))).as("sum_qty"),
            (esum(col("l_extendedprice"))).as("sum_base_price"),
            (esum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
            (eavg(col("l_quantity"))).as("avg_qty"),
            (eavg(col("l_discount"))).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  ${sqlSum("l_quantity")} AS sum_qty,
              |  ${sqlSum("l_extendedprice")} AS sum_base_price,
              |  ${sqlSum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
              |  ${sqlAvg("l_quantity")} AS avg_qty,
              |  ${sqlAvg("l_discount")} AS avg_disc,
              |  count(*) AS count_order
              |FROM lineitem
              |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
              |GROUP BY l_returnflag, l_linestatus
              |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      doc = "SURVEY A1; reference 02_addNucleotideCompositionMetrics.cypher:13-28"),

    // A1 proper: grouped avg + sample stddev (Neo4j stDev == stddev_samp).
    QueryDef(
      "a1_group_stats",
      (s, d) =>
        T.customer(s, d)
          .groupBy(col("c_nationkey"))
          .agg(
            (eavg(col("c_acctbal"))).as("avg_bal"),
            (estddev(col("c_acctbal"))).as("stddev_bal"),
            count(lit(1)).as("n"))
          .orderBy(col("c_nationkey")),
      Some(s"""SELECT c_nationkey,
              |  ${sqlAvg("c_acctbal")} AS avg_bal,
              |  ${sqlStddev("c_acctbal")} AS stddev_bal,
              |  count(*) AS n
              |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),
      doc = "SURVEY A1; 02_addNucleotideCompositionMetrics.cypher:13-28"),

    // J8-style multi-way equi-join chain (4-way pattern join in the graph
    // build, 01_creatingDatabase.cypher:91-106). Dimensions are broadcast.
    QueryDef(
      "j8_star_join",
      (s, d) => {
        val li = T.lineitem(s, d)
        val o  = T.orders(s, d)
        val c  = T.customer(s, d)
        val n  = T.nation(s, d)
        val r  = T.region(s, d)
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .groupBy(col("n_name"))
          .agg((esum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
               count(lit(1)).as("n_items"))
          .orderBy(col("n_name"))
      },
      Some(s"""SELECT n_name,
              |  ${sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue,
              |  count(*) AS n_items
              |FROM lineitem
              |JOIN orders   ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation   ON c_nationkey = n_nationkey
              |JOIN region   ON n_regionkey = r_regionkey
              |WHERE r_name = 'ASIA'
              |GROUP BY n_name ORDER BY n_name""".stripMargin),
      doc = "SURVEY J8; 01_creatingDatabase.cypher:91-106"),

    // J12 anti join — lonely clusters: features with no ORTHOLOG edge,
    // 01_creatingDatabase.cypher:70-73.
    QueryDef(
      "j12_anti_join",
      (s, d) => {
        val c = T.customer(s, d)
        val o = T.orders(s, d)
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name, c_nationkey
             |FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin),
      doc = "SURVEY J12; 01_creatingDatabase.cypher:70-73"),

    // J13 semi join — the EXISTS side of the same pattern.
    QueryDef(
      "j13_semi_join",
      (s, d) => {
        val c = T.customer(s, d)
        val o = T.orders(s, d).filter(col("o_orderstatus") === "O")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_mktsegment"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_mktsegment
             |FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
             |ORDER BY c_custkey""".stripMargin),
      doc = "SURVEY J13; GIsInStrain.ipynb cell 3 endpoint anti-joins"),

    // W5 row position + W4 lag: the positional genome model
    // (row_number over strain order) that replaces NEIGHBOUR chains.
    QueryDef(
      "w5_row_position",
      (s, d) =>
        // pos/prev_id ARE this query's two window functions — read them
        // from the shared positional cache instead of re-running the pass
        Positional.frame(s, d)
          .select(col("event_id"), col("user_id"), col("pos").as("position"),
            col("prev_id").as("prev_event"))
          .orderBy(col("user_id"), col("position")),
      Some("""SELECT event_id, user_id,
             |  row_number() OVER w AS position,
             |  lag(event_id, 1) OVER w AS prev_event
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY user_id, position""".stripMargin),
      doc = "SURVEY W5/W4; pirateToDatabase.py:299-327, GIsInStrain.ipynb cell 8"),

    // W1 trailing rolling mean (pandas rolling(10) over genome order,
    // GIsInStrain.ipynb cell 8). Exact decimal sum / count keeps the value
    // independent of each engine's window accumulation order.
    QueryDef(
      "w1_rolling_mean",
      (s, d) => {
        // window by the cached rank (pos == the (ts, event_id) order):
        // the cached frame is already partitioned by user_id and sorted,
        // so the window runs exchange- and sort-free on a warm cache
        val w = Window.partitionBy(col("user_id")).orderBy(col("pos"))
          .rowsBetween(-9, 0)
        Positional.frame(s, d)
          .withColumn("roll_avg",
            (sum(floor(col("value") * lit(1e6) + lit(0.5)).cast("long")).over(w).cast("double") /
               lit(1e6) / count(col("value")).over(w)))
          .select(col("event_id"), col("user_id"), col("roll_avg"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT event_id, user_id,
             |  CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) OVER w AS DOUBLE)
             |        / 1e6 / count(value) OVER w AS roll_avg
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, event_id""".stripMargin),
      doc = "SURVEY W1; GIsInStrain.ipynb cell 8 rolling(10).mean()"),

    // P12 z-score via join against grouped stats + P11 threshold flag
    // (deviating_CAI = |z| >= 1.5, GIsInStrain.ipynb cells 3-4).
    QueryDef(
      "p12_zscore_flag",
      (s, d) => {
        val c = T.customer(s, d)
        val stats = c.groupBy(col("c_nationkey").as("nk"))
          .agg(eavg(col("c_acctbal")).as("mu"), estddev(col("c_acctbal")).as("sd"))
        c.join(broadcast(stats), col("c_nationkey") === col("nk"))
          .withColumn("z", (col("c_acctbal") - col("mu")) / col("sd"))
          .withColumn("deviating", when(abs(col("z")) >= 1.5, 1).otherwise(0))
          .select(col("c_custkey"), col("z").as("z"), col("deviating"))
          .orderBy(col("c_custkey"))
      },
      Some(s"""WITH stats AS (
              |  SELECT c_nationkey AS nk, ${sqlAvg("c_acctbal")} AS mu,
              |         ${sqlStddev("c_acctbal")} AS sd
              |  FROM customer GROUP BY c_nationkey)
              |SELECT c_custkey,
              |  (c_acctbal - mu) / sd AS z,
              |  CASE WHEN abs((c_acctbal - mu) / sd) >= 1.5 THEN 1 ELSE 0 END AS deviating
              |FROM customer JOIN stats ON c_nationkey = nk
              |ORDER BY c_custkey""".stripMargin),
      doc = "SURVEY P11/P12; GIsInStrain.ipynb cells 3-4"),

    // A6/O2 top-k: orderBy desc + limit -> TakeOrderedAndProject.
    QueryDef(
      "a6_topk",
      (s, d) =>
        T.orders(s, d)
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10)
          .select(col("o_orderkey"), col("o_totalprice")),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin),
      doc = "SURVEY A6/O2; RGPs.ipynb cell 90 top-10 cluster sizes"),

    // G1 neighbour-edge derivation: sort by (strain, start), lag, emit
    // prev->cur edges — pirateToDatabase.py:299-327 with the strain-partition
    // fix documented in SURVEY G1.
    QueryDef(
      "g1_lag_edges",
      (s, d) =>
        // prev_id is the same lag from the shared positional cache
        // (one window pass serves the whole g1-g5 neighbour family)
        Positional.frame(s, d)
          .filter(col("prev_id").isNotNull)
          .select(col("prev_id").as("src"), col("event_id").as("dst"),
            col("user_id"))
          .orderBy(col("src"), col("dst")),
      Some("""SELECT src, dst, user_id FROM (
             |  SELECT lag(event_id, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
             |         event_id AS dst, user_id
             |  FROM events)
             |WHERE src IS NOT NULL ORDER BY src, dst""".stripMargin),
      doc = "SURVEY G1; pirateToDatabase.py:299-327")
  )
}
