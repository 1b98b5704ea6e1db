package graft.operators

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.functions._
import Exact._

/** SURVEY §2.3 join inventory. Every reference join is an equi-join except
  * J14/J15 (inequality pair / cross). Small dimension sides get explicit
  * `broadcast()` hints — at 100 TB the fact side never moves for these.
  */
object Joins {

  val defs: Seq[QueryDef] = Seq(

    // J1/J2: inner m:1 join, small reference side broadcast
    // (clusterDf ⋈ reprSeqDf, pirateToDatabase.py:91).
    QueryDef(
      "j1_broadcast_inner",
      (s, d) =>
        T.supplier(s, d)
          .join(broadcast(T.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"))
          .orderBy(col("s_suppkey")),
      Some("""SELECT s_suppkey, s_name, n_name
             |FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |ORDER BY s_suppkey""".stripMargin),
      doc = "SURVEY J1/J2; pirateToDatabase.py:91,128"),

    // J3: self-join to attach a per-group reference row onto every member
    // (alignedSeqDf ⋈ itself on reference_locus = Feature,
    // pirateToDatabase.py:131-132). Here: attach each order's line #1 price
    // to all of its lines.
    QueryDef(
      "j3_self_join_reference",
      (s, d) => {
        val li  = T.lineitem(s, d)
        // the reference rows are 1-per-group — but the group count scales
        // WITH the fact table (1 order per ~4 lines), so a forced
        // broadcast would OOM at exactly the scale this operator targets
        // (the d9b lesson). Unhinted: AQE broadcasts at small scale from
        // the observed size; at 100 TB both sides shuffle once on the
        // join key — the scale-safe co-partitioned form, same as the
        // domain original (Pangenome.etl refRows).
        val ref = li.filter(col("l_linenumber") === 1)
          .select(col("l_orderkey").as("ref_ok"),
                  col("l_extendedprice").as("ref_price"))
        li.join(ref, col("l_orderkey") === col("ref_ok"))
          .select(col("l_orderkey"), col("l_linenumber"),
            (col("l_extendedprice") - col("ref_price")).as("delta_vs_ref"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l.l_orderkey, l.l_linenumber,
             |  l.l_extendedprice - r.l_extendedprice AS delta_vs_ref
             |FROM lineitem l
             |JOIN (SELECT l_orderkey, l_extendedprice FROM lineitem
             |      WHERE l_linenumber = 1) r ON l.l_orderkey = r.l_orderkey
             |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin),
      doc = "SURVEY J3; pirateToDatabase.py:131-132"),

    // J4: left join + indicator column (pandas indicator='left_only',
    // pirateToDatabase.py:238-240).
    QueryDef(
      "j4_left_join_indicator",
      (s, d) => {
        val c = T.customer(s, d)
        val o = T.orders(s, d).select(col("o_custkey")).distinct()
          .withColumn("marker", lit(1))
        c.join(o, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"),
            when(col("marker").isNull, "left_only").otherwise("both").as("indicator"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey,
             |  CASE WHEN o.o_custkey IS NULL THEN 'left_only' ELSE 'both' END AS indicator
             |FROM customer c
             |LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
             |  ON c.c_custkey = o.o_custkey
             |ORDER BY c_custkey""".stripMargin),
      doc = "SURVEY J4; pirateToDatabase.py:238-240,262"),

    // J5: conditional fill on the left_only rows (genome-substring fill,
    // pirateToDatabase.py:260-273) — left join + when(isNull, fallback).
    QueryDef(
      "j5_left_join_fill",
      (s, d) => {
        val c = T.customer(s, d)
        val firstOrder = T.orders(s, d)
          .groupBy(col("o_custkey")).agg(min(col("o_orderpriority")).as("prio"))
        c.join(firstOrder, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"),
            when(col("prio").isNull, substring(col("c_name"), 1, 8))
              .otherwise(col("prio")).as("filled"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey,
             |  CASE WHEN prio IS NULL THEN substring(c_name, 1, 8)
             |       ELSE prio END AS filled
             |FROM customer c LEFT JOIN
             |  (SELECT o_custkey, min(o_orderpriority) AS prio
             |   FROM orders GROUP BY o_custkey) o ON c_custkey = o_custkey
             |ORDER BY c_custkey""".stripMargin),
      doc = "SURVEY J5; pirateToDatabase.py:260-273"),

    // J6+J10: left join producing nulls, then keyed repair/backfill with
    // coalesce (null reference_sequence repair, 01_creatingDatabase.cypher:129-133).
    QueryDef(
      "j10_repair_coalesce",
      (s, d) => {
        val o = T.orders(s, d)
        // primary source: line #4 price (often absent -> null)
        val l4 = T.lineitem(s, d).filter(col("l_linenumber") === 4)
          .select(col("l_orderkey").as("k4"), col("l_extendedprice").as("p4"))
        // repair source: line #1 price
        val l1 = T.lineitem(s, d).filter(col("l_linenumber") === 1)
          .select(col("l_orderkey").as("k1"), col("l_extendedprice").as("p1"))
        o.join(l4, col("o_orderkey") === col("k4"), "left")
          .join(l1, col("o_orderkey") === col("k1"), "left")
          .select(col("o_orderkey"), coalesce(col("p4"), col("p1")).as("ref_price"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, coalesce(l4.p4, l1.p1) AS ref_price
             |FROM orders
             |LEFT JOIN (SELECT l_orderkey, l_extendedprice AS p4 FROM lineitem
             |           WHERE l_linenumber = 4) l4 ON o_orderkey = l4.l_orderkey
             |LEFT JOIN (SELECT l_orderkey, l_extendedprice AS p1 FROM lineitem
             |           WHERE l_linenumber = 1) l1 ON o_orderkey = l1.l_orderkey
             |ORDER BY o_orderkey""".stripMargin),
      doc = "SURVEY J6/J10; 01_creatingDatabase.cypher:129-133"),

    // J7: explode array + keyed equi-join (UNWIND c.feature_ids MATCH feature,
    // 01_creatingDatabase.cypher:61-68). Tokens exploded from documents join
    // a small inline dimension.
    QueryDef(
      "j7_explode_join",
      (s, d) => {
        import s.implicits._
        val dim = Seq("table", "row", "value", "scan").toDF("word")
          .withColumn("weight", length(col("word")))
        T.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .join(broadcast(dim), col("tok") === col("word"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_hits"), sum(col("weight")).as("tot_weight"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents),
             |dim AS (SELECT * FROM (VALUES ('table', 5), ('row', 3),
             |        ('value', 5), ('scan', 4)) AS t(word, weight))
             |SELECT doc_id, count(*) AS n_hits,
             |  CAST(sum(weight) AS BIGINT) AS tot_weight
             |FROM toks JOIN dim ON tok = word
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      doc = "SURVEY J7; 01_creatingDatabase.cypher:61-68"),

    // J9: 2-hop join + distinct ((c)<-[:ORTHOLOG]-(f)-[:FEATURE_IN_STRAIN]->(s),
    // 01_creatingDatabase.cypher:147-153).
    QueryDef(
      "j9_two_hop_distinct",
      (s, d) =>
        T.orders(s, d)
          .join(T.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
          .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_nationkey"), col("l_suppkey")).distinct()
          .orderBy(col("c_nationkey"), col("l_suppkey")),
      Some("""SELECT DISTINCT c_nationkey, l_suppkey
             |FROM orders
             |JOIN lineitem ON o_orderkey = l_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |ORDER BY c_nationkey, l_suppkey""".stripMargin),
      doc = "SURVEY J9; 01_creatingDatabase.cypher:147-153"),

    // J11: keyed upsert (MERGE ... ON MATCH SET) as full-outer join +
    // coalesce(new, old) — 02_addNucleotideCompositionMetrics.cypher:4-11.
    QueryDef(
      "j11_upsert_merge",
      (s, d) => {
        val base = T.orders(s, d).filter(col("o_orderstatus") === "F")
          .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("old_n"))
        val upd = T.orders(s, d).filter(col("o_orderstatus") === "O")
          .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("new_n"))
        base.join(upd, Seq("k"), "full_outer")
          .select(col("k").as("custkey"),
            coalesce(col("new_n"), col("old_n")).as("n"),
            when(col("new_n").isNotNull && col("old_n").isNotNull, "updated")
              .when(col("new_n").isNotNull, "inserted")
              .otherwise("kept").as("op"))
          .orderBy(col("custkey"))
      },
      Some("""WITH base AS (SELECT o_custkey AS k, count(*) AS old_n FROM orders
             |              WHERE o_orderstatus = 'F' GROUP BY 1),
             |     upd  AS (SELECT o_custkey AS k, count(*) AS new_n FROM orders
             |              WHERE o_orderstatus = 'O' GROUP BY 1)
             |SELECT coalesce(base.k, upd.k) AS custkey,
             |  coalesce(new_n, old_n) AS n,
             |  CASE WHEN new_n IS NOT NULL AND old_n IS NOT NULL THEN 'updated'
             |       WHEN new_n IS NOT NULL THEN 'inserted'
             |       ELSE 'kept' END AS op
             |FROM base FULL OUTER JOIN upd ON base.k = upd.k
             |ORDER BY custkey""".stripMargin),
      doc = "SURVEY J11; 02_addNucleotideCompositionMetrics.cypher:4-11"),

    // J14: theta self pair-join — all unordered pairs within a group
    // (strain pairs per anchor group, RGPs.ipynb:1650-1657).
    QueryDef(
      "j14_pair_join",
      (s, d) => {
        val a = T.supplier(s, d)
          .select(col("s_nationkey").as("nk"), col("s_suppkey").as("k1"),
                  col("s_acctbal").as("b1"))
        val b = T.supplier(s, d)
          .select(col("s_nationkey").as("nk2"), col("s_suppkey").as("k2"),
                  col("s_acctbal").as("b2"))
        a.join(b, col("nk") === col("nk2") && col("k1") < col("k2"))
          .select(col("nk"), col("k1"), col("k2"),
                  abs(col("b1") - col("b2")).as("bal_gap"))
          .orderBy(col("nk"), col("k1"), col("k2"))
      },
      Some("""SELECT a.s_nationkey AS nk, a.s_suppkey AS k1, b.s_suppkey AS k2,
             |  abs(a.s_acctbal - b.s_acctbal) AS bal_gap
             |FROM supplier a JOIN supplier b
             |  ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
             |ORDER BY nk, k1, k2""".stripMargin),
      doc = "SURVEY J14; RGPs.ipynb:1650-1657,1838-1846"),

    // J15: full pairwise cross join (N×N similarity matrix, RGPs.ipynb cell 70).
    // Kept to a dimension table here; the scale path is MinHash-LSH (see
    // pipeline ops), never a raw cross join at 100 TB.
    QueryDef(
      "j15_cross_pairs",
      (s, d) => {
        val a = T.nation(s, d).select(col("n_nationkey").as("k1"), col("n_name").as("name1"))
        val b = T.nation(s, d).select(col("n_nationkey").as("k2"), col("n_name").as("name2"))
        a.crossJoin(b).filter(col("k1") < col("k2"))
          .select(col("k1"), col("k2"),
            (length(col("name1")) + length(col("name2"))).as("len_sum"))
          .orderBy(col("k1"), col("k2"))
      },
      Some("""SELECT a.n_nationkey AS k1, b.n_nationkey AS k2,
             |  length(a.n_name) + length(b.n_name) AS len_sum
             |FROM nation a CROSS JOIN nation b
             |WHERE a.n_nationkey < b.n_nationkey
             |ORDER BY k1, k2""".stripMargin),
      doc = "SURVEY J15; RGPs.ipynb:2073-2091 cell 70"),

    // J16: point-lookup join — the reference loops one Cypher query per key;
    // restructured as one semi-join against the key list (RGPs.ipynb cells 113-114).
    QueryDef(
      "j16_point_lookup",
      (s, d) => {
        import s.implicits._
        val keys = Seq(1L, 7L, 42L, 99L, 1234L).toDF("key")
        T.orders(s, d)
          .join(broadcast(keys), col("o_orderkey") === col("key"), "left_semi")
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
             |WHERE o_orderkey IN (1, 7, 42, 99, 1234)
             |ORDER BY o_orderkey""".stripMargin),
      doc = "SURVEY J16; RGPs.ipynb:3381-3405 cells 113-114")
  )
}
