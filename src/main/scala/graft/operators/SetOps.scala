package graft.operators

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY §2.7 sorts / limits / set operations.
  *
  * O1/O2 (multi-key sort, top-k) are covered by CoreRelational (`a6_topk`
  * uses Spark's TakeOrderedAndProject — no full sort at scale). The rest
  * live here. Set semantics on *rows* use relational union/distinct; set
  * semantics on *values inside a row* use the array higher-order functions
  * (the reference's Python `set` objects map to per-row arrays, which is
  * the shape that scales — no driver-side sets).
  */
object SetOps {

  val defs: Seq[QueryDef] = Seq(

    // O3: bag union of per-source frames (pd.concat of per-file coords,
    // pirateToDatabase.py:27; cluster nodes ∪ lonely clusters,
    // 01_creatingDatabase.cypher:70-89). unionByName keeps it schema-safe.
    QueryDef(
      "o3_union_bag",
      (s, d) => {
        val hi = T.orders(s, d).filter(col("o_totalprice") > 200000.0)
          .select(col("o_orderkey"), col("o_orderstatus"), lit("hi").as("src"))
        val ur = T.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"), col("o_orderstatus"), lit("urgent").as("src"))
        hi.unionByName(ur)
          .groupBy(col("src"), col("o_orderstatus")).agg(count(lit(1)).as("n"))
          .orderBy(col("src"), col("o_orderstatus"))
      },
      Some("""WITH u AS (
             |  SELECT o_orderkey, o_orderstatus, 'hi' AS src FROM orders
             |  WHERE o_totalprice > 200000.0
             |  UNION ALL
             |  SELECT o_orderkey, o_orderstatus, 'urgent' AS src FROM orders
             |  WHERE o_orderpriority = '1-URGENT')
             |SELECT src, o_orderstatus, count(*) AS n FROM u
             |GROUP BY src, o_orderstatus ORDER BY src, o_orderstatus""".stripMargin),
      doc = "SURVEY O3; pirateToDatabase.py:27, 01_creatingDatabase.cypher:70-89"),

    // O4: per-row set intersection (clusterIDs_1 ∩ clusterIDs_2 for Dice,
    // RGPs.ipynb:2085) — array_intersect against a reference vocabulary.
    QueryDef(
      "o4_array_intersect",
      (s, d) => {
        val vocab = array(Seq("table", "row", "value", "scan", "index").map(lit): _*)
        T.documents(s, d)
          .select(col("doc_id"),
            size(array_intersect(array_distinct(split(col("text"), " ")), vocab))
              .as("n_common"),
            size(array_distinct(split(col("text"), " "))).as("n_distinct_toks"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  len(list_intersect(list_distinct(str_split(text, ' ')),
             |      ['table', 'row', 'value', 'scan', 'index'])) AS n_common,
             |  len(list_distinct(str_split(text, ' '))) AS n_distinct_toks
             |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "SURVEY O4; RGPs.ipynb:2085 cell 70"),

    // O5: accumulating set union = explode + distinct (universe of cluster
    // IDs across insertions, RGPs.ipynb:2156-2160). The distinct shuffles
    // once on the token — at 100 TB this is the canonical vocabulary build.
    QueryDef(
      "o5_explode_distinct",
      (s, d) =>
        T.documents(s, d)
          .select(explode(split(col("text"), " ")).as("tok"))
          .filter(col("tok") =!= "")
          .distinct()
          .agg(count(lit(1)).as("vocab_size"),
               min(col("tok")).as("first_tok"), max(col("tok")).as("last_tok")),
      Some("""WITH toks AS (
             |  SELECT DISTINCT unnest(str_split(text, ' ')) AS tok FROM documents)
             |SELECT count(*) AS vocab_size, min(tok) AS first_tok,
             |       max(tok) AS last_tok
             |FROM toks WHERE tok <> ''""".stripMargin),
      doc = "SURVEY O5; RGPs.ipynb:2156-2160 cell 75"),

    // O6: dedup under a key constraint (MERGE (s:STRAIN {name}) + unique
    // constraint, 01_creatingDatabase.cypher:135-145): distinct on the key
    // plus an assertion-style count of violations (always 0 post-distinct).
    QueryDef(
      "o6_key_dedup",
      (s, d) => {
        val strains = T.customer(s, d)
          .select(col("c_nationkey"), col("c_mktsegment")).distinct()
        strains.groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_variants"))
          .orderBy(col("c_nationkey"))
      },
      Some("""SELECT c_nationkey, count(*) AS n_variants
             |FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer) s
             |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),
      doc = "SURVEY O6; 01_creatingDatabase.cypher:135-153"),

    // O7: bidirectional-pair detection — directed pairs canonicalized with
    // least/greatest, kept only when both orientations occur
    // (anchor-inversion check, RGPs.ipynb cells 41-42). Directed edges here:
    // consecutive event_type transitions per user.
    QueryDef(
      "o7_bidirectional_pairs",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val edges = T.events(s, d)
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .filter(col("prev").isNotNull && col("prev") =!= col("event_type"))
          .select(col("prev").as("a"), col("event_type").as("b")).distinct()
        edges
          .groupBy(least(col("a"), col("b")).as("lo"), greatest(col("a"), col("b")).as("hi"))
          .agg(count(lit(1)).as("n_orientations"))
          .filter(col("n_orientations") === 2)
          .select(col("lo"), col("hi"))
          .orderBy(col("lo"), col("hi"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type,
             |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |  FROM events),
             |edges AS (
             |  SELECT DISTINCT prev AS a, event_type AS b FROM e
             |  WHERE prev IS NOT NULL AND prev <> event_type)
             |SELECT least(a, b) AS lo, greatest(a, b) AS hi
             |FROM edges GROUP BY 1, 2 HAVING count(*) = 2
             |ORDER BY lo, hi""".stripMargin),
      doc = "SURVEY O7; RGPs.ipynb:1464-1474 cells 41-42")
  )
}
