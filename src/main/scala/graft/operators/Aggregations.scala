package graft.operators

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.functions._
import Exact._

/** SURVEY §2.5 aggregation inventory. All grouped aggregation in the
  * reference is hash-style and exact — Spark gives partial (map-side) +
  * final hash aggregation for free. Ordered list-collects are made
  * deterministic with sort_array / ORDER BY inside the aggregate.
  */
object Aggregations {

  val defs: Seq[QueryDef] = Seq(

    // A2: grouped collect of titles/scores per cluster
    // (extendingDB_performingBlast.py:138-142). Arrays serialized to a
    // ';'-joined sorted string for engine-portable comparison.
    QueryDef(
      "a2_grouped_collect",
      (s, d) =>
        T.orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(
            array_join(sort_array(collect_list(col("o_orderpriority"))), ";").as("prios"),
            count(lit(1)).as("n"))
          .orderBy(col("o_custkey")),
      Some("""SELECT o_custkey,
             |  string_agg(o_orderpriority, ';' ORDER BY o_orderpriority) AS prios,
             |  count(*) AS n
             |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin),
      doc = "SURVEY A2; extendingDB_performingBlast.py:138-142"),

    // A3+A4: counts and distinct counts (shape[0], unique()).
    QueryDef(
      "a4_distinct_count",
      (s, d) =>
        T.lineitem(s, d)
          .agg(
            count(lit(1)).as("n_rows"),
            countDistinct(col("l_orderkey")).as("n_orders"),
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_returnflag"), col("l_linestatus")).as("n_flag_combos")),
      Some("""SELECT count(*) AS n_rows,
             |  count(DISTINCT l_orderkey) AS n_orders,
             |  count(DISTINCT l_partkey) AS n_parts,
             |  count(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_combos
             |FROM lineitem""".stripMargin),
      doc = "SURVEY A3/A4; RGPs.ipynb:910,1334,2156-2160"),

    // A5: value counts (insertions per strain, RGPs.ipynb cell 32).
    QueryDef(
      "a5_value_counts",
      (s, d) =>
        T.events(s, d)
          .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("event_type")),
      Some("""SELECT event_type, count(*) AS n FROM events
             |GROUP BY event_type ORDER BY n DESC, event_type""".stripMargin),
      doc = "SURVEY A5; RGPs.ipynb:1330-1338 cell 32"),

    // A7: grouped min/mean/max (per-anchor-pair phylo distances,
    // RGPs.ipynb cell 51).
    QueryDef(
      "a7_min_mean_max",
      (s, d) =>
        T.orders(s, d)
          .groupBy(col("o_orderpriority"))
          .agg(
            min(col("o_totalprice")).as("min_price"),
            eavg(col("o_totalprice")).as("mean_price"),
            max(col("o_totalprice")).as("max_price"))
          .orderBy(col("o_orderpriority")),
      Some(s"""SELECT o_orderpriority,
              |  min(o_totalprice) AS min_price,
              |  ${sqlAvg("o_totalprice")} AS mean_price,
              |  max(o_totalprice) AS max_price
              |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      doc = "SURVEY A7; RGPs.ipynb:1707-1736 cell 51"),

    // A8: histogram binning (plt.hist analogue): fixed-width bins via floor.
    QueryDef(
      "a8_histogram",
      (s, d) =>
        T.orders(s, d)
          .groupBy(floor(col("o_totalprice") / lit(50000.0)).cast("long").as("bin"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("bin")),
      Some("""SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bin,
             |  count(*) AS n
             |FROM orders GROUP BY 1 ORDER BY bin""".stripMargin),
      doc = "SURVEY A8; RGPs.ipynb:943-996 cells 14-16"),

    // A9: conditional cross-tab of two significance flags
    // (GC × CAI significant counts, RGPs.ipynb cell 25).
    QueryDef(
      "a9_crosstab",
      (s, d) => {
        val e = T.events(s, d)
          .withColumn("hi_val", (col("value") > 50).cast("int"))
          .withColumn("err", (col("event_type") === "error").cast("int"))
        e.groupBy(col("hi_val"), col("err")).agg(count(lit(1)).as("n"))
          .orderBy(col("hi_val"), col("err"))
      },
      Some("""SELECT CAST(value > 50 AS INT) AS hi_val,
             |  CAST(event_type = 'error' AS INT) AS err, count(*) AS n
             |FROM events GROUP BY 1, 2 ORDER BY hi_val, err""".stripMargin),
      doc = "SURVEY A9; RGPs.ipynb:1182-1196 cell 25"),

    // A10: grouped set-collect (anchor-pair -> set of strains,
    // RGPs.ipynb cell 44). Set serialized sorted for portability.
    QueryDef(
      "a10_collect_set",
      (s, d) =>
        // distinct FIRST: the (type, user) dedup runs map-side across all
        // partitions, so the skewed 5-key collect shuffle moves ~n_users
        // rows per type instead of the whole fact table (r2 bench: 8 s →
        // scan-bound). collect_list on deduped input == collect_set.
        // Null users excluded up front so n_users == size(users) holds.
        T.events(s, d)
          .filter(col("user_id").isNotNull)
          .select(col("event_type"), col("user_id").cast("string").as("u"))
          .distinct()
          .groupBy(col("event_type"))
          .agg(
            array_join(sort_array(collect_list(col("u"))), ";").as("users"),
            count(lit(1)).as("n_users"))
          .orderBy(col("event_type")),
      Some("""WITH du AS (SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS u
             |            FROM events WHERE user_id IS NOT NULL)
             |SELECT event_type, string_agg(u, ';' ORDER BY u) AS users,
             |  count(*) AS n_users
             |FROM du GROUP BY event_type ORDER BY event_type""".stripMargin),
      doc = "SURVEY A10; RGPs.ipynb:1522-1540 cell 44"),

    // A11: per-group dedup + memoized computation + map back
    // (variation computed once per distinct (cluster, seq),
    // pirateToDatabase.py:213-231): distinct pairs -> compute -> join back.
    QueryDef(
      "a11_dedup_compute_join",
      (s, d) => {
        val docs = T.documents(s, d)
        val distinctLang = docs.select(col("lang"), col("source")).distinct()
          .withColumn("computed", concat(col("lang"), lit("@"), col("source")))
        docs.join(broadcast(distinctLang), Seq("lang", "source"))
          .select(col("doc_id"), col("computed"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH dl AS (SELECT DISTINCT lang, source FROM documents),
             |c AS (SELECT lang, source, lang || '@' || source AS computed FROM dl)
             |SELECT doc_id, computed
             |FROM documents JOIN c USING (lang, source)
             |ORDER BY doc_id""".stripMargin),
      doc = "SURVEY A11; pirateToDatabase.py:213-231"),

    // A13/A14: long-form presence matrix + per-column nonzero counts.
    // The reference pivots insertion × cluster (RGPs.ipynb cells 77-78);
    // long form is the shape that scales to 100 TB.
    QueryDef(
      "a13_long_form_matrix",
      (s, d) =>
        T.events(s, d)
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("user_id"), col("event_type")),
      Some("""SELECT user_id, event_type, count(*) AS cnt FROM events
             |GROUP BY user_id, event_type ORDER BY user_id, event_type""".stripMargin),
      doc = "SURVEY A13; RGPs.ipynb:2175-2185 cells 77-78"),

    // A13 pivot proper: fixed known column set (event types), so the wide
    // form is safe; counts per user per type as columns.
    QueryDef(
      "a13_pivot_counts",
      (s, d) =>
        T.events(s, d)
          .groupBy(col("user_id"))
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy(col("user_id")),
      Some("""SELECT user_id,
             |  CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
             |  CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
             |  CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
             |  CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
             |  CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      doc = "SURVEY A13; RGPs.ipynb:2175-2185"),

    // A14+A15: per-cluster presence counts and the >95%-of-group core filter
    // (RGPs.ipynb cells 107-112).
    QueryDef(
      "a15_core_membership",
      (s, d) => {
        val e = T.events(s, d)
        val groupSize = e.select(countDistinct(col("user_id")).as("n_users"))
        val perType = e.groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("n_present"))
        perType.crossJoin(broadcast(groupSize))
          .withColumn("frac", col("n_present").cast("double") / col("n_users"))
          .filter(col("n_present") > col("n_users") * 0.95)
          .select(col("event_type"), col("n_present"), col("frac"))
          .orderBy(col("event_type"))
      },
      Some("""WITH gs AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
             |pt AS (SELECT event_type, count(DISTINCT user_id) AS n_present
             |       FROM events GROUP BY event_type)
             |SELECT event_type, n_present,
             |  CAST(n_present AS DOUBLE) / n_users AS frac
             |FROM pt, gs WHERE n_present > n_users * 0.95
             |ORDER BY event_type""".stripMargin),
      doc = "SURVEY A14/A15; RGPs.ipynb:3232-3374 cells 107-112"),

    // A16: reduce-sum over an array (reduce(total=0, i in list | total+i),
    // RGPs.ipynb:458-460) — higher-order aggregate on a split list.
    QueryDef(
      "a16_array_reduce",
      (s, d) =>
        T.documents(s, d)
          .select(col("doc_id"),
            aggregate(
              transform(split(col("text"), " "), x => length(x)),
              lit(0L), (acc, x) => acc + x).as("tot_token_chars"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  CAST(list_sum(list_transform(str_split(text, ' '),
             |       x -> length(x))) AS BIGINT) AS tot_token_chars
             |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "SURVEY A16; RGPs.ipynb:458-460 cell 8"),

    // A17: Welch t-statistic from grouped stats
    // (ttest_ind_from_stats per insertion, RGPs.ipynb cells 19-20).
    // t = (m1-m2)/sqrt(s1²/n1 + s2²/n2), all from quantized power sums so
    // both engines produce bit-identical doubles. The p-value needs the
    // Student-t CDF -> graft.functions.Stats (ScalaTest-verified).
    QueryDef(
      "a17_welch_t",
      (s, d) => {
        val e = T.events(s, d)
        val g = e.groupBy(col("event_type"))
          .agg(eavg(col("value")).as("m"), estddev(col("value")).as("sd"),
               count(lit(1)).as("n"))
        val bg = e.filter(col("event_type") === "view")
          .agg(eavg(col("value")).as("m2"), estddev(col("value")).as("sd2"),
               count(lit(1)).as("n2"))
        g.crossJoin(broadcast(bg))
          .withColumn("t_stat",
            (col("m") - col("m2")) /
            sqrt(col("sd") * col("sd") / col("n") + col("sd2") * col("sd2") / col("n2")))
          .select(col("event_type"), col("t_stat"))
          .orderBy(col("event_type"))
      },
      Some(s"""WITH g AS (
              |  SELECT event_type, ${sqlAvg("value")} AS m,
              |         ${sqlStddev("value")} AS sd, count(*) AS n
              |  FROM events GROUP BY event_type),
              |bg AS (
              |  SELECT ${sqlAvg("value")} AS m2, ${sqlStddev("value")} AS sd2,
              |         count(*) AS n2
              |  FROM events WHERE event_type = 'view')
              |SELECT event_type,
              |  (m - m2) / sqrt(sd * sd / n + sd2 * sd2 / n2) AS t_stat
              |FROM g, bg ORDER BY event_type""".stripMargin),
      doc = "SURVEY A17; RGPs.ipynb:1033-1069 cells 19-20")
  )
}
