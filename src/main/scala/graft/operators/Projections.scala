package graft.operators

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.functions._

/** SURVEY §2.1 scans + §2.2 projections / filters / scalar functions,
  * expressed over the driver's parquet tables with DuckDB oracles.
  * All of these stay inside one whole-stage-codegen span over the scan —
  * no shuffle, filters and column pruning push into the parquet reader.
  */
object Projections {

  val defs: Seq[QueryDef] = Seq(

    // S1: projection scan — read only the needed columns (pushed ReadSchema).
    QueryDef(
      "s1_scan_project",
      (s, d) =>
        T.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
                  col("l_returnflag"))
          .filter(col("l_returnflag") === "R")
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
             |FROM lineitem WHERE l_returnflag = 'R'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      doc = "SURVEY S1; pirateToDatabase.py:19-27 (usecols projection)"),

    // S2: filename -> column (Strain derived from source file name,
    // pirateToDatabase.py:26).
    QueryDef(
      "s2_filename_column",
      (s, d) =>
        // aggregate on the RAW file name first (a handful of distinct
        // values), then regex only the tiny aggregate — a regex per fact
        // row is real money at 100 TB and buys nothing here
        T.lineitem(s, d)
          .groupBy(input_file_name().as("src_file")).agg(count(lit(1)).as("cnt"))
          .groupBy(regexp_extract(col("src_file"), "([a-z]+)\\.parquet", 1)
            .as("src_table"))
          .agg(sum(col("cnt")).as("n"))
          .orderBy(col("src_table")),
      Some("SELECT 'lineitem' AS src_table, count(*) AS n FROM lineitem GROUP BY 1 ORDER BY 1"),
      doc = "SURVEY S2; pirateToDatabase.py:26"),

    // S3: runtime-discovered schema — select columns by position, like the
    // variable-width PIRATE gene-families TSV (pirateToDatabase.py:69-80).
    QueryDef(
      "s3_positional_select",
      (s, d) => {
        val df   = T.part(s, d)
        val cols = df.columns
        val picked = Seq(0, 1, 3).filter(_ < cols.length).map(i => col(cols(i)))
        df.select(picked: _*).orderBy(col(cols(0)))
      },
      Some("SELECT p_partkey, p_name, p_type FROM part ORDER BY p_partkey"),
      doc = "SURVEY S3; pirateToDatabase.py:69-80"),

    // P1+P5: rename + typed casts (toString/toInteger/toFloat per column,
    // 01_creatingDatabase.cypher:4-14).
    QueryDef(
      "p5_typed_casts",
      (s, d) =>
        T.supplier(s, d)
          .select(
            col("s_suppkey").cast("string").as("id_str"),
            col("s_acctbal").cast("long").as("bal_int"),
            col("s_nationkey").cast("double").as("nk_float"),
            col("s_name").as("renamed_name"))
          .orderBy(col("id_str")),
      Some("""SELECT CAST(s_suppkey AS VARCHAR) AS id_str,
             |  CAST(trunc(s_acctbal) AS BIGINT) AS bal_int,
             |  CAST(s_nationkey AS DOUBLE) AS nk_float,
             |  s_name AS renamed_name
             |FROM supplier ORDER BY id_str""".stripMargin),
      doc = "SURVEY P1/P5; 01_creatingDatabase.cypher:4-14, pirateToDatabase.py:28"),

    // P2: column fold / denormalize — concat_ws over coalesced columns
    // (fold per-genome columns into one ';'-joined string,
    // pirateToDatabase.py:82-85).
    QueryDef(
      "p2_concat_fold",
      (s, d) =>
        T.customer(s, d)
          .withColumn("folded",
            concat_ws(";",
              coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("0")),
              col("c_name"),
              col("c_custkey").cast("string")))
          .select(col("c_custkey"), col("folded"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey,
             |  concat_ws(';', coalesce(nullif(c_mktsegment, 'BUILDING'), '0'),
             |            c_name, CAST(c_custkey AS VARCHAR)) AS folded
             |FROM customer ORDER BY c_custkey""".stripMargin),
      doc = "SURVEY P2; pirateToDatabase.py:82-85 (fillna + ;-join)"),

    // P3: string sanitize via translate — '('/')' deleted, ':' -> ';'
    // (pirateToDatabase.py:88). Mapped onto part names: vowels munged.
    QueryDef(
      "p3_translate",
      (s, d) =>
        T.part(s, d)
          .select(col("p_partkey"),
                  translate(col("p_name"), "ao#", "AO").as("sanitized"))
          .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey, translate(p_name, 'ao#', 'AO') AS sanitized
             |FROM part ORDER BY p_partkey""".stripMargin),
      doc = "SURVEY P3; pirateToDatabase.py:88"),

    // P4: split + filter comprehension — [x IN split(...) WHERE x <> ...]
    // (01_creatingDatabase.cypher:39).
    QueryDef(
      "p4_split_filter",
      (s, d) =>
        T.documents(s, d)
          .select(col("doc_id"),
            array_join(
              filter(split(col("text"), " "), x => x =!= "value" && x =!= ""),
              ";").as("kept"),
            size(filter(split(col("text"), " "), x => x === "value")).as("n_dropped"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  array_to_string(list_filter(str_split(text, ' '),
             |                  x -> x <> 'value' AND x <> ''), ';') AS kept,
             |  len(list_filter(str_split(text, ' '), x -> x = 'value')) AS n_dropped
             |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "SURVEY P4; 01_creatingDatabase.cypher:39"),

    // P6: substring by coordinates — fullSequence[start-1:end]
    // (pirateToDatabase.py:264-269).
    QueryDef(
      "p6_substring_coords",
      (s, d) =>
        T.documents(s, d)
          .select(col("doc_id"),
            substring(col("text"), 5, 20).as("excerpt"),
            length(col("text")).as("len"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id, substring(text, 5, 20) AS excerpt,
             |  length(text) AS len
             |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "SURVEY P6; pirateToDatabase.py:264-269"),

    // P9: GC-content formula via built-ins (no UDF):
    // length(regexp_replace(upper(s), '[^GC]', '')) * 100 / length(s)
    // — the reference computes GC% per sequence
    // (extendingDB_FeatureAndStrainMetrics.py:52). Applied to document text
    // over the letters g/c; same arithmetic shape.
    QueryDef(
      "p9_gc_content",
      (s, d) =>
        T.documents(s, d)
          .select(col("doc_id"),
            (length(regexp_replace(upper(col("text")), "[^GC]", "")) * lit(100.0) /
             length(col("text"))).as("gc_pct"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  length(regexp_replace(upper(text), '[^GC]', '', 'g')) * 100.0
             |    / length(text) AS gc_pct
             |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "SURVEY P9; extendingDB_FeatureAndStrainMetrics.py:52"),

    // P9 (native): the same scalar as a codegen Catalyst Expression
    // (graft.functions.GcContentExpr) registered via the session's
    // FunctionRegistry / GraftExtensions — counts G/C/S per IUPAC.
    QueryDef(
      "p9_gc_native_expr",
      (s, d) => {
        graft.functions.GraftExtensions.registerInto(s)
        T.documents(s, d)
          .select(col("doc_id"),
            expr("gc_content_native(text)").as("gc_pct"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  CASE WHEN length(text) = 0 THEN 0.0
             |       ELSE length(regexp_replace(upper(text), '[^GCS]', '', 'g')) * 100.0
             |            / length(text) END AS gc_pct
             |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "SURVEY P9 + §4 custom Expression; extendingDB_FeatureAndStrainMetrics.py:52"),

    // P13: gap strip — replace('-','') before metrics/BLAST
    // (extendingDB_performingBlast.py:56).
    QueryDef(
      "p13_gap_strip",
      (s, d) =>
        T.documents(s, d)
          .select(col("doc_id"),
            // translate, not regexp_replace: single-char strip needs no
            // regex engine (identical output)
            length(translate(col("text"), " ", "")).as("stripped_len"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  length(regexp_replace(text, ' ', '', 'g')) AS stripped_len
             |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "SURVEY P13; extendingDB_performingBlast.py:56"),

    // P14: substring predicates — CONTAINS 'integrase' OR 'transposase';
    // <> 'hypothetical protein' (RGPs.ipynb cell 8).
    QueryDef(
      "p14_contains_predicate",
      (s, d) =>
        T.part(s, d)
          .filter((col("p_name").contains("red") || col("p_name").contains("blue")) &&
                  col("p_type") =!= "ECONOMY")
          .select(col("p_partkey"), col("p_name"), col("p_type"))
          .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey, p_name, p_type FROM part
             |WHERE (contains(p_name, 'red') OR contains(p_name, 'blue'))
             |  AND p_type <> 'ECONOMY'
             |ORDER BY p_partkey""".stripMargin),
      doc = "SURVEY P14; RGPs.ipynb:466,487 cell 8"),

    // P15: null predicates — IS NULL / IS NOT NULL
    // (01_creatingDatabase.cypher:130-131).
    QueryDef(
      "p15_null_predicates",
      (s, d) => {
        val df = T.orders(s, d)
          .withColumn("maybe", nullif(col("o_orderstatus"), lit("P")))
        df.select(
            sum(when(col("maybe").isNull, 1).otherwise(0)).as("n_null"),
            sum(when(col("maybe").isNotNull, 1).otherwise(0)).as("n_not_null"))
      },
      Some("""SELECT
             |  CAST(sum(CASE WHEN nullif(o_orderstatus, 'P') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             |  CAST(sum(CASE WHEN nullif(o_orderstatus, 'P') IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_not_null
             |FROM orders""".stripMargin),
      doc = "SURVEY P15; 01_creatingDatabase.cypher:130-131"),

    // P16: arithmetic projections — insertion size End-Start, ratios,
    // scaled thresholds (RGPs.ipynb cells 8,13,16).
    QueryDef(
      "p16_arithmetic",
      (s, d) =>
        T.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"),
            (col("l_extendedprice") * (lit(1) - col("l_discount")) *
             (lit(1) + col("l_tax"))).as("charged"),
            (col("l_quantity") * lit(0.95)).as("scaled"),
            (col("l_extendedprice") / col("l_quantity")).as("unit_price"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
             |  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged,
             |  l_quantity * 0.95 AS scaled,
             |  l_extendedprice / l_quantity AS unit_price
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin),
      doc = "SURVEY P16; RGPs.ipynb:452,462,920-921,1006"),

    // P17: semi-structured extraction — the events table carries a JSON
    // props column that every real event pipeline has; extraction is a
    // per-row codegen'd builtin (get_json_object — a simple-path JSON
    // tunnel, no UDF, no parse tree materialized), composing directly
    // with the aggregate so the plan is scan → project → hash agg.
    // Null-path accounting rides along, and under Spark 4's default
    // ANSI mode it MUST be try_cast: a non-integral k ({"k": "abc"},
    // {"k": 7.5}) would otherwise throw mid-query instead of counting
    // as null. The oracle mirrors the whole null lattice so the two
    // engines agree on DIRTY data, not just on this generator:
    // json_valid guards DuckDB's throwing json_extract, ->> unquotes
    // string values exactly like get_json_object (so {"k": "7"} reads
    // 7 in both), and the integral-only regex guard pins the ONE case
    // where the engines' string→bigint rules differ ({"k": 7.5}:
    // Spark try_cast nulls it, DuckDB TRY_CAST rounds to 8 — the
    // contract here is integral-or-null in both).
    QueryDef(
      "p17_json_extract",
      (s, d) =>
        T.events(s, d)
          .select(col("event_type"),
            expr("try_cast(get_json_object(props, '$.k') AS BIGINT)").as("k"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_null_k"),
            sum(coalesce(col("k"), lit(0L))).as("sum_k"),
            min(col("k")).as("min_k"), max(col("k")).as("max_k"))
          .orderBy(col("event_type")),
      Some("""WITH e AS (
             |  SELECT event_type,
             |    CASE WHEN props IS NOT NULL AND json_valid(props)
             |          AND regexp_matches(props ->> '$.k',
             |                             '^\s*[-+]?[0-9]+\s*$')
             |         THEN TRY_CAST(trim(props ->> '$.k') AS BIGINT) END AS k
             |  FROM events)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_null_k,
             |  CAST(sum(coalesce(k, 0)) AS BIGINT) AS sum_k,
             |  CAST(min(k) AS BIGINT) AS min_k,
             |  CAST(max(k) AS BIGINT) AS max_k
             |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin),
      doc = "projection/semi-structured: JSON field extraction from the events props column via the codegen'd get_json_object + try_cast builtins (no UDF, total under ANSI), rolled into a per-type aggregate with null-path accounting; all-integer oracle-exact incl. the dirty-JSON null lattice")
  )
}
