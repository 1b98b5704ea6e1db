package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from the SURVEY.md §2 inventory
  * (the key encodes the row id); [[oracleSql]] carries the DuckDB-equivalent
  * SQL for the driver's hash-compare at sf0.01.
  */
object SparkEntry {

  /** All operator definitions, assembled from the per-area objects. */
  def allDefs: Seq[QueryDef] =
    operators.CoreRelational.defs ++
      operators.Projections.defs ++
      operators.Joins.defs ++
      operators.Aggregations.defs ++
      operators.Windows.defs ++
      operators.SetOps.defs ++
      operators.GraphOps.defs ++
      operators.PipelineOps.defs ++
      operators.DomainOps.defs ++
      operators.Analyses.defs ++
      operators.StreamingOps.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The star-join + grouped aggregation exercises scan -> broadcast joins ->
    * hash agg -> sort, i.e. every layer of the engine's relational core.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("j8_star_join")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
