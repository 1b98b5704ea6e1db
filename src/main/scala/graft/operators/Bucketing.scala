package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed at-rest layout for shuffle-free repeated joins (SURVEY §4;
  * the 100 TB lever the brief calls out directly: "co-locate joins via
  * bucketing"). Writing both fact tables bucketed + sorted on the join
  * key means every later join on that key is planned as a zero-exchange
  * sort-merge join — the shuffle is paid ONCE at write time and amortized
  * over every subsequent query. On the pangenome schema this is the
  * FEATURE⋈CLUSTER / FEATURE⋈STRAIN pattern (01_creatingDatabase
  * .cypher:60,147): the graph-build joins repeat per analysis session,
  * so the bucketed layout is the difference between re-shuffling 100 TB
  * per query and never shuffling it again.
  */
object Bucketing {

  /** Write `df` as a bucketed, in-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key. When both sides were
    * written with the same bucket count on the join key, Catalyst plans
    * this as a sort-merge join with NO exchange on either side (assert
    * with BucketingSpec's plan check).
    */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
