package graft.pangenome

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** X1 — the external-alignment operator shell (SURVEY §2.9): stream cluster
  * reference sequences through an external process partition-by-partition
  * (`RDD.pipe`, the Spark analogue of the reference's
  * `NcbiblastnCommandline` batch call, extendingDB_performingBlast.py:63-80),
  * parse its tab-separated hits, aggregate per cluster (A2) and upsert the
  * annotation columns (J11: hasBlastVirusHit, blastTitlesVirus,
  * blastScoresVirus — extendingDB_performingBlast.py:120-142).
  *
  * The real `blastn` binary is environment-provided; tests use a stub
  * command with the same stdin/stdout contract:
  * in: FASTA (">id\nseq"), out: "id\ttitle\tscore" per hit.
  */
object BlastShell {

  /** Pipe (cluster_id, sequence) through `command`; returns hit rows
    * (cluster_id, title, score). Gap characters stripped first (P13).
    */
  def runBlast(spark: SparkSession, clusters: DataFrame, command: Seq[String]): DataFrame = {
    import spark.implicits._
    val fasta = clusters
      .filter(col("reference_sequence").isNotNull)
      .select(col("cluster_id"),
        regexp_replace(col("reference_sequence"), "-", "").as("seq"))
      .as[(String, String)]
      .rdd
      .flatMap { case (id, seq) => Iterator(s">$id", seq) }
    fasta.pipe(command)
      .map(_.split('\t'))
      .filter(_.length >= 3)
      .map(a => (a(0), a(1), a(2).toDouble))
      .toDF("cluster_id", "title", "score")
  }

  /** Pipe FASTA through a blastn invocation producing outfmt-5 XML on
    * stdout (`-outfmt 5`, the reference's format —
    * extendingDB_performingBlast.py:63-80 writes the same XML to a file),
    * then pull-parse each partition's document with
    * [[graft.sources.BlastXml]]. One blastn run per partition, one
    * streaming parse per run — no driver-side collect at any size.
    */
  def runBlastXml(spark: SparkSession, clusters: DataFrame, command: Seq[String]): DataFrame = {
    import spark.implicits._
    val fasta = clusters
      .filter(col("reference_sequence").isNotNull)
      .select(col("cluster_id"),
        regexp_replace(col("reference_sequence"), "-", "").as("seq"))
      .as[(String, String)]
      .rdd
      .flatMap { case (id, seq) => Iterator(s">$id", seq) }
    fasta.pipe(command)
      .mapPartitions(lines => graft.sources.BlastXml.parseString(lines.mkString("\n")))
      .toDF("cluster_id", "title", "score", "e", "num_alignments")
  }

  /** A2 + J11: collect hits per cluster, upsert annotation columns. */
  def annotate(clusters: DataFrame, hits: DataFrame): DataFrame = {
    val agg = hits.groupBy(col("cluster_id"))
      .agg(
        sort_array(collect_list(struct(col("score"), col("title")))).as("hs"))
      .select(col("cluster_id").as("hit_cluster"),
        expr("transform(reverse(hs), x -> x.title)").as("blastTitlesVirus"),
        expr("transform(reverse(hs), x -> x.score)").as("blastScoresVirus"))
    clusters
      .join(agg, col("cluster_id") === col("hit_cluster"), "left")
      .drop("hit_cluster")
      .withColumn("hasBlastVirusHit", col("blastTitlesVirus").isNotNull)
  }
}
