package graft

import graft.pangenome.Pangenome
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The `graft.skew.*` lifecycle confs: etl's chain-edge lag and
  * genomeTrack's position + rolling windows re-routed through the Skew
  * two-phase plans must be BIT-IDENTICAL to the default plans — on the
  * multi-contig fixture (chain keys, window resets at replicon
  * boundaries) and on a hot-strain corpus (the skew the confs exist
  * for). The confs are opt-in; these tests also pin that unset confs
  * leave the default plan untouched (no Skew temp columns in the plan).
  */
class SkewLifecycleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val confs = Seq("graft.skew.chainChunkSpan", "graft.skew.trackChunkSpan")

  private def withSkew[A](chainSpan: Long, trackSpan: Long)(body: => A): A = {
    spark.conf.set("graft.skew.chainChunkSpan", chainSpan.toString)
    spark.conf.set("graft.skew.trackChunkSpan", trackSpan.toString)
    try body finally confs.foreach(spark.conf.unset)
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Pin the enriched tables before comparing two genomeTrack collects.
    * The strain stats are PLAIN double avg/stddev_samp (Neo4j parity by
    * design), whose ulps depend on shuffle-fetch merge order — two
    * collects over the lazy lineage can disagree in the last digit of
    * z even with identical plans. Production runs over STORED tables
    * (the Pangenome materialization contract); persist+count is that
    * boundary for the spec: both collects read the same materialized
    * stats.
    */
  private def pin(e: Pangenome.EnrichedTables): Pangenome.EnrichedTables = {
    e.features.persist(); e.strains.persist()
    e.features.count(); e.strains.count()
    e
  }

  test("multi-contig fixture: skew-routed etl + genomeTrack are bit-identical") {
    val fixture = getClass.getResource("/minipan_contigs").getPath
    val plainEtl = Pangenome.etl(spark, fixture)
    val plainEdges = canon(plainEtl.neighbourEdges)
    val graph = Pangenome.buildGraph(spark, plainEtl)
    val enriched = pin(Pangenome.enrich(spark, graph))
    val plainTrack = canon(Pangenome.genomeTrack(enriched, graph))
    // small spans force MANY chunks (minipan Starts are tens-to-hundreds),
    // so chunk boundaries and carries actually exercise
    val (skewEdges, skewTrack) = withSkew(chainSpan = 100L, trackSpan = 150L) {
      (canon(Pangenome.etl(spark, fixture).neighbourEdges),
        canon(Pangenome.genomeTrack(enriched, graph)))
    }
    assert(skewEdges == plainEdges, "chain edges must be bit-identical under chunkedLag")
    assert(skewTrack == plainTrack,
      "genome track must be bit-identical under globalRowNumber + rowsRolling")
    // opt-in means opt-in: with confs unset the plan carries no Skew temps
    val defaultPlan = Pangenome.genomeTrack(enriched, graph)
      .queryExecution.executedPlan.toString
    assert(!defaultPlan.contains("__rchunk"),
      "unset confs must leave the plain window plan untouched")
  }

  test("hot-strain corpus: skew-routed genomeTrack is bit-identical and scatters the hot strain") {
    // strain 0 with 3x the features of the rest — the mega-genome shape
    val t = Rehearsal.synthesize(spark, nStrains = 4, hotFactor = 3)
    val graph = Pangenome.buildGraph(spark, t)
    val enriched = pin(Pangenome.enrich(spark, graph))
    val plain = canon(Pangenome.genomeTrack(enriched, graph))
    withSkew(chainSpan = 100000L, trackSpan = 200000L) {
      val skewDf = Pangenome.genomeTrack(enriched, graph)
      assert(canon(skewDf) == plain,
        "hot-strain genome track must be bit-identical under the skew plans")
      // the final window exchange hashes (Strain, Contig, __rchunk):
      // the hot strain's rows spread over many row-chunk groups
      val plan = skewDf.queryExecution.executedPlan.toString
      assert(plan.contains("__rchunk"),
        s"skew conf must route through rowsRolling:\n$plan")
    }
  }
}
