package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** ANN family: IVF probing must return a subset of the brute-force ranking
  * with reasonable recall, and identical results on re-run (determinism).
  */
class AnnSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  override def afterAll(): Unit = spark.stop()

  private def pairsOf(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("eid"))).toSet

  test("d5b aggregator top-k equals d5 window top-k exactly") {
    assert(pairsOf("d5b_cosine_topk_agg") == pairsOf("d5_cosine_topk"))
  }

  test("IVF results are deterministic and recall brute-force neighbours") {
    val exact = pairsOf("d5_cosine_topk")
    val ivf1 = pairsOf("d7_ann_ivf")
    val ivf2 = pairsOf("d7_ann_ivf")
    assert(ivf1 == ivf2, "IVF must be deterministic")
    assert(ivf1.nonEmpty)
    val recall = (exact & ivf1).size.toDouble / exact.size
    assert(recall >= 0.2, s"IVF recall@5 too low: $recall")
    // every IVF hit must carry the exact cosine (verified path): spot check
    // by asserting IVF top-1 per query exists in the exact table or has
    // lower similarity (never higher) — IVF cannot invent better neighbours
    val exactRows = SparkEntry.queries("d5_cosine_topk")(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rk")) -> r.getAs[Double]("cos")).toMap
    val ivfTop = SparkEntry.queries("d7_ann_ivf")(spark, sf).collect()
      .filter(_.getAs[Int]("rk") == 1)
      .map(r => r.getAs[Long]("qid") -> r.getAs[Double]("cos"))
    ivfTop.foreach { case (qid, cos) =>
      assert(cos <= exactRows((qid, 1)) + 1e-12, s"query $qid: IVF cos above exact best")
    }
  }

  test("d8 embedding near-dup: planted duplicate groups get one canonical id") {
    import spark.implicits._
    // 30 seeded base vectors; vectors 100+i are near-copies of base i
    // (tiny perturbation, cos > 0.999); everything else is far apart
    val rnd = new scala.util.Random(5)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val bases = (0 until 30).map(i => i.toLong -> vec())
    val dups = (0 until 10).map { i =>
      val b = bases(i)._2
      (100L + i) -> b.map(x => x + (rnd.nextGaussian() * 1e-4).toFloat)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_d8").toString
    (bases ++ dups).map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // cache lifetime is bounded to the query: the verified-pair persist and
    // every GraphX internal must be released once the mapping is
    // materialized to scratch — d8 may not ADD a single live cache (other
    // queries' documented session caches, e.g. d7's base frame, may exist)
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val out = SparkEntry.queries("d8_embedding_neardup")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    val leaked = spark.sparkContext.getPersistentRDDs.filterNot {
      case (id, _) => cachedBefore.contains(id)
    }
    assert(leaked.isEmpty, s"d8 leaked caches: ${leaked.values.map(_.name)}")
    assert(out.size == 40)
    (0 until 10).foreach { i =>
      assert(out(100L + i) == (i.toLong, 1), s"dup of base $i not canonicalized")
      assert(out(i.toLong) == (i.toLong, 0), s"base $i must be its own canonical")
    }
    (10 until 30).foreach { i =>
      assert(out(i.toLong) == (i.toLong, 0), s"singleton $i must map to itself")
    }
  }
}
