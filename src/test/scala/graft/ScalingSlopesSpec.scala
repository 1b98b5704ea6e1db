package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The scaling harness is only evidence if its corpora are shaped like
  * the real testdata: every query under test must read the synthetic
  * documents/embeddings through the exact schema the sf* generations
  * carry, or the slopes measure a different plan. Pins the materialized
  * schemas, the float-quantization round-trip the embedding export
  * depends on, and that every query under test runs green on a
  * miniature synthetic corpus.
  */
class ScalingSlopesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft_slopes").toString
    ScalingSlopes.materialize(spark, nDocs = 600, nVecs = 250, dir = d)
    d
  }

  test("materialized corpora carry the testdata schemas") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(docs.schema.fields.map(f => f.name -> f.dataType).toSeq == Seq(
      "doc_id" -> LongType, "lang" -> StringType, "source" -> StringType,
      "text" -> StringType, "n_chars" -> LongType))
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    assert(emb.schema.fields.map(f => f.name -> f.dataType).toSeq == Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType))
    assert(docs.count() == 600 && emb.count() == 250)
    assert(emb.selectExpr("max(size(embedding))").collect()(0).getInt(0) == 32)
  }

  test("float export round-trips the d5-rule quantization exactly") {
    import org.apache.spark.sql.functions._
    // the queries re-quantize embedding via floor(x*1000 + 0.5); the
    // export wrote x = q/1000 as float — the round trip must recover
    // every integer q or the measured plans diverge from the real ones
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(explode(col("embedding")).as("x"))
      .withColumn("q", expr("CAST(floor(x * 1000 + 0.5) AS BIGINT)"))
      .withColumn("back", expr("CAST(CAST(q AS DOUBLE) / 1000.0 AS FLOAT)"))
    assert(emb.filter(col("back") =!= col("x")).count() == 0)
  }

  test("every query under test runs green on the synthetic corpus") {
    ScalingSlopes.queriesUnderTest.foreach { q =>
      val n = SparkEntry.queries(q)(spark, dir).count()
      assert(n >= 0, s"$q failed on the synthetic corpus")
    }
  }
}
