package graft

import graft.functions.{Cai, GraftExtensions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class GcContentExprSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("native expression matches the scalar kernel on both eval paths") {
    import spark.implicits._
    GraftExtensions.registerInto(spark)
    val inputs = Seq("ACGT", "GGCC", "AATT", "acgtS", "", "ATGNNNGGT")
    val df = inputs.toDF("s")
    // codegen path (default) and interpreted path must agree with Cai.gcContent
    val results = df.select(col("s"), expr("gc_content_native(s)").as("gc"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    inputs.foreach { s =>
      assert(math.abs(results(s) - Cai.gcContent(s)) < 1e-12, s"input '$s'")
    }
    // null propagates
    val nullRow = Seq[Option[String]](None).toDF("s")
      .select(expr("gc_content_native(s)")).head()
    assert(nullRow.isNullAt(0))
  }

  test("native variation encoder matches the scala kernel on random pairs") {
    import spark.implicits._
    import graft.functions.VariationCodec
    GraftExtensions.registerInto(spark)
    val rnd = new scala.util.Random(11)
    val alpha = "ACGT-"
    val pairs = (1 to 300).map { _ =>
      val n = 1 + rnd.nextInt(90)
      (Array.fill(n)(alpha(rnd.nextInt(5))).mkString,
        Array.fill(n)(alpha(rnd.nextInt(5))).mkString)
    }
    val got = pairs.toDF("s", "r")
      .selectExpr("s", "r", "variation_encode_native(s, r) AS e")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    pairs.foreach { case (s, r) =>
      assert(got((s, r)) == VariationCodec.encode(s, r), s"seq=$s ref=$r")
    }
  }

  test("extension class wires the function builder") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext) // must not throw
    val built = GraftExtensions.fn._3(
      Seq(org.apache.spark.sql.catalyst.expressions.Literal("GGGG")))
    assert(built.isInstanceOf[graft.functions.GcContentExpr])
    assert(built.eval(null) == 100.0)
  }
}
