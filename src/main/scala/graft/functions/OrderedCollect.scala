package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** `collect_ordered_list` (SURVEY §2.11): order-preserving grouped collect,
  * packaged as a typed `Aggregator` — the custom-UDAF form of the
  * `sort_array(collect_list(struct(pos, x)))` pattern used by the span
  * queries (G8). Merge-safe under partial aggregation: buffers accumulate
  * unordered (map-side combine still applies), the single final sort
  * happens in `finish`. Registered with `functions.udaf(...)`.
  *
  * The builtin composition usually wins on codegen; this exists for
  * callers who want one aggregate expression and for the §2.11 inventory.
  */
object OrderedCollect {

  type In = (Long, String) // (sort key, value)

  val aggregator: Aggregator[In, List[In], Seq[String]] =
    new Aggregator[In, List[In], Seq[String]] {
      override def zero: List[In] = Nil
      override def reduce(b: List[In], a: In): List[In] = a :: b
      override def merge(b1: List[In], b2: List[In]): List[In] = b1 ::: b2
      override def finish(r: List[In]): Seq[String] =
        r.sortBy(_._1).map(_._2)
      override def bufferEncoder: Encoder[List[In]] = Encoders.kryo[List[In]]
      override def outputEncoder: Encoder[Seq[String]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
    }

  /** Column-world handle: `df.groupBy(k).agg(OrderedCollect.udafColumn(col("pos"), col("x")))`.
    * One shared instance — same plan-equality rule as TopK.udaf (r15).
    */
  lazy val udaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(aggregator)
}
