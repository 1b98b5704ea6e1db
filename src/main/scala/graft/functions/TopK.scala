package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k per group as a typed Aggregator — the scale-correct shape
  * of "rank ≤ k per key".
  *
  * The window formulation (`row_number() over (partition by k order by s)
  * <= k`) sorts every group's full row set after shuffling it; this
  * aggregator keeps a bounded buffer per key with map-side combine, so at
  * most k rows per key *per input partition* cross the shuffle, and nothing
  * is ever fully sorted. At 100 TB (ANN top-k over billions of candidate
  * pairs) that is the difference between a shuffle of k·partitions rows
  * and a shuffle of the entire candidate set.
  *
  * Ties break on ascending id (matching d5's `orderBy(cos desc, vec_id)`).
  */
object TopK {

  type Scored = (Double, Long) // (score, id)

  /** Keep the k largest by (score desc, id asc). */
  def aggregator(k: Int): Aggregator[Scored, List[Scored], Seq[Scored]] =
    new Aggregator[Scored, List[Scored], Seq[Scored]] {

      private def better(a: Scored, b: Scored): Boolean =
        a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

      private def trim(xs: List[Scored]): List[Scored] =
        xs.sortWith(better).take(k)

      override def zero: List[Scored] = Nil
      override def reduce(b: List[Scored], a: Scored): List[Scored] =
        trim(a :: b) // bounded: never holds more than k+1
      override def merge(b1: List[Scored], b2: List[Scored]): List[Scored] =
        trim(b1 ::: b2)
      override def finish(r: List[Scored]): Seq[Scored] = r.sortWith(better)
      override def bufferEncoder: Encoder[List[Scored]] = Encoders.kryo[List[Scored]]
      override def outputEncoder: Encoder[Seq[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    }

  def udaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(aggregator(k))
}
