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

  private val FallbackConfKey =
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
  private val SparkDefault = "128"

  /** Threshold [[ensureHashAggCapacity]] raises the session to: 2^20
    * groups per task. TopK state is ~(k+1)·16 B per group plus map
    * overhead, so a FULL map at this threshold is on the order of
    * 100–200 MB per task — bounded, unlike the unbounded collect_list
    * buffers the Spark default protects against. A workload with more
    * than ~1M distinct groups PER TASK should pre-partition on the
    * group key instead (each task then sees only its own groups).
    */
  val RaisedFallbackThreshold: Int = 1 << 20

  /** ObjectHashAggregateExec (the physical operator behind every typed
    * Aggregator UDAF) falls back to SORT-BASED aggregation the moment a
    * task's hash map exceeds `spark.sql.objectHashAggregate.sortBased.
    * fallbackThreshold` distinct keys — Spark's default is 128, sized
    * for aggregation buffers that grow without bound (collect_list).
    * For [[aggregator]] the fallback is pure loss: the buffer is
    * bounded at k entries by construction, and the fallback SORTS the
    * full remaining input by group key — the exact full-candidate sort
    * this Aggregator exists to avoid. Measured at the 30× retrieval
    * crossover: the dense leg's ~2B-row candidate stream spilled 31 GB
    * of sort runs to disk because the query side held 15k > 128 groups
    * (scaling_x12_out.json / the x12diag stage dump).
    *
    * Call before building a TopK aggregation. Respects an explicit
    * session override: only a session still at Spark's default is
    * raised (a user who deliberately re-set the default value is
    * indistinguishable from one who never touched it — documented
    * trade; set any other value to opt out).
    */
  def ensureHashAggCapacity(spark: org.apache.spark.sql.SparkSession): Unit =
    if (spark.conf.get(FallbackConfKey, SparkDefault) == SparkDefault)
      spark.conf.set(FallbackConfKey, RaisedFallbackThreshold.toString)

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
