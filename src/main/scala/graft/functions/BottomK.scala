package graft.functions

import scala.collection.immutable.TreeSet

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k DISTINCT longs per group as a typed Aggregator — the KMV /
  * theta-sketch carrier (K-minimum-values: Bar-Yossef et al. 2002; the
  * theta-sketch framework: Dasgupta et al. 2016): the k smallest distinct
  * hashes of a set are a uniform sample of the set's hash space, so
  * sketch unions/intersections estimate distinct-set overlap without ever
  * shuffling the sets themselves.
  *
  * Unlike reservoir samples (and unlike d19's Misra-Gries counter
  * VALUES), bottom-k of a set is a pure function of the input SET:
  * order- and merge-order-independent, hence exactly reproducible
  * cross-engine — the oracle re-derives every sketch entry, not just a
  * law. Map-side combine ships ≤ k longs per group per partition. The
  * buffer is an immutable TreeSet (sorted ascending, dedups on insert),
  * so take(k) IS the k smallest.
  */
object BottomK {

  def aggregator(k: Int): Aggregator[Long, TreeSet[Long], Seq[Long]] = {
    require(k > 0, s"BottomK k must be positive, got $k")
    new Aggregator[Long, TreeSet[Long], Seq[Long]] {
      override def zero: TreeSet[Long] = TreeSet.empty[Long]
      override def reduce(b: TreeSet[Long], a: Long): TreeSet[Long] =
        if (b.size >= k && a >= b.max) b
        else {
          val nb = b + a
          if (nb.size > k) nb.take(k) else nb
        }
      override def merge(b1: TreeSet[Long], b2: TreeSet[Long]): TreeSet[Long] = {
        val u = b1 ++ b2
        if (u.size > k) u.take(k) else u
      }
      override def finish(r: TreeSet[Long]): Seq[Long] = r.toSeq // ascending
      override def bufferEncoder: Encoder[TreeSet[Long]] =
        Encoders.kryo[TreeSet[Long]]
      override def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    }
  }

  /** Memoized per k — same plan-equality rule as TopK.udaf (r15): a
    * fresh Aggregator instance per call defeats CacheManager's
    * sameResult on every frame whose subtree contains the UDAF
    * (d23's sketch SharedFrame rebuilt per bench rep without this).
    */
  private val udafCache = new java.util.concurrent.ConcurrentHashMap[
    Int, org.apache.spark.sql.expressions.UserDefinedFunction]()

  def udaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udafCache.computeIfAbsent(k,
      kk => org.apache.spark.sql.functions.udaf(aggregator(kk)))
}
