package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters summary (Misra & Gries 1982; merge rule from
  * Agarwal et al., "Mergeable Summaries", PODS 2012) as a typed
  * Aggregator — the frequency sibling of d17's HLL: a CONSTANT-SIZE
  * (≤ k counters) deterministic sketch with map-side combine, so at
  * 100 TB each input partition ships k (token, count) pairs instead of
  * its token stream, and the merged summary still carries the law every
  * data-mixing read needs: any token with true count > N/(k+1) survives,
  * and every counter undercounts by at most N/(k+1).
  *
  * Stream step (reduce): increment a held counter; else claim a free
  * slot; else decrement ALL k counters by one and drop zeros (the
  * "k+1-way cancellation" — each such step retires k+1 occurrences, so
  * it can happen at most N/(k+1) times). Merge: add counts pointwise,
  * then subtract the (k+1)-th largest value and drop non-positives —
  * PODS'12 proves the summed error stays ≤ N/(k+1).
  *
  * Counter VALUES depend on stream/merge order (unlike HLL), so oracled
  * queries must expose only order-insensitive facts (d19 exposes the
  * no-false-negative law: survivors ⊇ every token above the threshold);
  * the value error band is pinned in SketchLmCdcSpec where the stream
  * order is controlled.
  */
object MisraGries {

  type Summary = Map[String, Long]

  def aggregator(k: Int): Aggregator[String, Summary, Seq[(String, Long)]] =
    new Aggregator[String, Summary, Seq[(String, Long)]] {
      require(k >= 1, s"k must be positive, got $k")

      override def zero: Summary = Map.empty

      override def reduce(b: Summary, tok: String): Summary =
        b.get(tok) match {
          case Some(c)            => b.updated(tok, c + 1)
          case None if b.size < k => b.updated(tok, 1L)
          case None =>
            b.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
        }

      override def merge(a: Summary, c: Summary): Summary = {
        val comb = (a.keySet ++ c.keySet).iterator
          .map(t => t -> (a.getOrElse(t, 0L) + c.getOrElse(t, 0L))).toMap
        if (comb.size <= k) comb
        else {
          val kth = comb.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
          comb.flatMap { case (t, cnt) =>
            if (cnt - kth > 0) Some(t -> (cnt - kth)) else None
          }
        }
      }

      override def finish(m: Summary): Seq[(String, Long)] =
        m.toSeq.sortBy { case (t, c) => (-c, t) }

      override def bufferEncoder: Encoder[Summary] = Encoders.kryo[Summary]
      override def outputEncoder: Encoder[Seq[(String, Long)]] =
        ExpressionEncoder[Seq[(String, Long)]]()
    }

  /** Memoized per k — same plan-equality rule as TopK.udaf (r15). */
  private val udafCache = new java.util.concurrent.ConcurrentHashMap[
    Int, org.apache.spark.sql.expressions.UserDefinedFunction]()

  def udaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udafCache.computeIfAbsent(k,
      kk => org.apache.spark.sql.functions.udaf(aggregator(kk)))
}
