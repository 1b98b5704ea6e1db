package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Tier-(c) planner extension (SURVEY §4, VERDICT r1 item 6): the G7
  * positional span join — pairs of rows sharing a chain key whose position
  * gap lies in [minGap, maxGap] (Cypher `-[:NEIGHBOUR*min..max]->` between
  * anchors, RGPs.ipynb:463-465) — as a first-class Catalyst operator:
  * LogicalPlan -> Strategy -> SparkPlan, injected via
  * SparkSessionExtensions.
  *
  * Why an operator instead of the builtin composition (GraphOps.spans):
  * Catalyst plans `a1 JOIN a2 ON user AND (pos2-pos1) BETWEEN l AND u` as a
  * sort-merge join on the user key with the band predicate as a *filter* —
  * every same-key pair is generated, O(k²) per chain, then filtered. This
  * exec keeps the equi-key distribution/ordering contract (so Catalyst
  * still inserts the single shuffle + sort) but merges the two sorted
  * streams with a binary-searched position window: O(k log k + output) per
  * chain. Same plan-level properties, strictly less work per partition —
  * the per-chain k² matters at 770-genome chains of ~6k features, and more
  * so at 100 TB corpora with hot keys.
  */
case class PathSpanJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftUser: Expression, rightUser: Expression,
    leftPos: Expression, rightPos: Expression,
    minGap: Long, maxGap: Long) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): PathSpanJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[PathSpanJoinPlan]] into [[PathSpanJoinExec]]; inert otherwise. */
object PathSpanJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: PathSpanJoinPlan =>
      PathSpanJoinExec(p.leftUser, p.rightUser, p.leftPos, p.rightPos,
        p.minGap, p.maxGap, planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

case class PathSpanJoinExec(
    leftUser: Expression, rightUser: Expression,
    leftPos: Expression, rightPos: Expression,
    minGap: Long, maxGap: Long,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  /** Same contract as a shuffled equi-join on the chain key: Catalyst's
    * EnsureRequirements inserts one hash shuffle per side (or none when
    * the child is already partitioned) plus the in-partition sort.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftUser)) :: ClusteredDistribution(Seq(rightUser)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftUser, Ascending), SortOrder(leftPos, Ascending)),
      Seq(SortOrder(rightUser, Ascending), SortOrder(rightPos, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftUser, Ascending), SortOrder(leftPos, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lUserB = BindReferences.bindReference(leftUser, left.output)
    val rUserB = BindReferences.bindReference(rightUser, right.output)
    val lPosB = BindReferences.bindReference(leftPos, left.output)
    val rPosB = BindReferences.bindReference(rightPos, right.output)
    val keyType = leftUser.dataType
    val outAttrs = output
    val (minG, maxG) = (minGap, maxGap)
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val lKeyProj = UnsafeProjection.create(Seq(lUserB))
      val rKeyProj = UnsafeProjection.create(Seq(rUserB))
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(keyType))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      def posOf(bound: Expression)(row: InternalRow): Long =
        bound.eval(row).asInstanceOf[Number].longValue
      new SpanJoinIterator(li, ri, lKeyProj, rKeyProj,
        posOf(lPosB), posOf(rPosB), minG, maxG, keyOrd, resultProj)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): PathSpanJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Group-wise merge of two (key, pos)-sorted streams. Buffers one right
  * chain at a time (bounded by chain length — the same working set a
  * window function over the chain holds) and binary-searches the
  * [pos+minGap, pos+maxGap] window per left row.
  */
private[plans] final class SpanJoinIterator(
    lIter: Iterator[InternalRow], rIter: Iterator[InternalRow],
    lKeyProj: UnsafeProjection, rKeyProj: UnsafeProjection,
    lPos: InternalRow => Long, rPos: InternalRow => Long,
    minGap: Long, maxGap: Long,
    keyOrd: BaseOrdering,
    resultProj: UnsafeProjection) extends Iterator[InternalRow] {

  private val l = lIter.buffered
  private val r = rIter.buffered
  private val joined = new JoinedRow

  private var rKey: UnsafeRow = _
  private var rPosArr: Array[Long] = Array.emptyLongArray
  private var rRows: Array[InternalRow] = Array.empty
  private var rExhausted = false

  private var curLeft: InternalRow = _
  private var cur = 0
  private var hi = 0

  private def loadRightGroup(): Unit = {
    // NULL chain keys never join (builtin === semantics); ascending sort
    // puts them first, so skip them before opening a group.
    while (r.hasNext && rKeyProj(r.head).anyNull) r.next()
    if (!r.hasNext) { rExhausted = true; rKey = null; return }
    rKey = rKeyProj(r.head).copy()
    val posB = Array.newBuilder[Long]
    val rowB = Array.newBuilder[InternalRow]
    var cont = true
    while (cont && r.hasNext) {
      // group boundary via the same ordering used for left-right matching
      // (UnsafeRow byte equality can split keys whose distinct binary
      // forms compare equal under the natural ordering)
      if (keyOrd.compare(rKeyProj(r.head), rKey) == 0) {
        val row = r.next()
        posB += rPos(row)
        rowB += row.copy()
      } else cont = false
    }
    rPosArr = posB.result()
    rRows = rowB.result()
  }

  /** First index with arr(i) >= target. */
  private def lowerBound(arr: Array[Long], target: Long): Int = {
    var lo = 0; var hi = arr.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr(mid) < target) lo = mid + 1 else hi = mid
    }
    lo
  }

  private def advance(): Boolean = {
    while (l.hasNext) {
      val lrow = l.next()
      val lkey = lKeyProj(lrow)
      if (!lkey.anyNull) { // NULL keys never join
        if (rKey == null && !rExhausted) loadRightGroup()
        while (rKey != null && keyOrd.compare(rKey, lkey) < 0) loadRightGroup()
        if (rKey != null && keyOrd.compare(rKey, lkey) == 0) {
          val p = lPos(lrow)
          cur = lowerBound(rPosArr, p + minGap)
          hi = lowerBound(rPosArr, p + maxGap + 1) // inclusive upper bound
          if (cur < hi) { curLeft = lrow.copy(); return true }
        }
      }
    }
    false
  }

  override def hasNext: Boolean = cur < hi || advance()

  override def next(): InternalRow = {
    if (!hasNext) throw new NoSuchElementException("empty span-join iterator")
    val out = resultProj(joined(curLeft, rRows(cur)))
    cur += 1
    out
  }
}

object PathSpanJoin {

  /** The operator API: rows of `left` paired with rows of `right` sharing
    * the chain key, with rightPos − leftPos in [minGap, maxGap] (bounds
    * inclusive, matching `.between`). Position columns must be integral.
    * Requires [[PathSpanJoinStrategy]] in the session (via
    * [[graft.functions.GraftExtensions]] or [[register]]).
    */
  def spanJoin(
      left: DataFrame, right: DataFrame,
      leftUser: String, leftPos: String,
      rightUser: String, rightPos: String,
      minGap: Long, maxGap: Long): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    // PathSpanJoinPlan is not a Join, so the analyzer never dedups
    // conflicting exprIds between the sides (self-join case). Re-alias the
    // right side whenever its output shares an exprId with the left —
    // otherwise resultProj would bind right attributes to the left ordinal
    // and silently mirror left values.
    val rPlan = {
      val r0 = right.queryExecution.analyzed
      val lIds = lPlan.output.map(_.exprId).toSet
      if (r0.output.exists(a => lIds.contains(a.exprId)))
        org.apache.spark.sql.catalyst.plans.logical.Project(
          r0.output.map(a => Alias(a, a.name)()), r0)
      else r0
    }
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${p.output.map(_.name).mkString(", ")}"))
    val (lp, rp) = (attr(lPlan, leftPos), attr(rPlan, rightPos))
    require(Seq(lp, rp).forall(a =>
      a.dataType == LongType || a.dataType == IntegerType),
      s"span-join positions must be int/long, got ${lp.dataType}/${rp.dataType}")
    GraftSqlShim.ofRows(left.sparkSession,
      PathSpanJoinPlan(lPlan, rPlan,
        attr(lPlan, leftUser), attr(rPlan, rightUser), lp, rp, minGap, maxGap))
  }

  /** Add the strategy to an already-running session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(PathSpanJoinStrategy))
      spark.experimental.extraStrategies = cur :+ PathSpanJoinStrategy
  }
}
