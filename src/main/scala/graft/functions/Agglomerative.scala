package graft.functions

/** Complete-linkage agglomerative clustering with a flat cut at distance t —
  * the reference's `linkage(..., 'complete')` + `fcluster(t, 'distance')`
  * (SURVEY C3, RGPs.ipynb:2671,2712 cells 85-88).
  *
  * Deliberately driver-side: the reference clusters N≈5k insertions, for
  * which an O(N²)-memory Lance-Williams pass is fine. The 100 TB-scale path
  * is MinHash-LSH bucketing + GraphX connected components (see
  * PipelineOps/GraphFallback) — this exact-linkage kernel stays for
  * reference-fidelity on collected condensed distances.
  */
object Agglomerative {

  /** Cluster items 0..n-1 given a symmetric distance lookup; returns the
    * flat cluster label per item (labels are 1-based, ordered by first
    * item index — deterministic, unlike scipy's leaf ordering).
    */
  def completeLinkageCut(n: Int, dist: (Int, Int) => Double, t: Double): Array[Int] = {
    // active cluster -> member list; pairwise complete-linkage distance map
    val members = scala.collection.mutable.Map[Int, List[Int]]()
    (0 until n).foreach(i => members(i) = List(i))
    val d = Array.ofDim[Double](n, n)
    for (i <- 0 until n; j <- i + 1 until n) { d(i)(j) = dist(i, j); d(j)(i) = d(i)(j) }
    val active = scala.collection.mutable.LinkedHashSet[Int]((0 until n): _*)

    var merged = true
    while (merged && active.size > 1) {
      // find the closest active pair (deterministic scan order)
      var bi = -1; var bj = -1; var bd = Double.PositiveInfinity
      val act = active.toArray
      for (x <- act.indices; y <- x + 1 until act.length) {
        val (i, j) = (act(x), act(y))
        if (d(i)(j) < bd) { bd = d(i)(j); bi = i; bj = j }
      }
      if (bd <= t) {
        // merge bj into bi; complete linkage: new dist = max of the two
        members(bi) = members(bi) ++ members(bj)
        members.remove(bj)
        active.remove(bj)
        active.foreach { k =>
          if (k != bi) {
            val nd = math.max(d(bi)(k), d(bj)(k))
            d(bi)(k) = nd; d(k)(bi) = nd
          }
        }
      } else merged = false
    }

    val labels = new Array[Int](n)
    var next = 1
    members.toSeq.sortBy(_._2.min).foreach { case (_, ms) =>
      ms.foreach(labels(_) = next)
      next += 1
    }
    labels
  }
}
