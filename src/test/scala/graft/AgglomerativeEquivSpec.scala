package graft

import graft.functions.Agglomerative
import org.scalatest.funsuite.AnyFunSuite

/** The nearest-neighbor-list merge loop must reproduce the full
  * O(active²)-scan reference implementation exactly — same merges, same
  * tie-breaking, same labels — across random distance matrices.
  */
class AgglomerativeEquivSpec extends AnyFunSuite {

  /** The original full-scan implementation, kept verbatim as the oracle. */
  private def naiveCut(n: Int, dist: (Int, Int) => Double, t: Double): Array[Int] = {
    val members = scala.collection.mutable.Map[Int, List[Int]]()
    (0 until n).foreach(i => members(i) = List(i))
    val d = Array.ofDim[Double](n, n)
    for (i <- 0 until n; j <- i + 1 until n) { d(i)(j) = dist(i, j); d(j)(i) = d(i)(j) }
    val active = scala.collection.mutable.LinkedHashSet[Int]((0 until n): _*)
    var merged = true
    while (merged && active.size > 1) {
      var bi = -1; var bj = -1; var bd = Double.PositiveInfinity
      val act = active.toArray
      for (x <- act.indices; y <- x + 1 until act.length) {
        val (i, j) = (act(x), act(y))
        if (d(i)(j) < bd) { bd = d(i)(j); bi = i; bj = j }
      }
      if (bd <= t) {
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
      ms.foreach(labels(_) = next); next += 1
    }
    labels
  }

  test("labels equal the full-scan reference on random matrices") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 30) {
      val n = 2 + rnd.nextInt(40)
      // quantized distances force frequent exact ties
      val m = Array.ofDim[Double](n, n)
      for (i <- 0 until n; j <- i + 1 until n) {
        val v = rnd.nextInt(8) / 8.0
        m(i)(j) = v; m(j)(i) = v
      }
      val t = rnd.nextInt(9) / 8.0
      val got = Agglomerative.completeLinkageCut(n, (i, j) => m(i)(j), t)
      val want = naiveCut(n, (i, j) => m(i)(j), t)
      assert(got.toSeq == want.toSeq, s"trial=$trial n=$n t=$t")
    }
  }

  test("edge cases: n=0, n=1, no merges, all merge") {
    assert(Agglomerative.completeLinkageCut(0, (_, _) => 1.0, 0.5).isEmpty)
    assert(Agglomerative.completeLinkageCut(1, (_, _) => 1.0, 0.5).toSeq == Seq(1))
    assert(Agglomerative.completeLinkageCut(3, (_, _) => 1.0, 0.5).toSeq == Seq(1, 2, 3))
    assert(Agglomerative.completeLinkageCut(3, (_, _) => 0.0, 0.5).toSeq == Seq(1, 1, 1))
  }

  test("refuses n past the condensed-index overflow line before allocating") {
    val e = intercept[IllegalArgumentException] {
      Agglomerative.completeLinkageCut(65536, (_, _) => 1.0, 0.5)
    }
    assert(e.getMessage.contains("65535"))
    // the boundary itself would allocate ~17 GB, so only the guard is
    // exercised here; 65535 is accepted by the require (not tested at
    // full size)
  }
}
