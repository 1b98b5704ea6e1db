package graft

import graft.functions.Sketches
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {

  private def shingles(text: String): Seq[String] =
    text.toLowerCase.split(" +").filter(_.nonEmpty).sliding(2).map(_.mkString(" ")).toSeq.distinct

  test("string hash is stable and portable") {
    assert(Sketches.stringHash("abc") == (('a' * 31L + 'b') * 31 + 'c') % 1000000007L)
    assert(Sketches.stringHash("abc") == Sketches.stringHash("abc"))
    assert(Sketches.stringHash("abc") != Sketches.stringHash("abd"))
  }

  test("minhash: identical sets -> identical signatures") {
    val a = Sketches.minHash(Seq("x y", "y z", "z w"), 32)
    val b = Sketches.minHash(Seq("z w", "x y", "y z"), 32) // order-free
    assert(a.sameElements(b))
  }

  test("minhash similarity estimates Jaccard") {
    val base = (1 to 100).map(i => s"tok$i")
    val near = (1 to 90).map(i => s"tok$i") ++ (1 to 10).map(i => s"other$i")
    val far = (1 to 100).map(i => s"zzz$i")
    val sBase = Sketches.minHash(base, 128)
    val sNear = Sketches.minHash(near, 128)
    val sFar = Sketches.minHash(far, 128)
    def sim(x: Array[Long], y: Array[Long]) =
      x.zip(y).count { case (a, b) => a == b }.toDouble / x.length
    assert(sim(sBase, sNear) > 0.6)  // true Jaccard ≈ 0.82
    assert(sim(sBase, sFar) < 0.15)  // true Jaccard = 0
  }

  test("lsh bands: planted near-duplicates collide on >=1 band") {
    val doc = "the quick brown fox jumps over the lazy dog again and again " +
      "for a very long while until the day ends and night falls over town"
    val dup = doc.replace("quick", "quik") // one shingle-local edit
    val b1 = Sketches.bandKeys(Sketches.minHash(shingles(doc), 32), 4)
    val b2 = Sketches.bandKeys(Sketches.minHash(shingles(dup), 32), 4)
    assert(b1.zip(b2).exists { case (x, y) => x == y },
      "near-duplicate must share at least one LSH band")
    val other = "completely different content about spark catalyst plans " +
      "and shuffle partitions with no overlap whatsoever in any token pair"
    val b3 = Sketches.bandKeys(Sketches.minHash(shingles(other), 32), 4)
    assert(!b1.zip(b3).exists { case (x, y) => x == y },
      "unrelated docs must not collide on all bands")
  }

  test("simhash: near-duplicates are close in Hamming space") {
    val toks = (1 to 200).map(i => s"w$i")
    val near = (1 to 195).map(i => s"w$i") ++ (1 to 5).map(i => s"u$i")
    val far = (1 to 200).map(i => s"v$i")
    val h = Sketches.simHash(toks)
    assert(Sketches.hammingDistance(h, Sketches.simHash(near)) <= 10)
    assert(Sketches.hammingDistance(h, Sketches.simHash(far)) > 10)
    assert(Sketches.hammingDistance(h, h) == 0)
  }

  test("hyperplane signature: identical vectors share buckets, scale-invariant") {
    val v = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val v2 = v.map(_ * 3.0f) // same direction -> same signs
    val opp = v.map(-_)
    assert(Sketches.hyperplaneSignature(v, 12) == Sketches.hyperplaneSignature(v2, 12))
    assert(Sketches.hyperplaneSignature(v, 12) !=
      Sketches.hyperplaneSignature(opp, 12))
  }
}
