package graft

import graft.functions.{Cai, Sketches, VariationCodec}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5 item 2 — property-based invariants of the scalar kernels,
  * exercised with seeded ScalaCheck generators (deterministic runs).
  */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(for { a <- g1; b <- g2 } yield (a, b))(f.tupled)

  private def forAll[A, B, C](g1: Gen[A], g2: Gen[B], g3: Gen[C])(f: (A, B, C) => Unit): Unit =
    forAll(for { a <- g1; b <- g2; c <- g3 } yield (a, b, c))(f.tupled)

  private val dnaGen: Gen[String] =
    Gen.chooseNum(0, 200).flatMap(n => Gen.stringOfN(n, Gen.oneOf('A', 'C', 'G', 'T')))

  private def pairGen: Gen[(String, String)] = for {
    n <- Gen.chooseNum(1, 150)
    a <- Gen.stringOfN(n, Gen.oneOf('A', 'C', 'G', 'T'))
    b <- Gen.stringOfN(n, Gen.oneOf('A', 'C', 'G', 'T'))
  } yield (a, b)

  test("P7∘P8: decode(encode(seq, ref), ref) == seq for equal-length DNA") {
    forAll(pairGen) { case (seq, ref) =>
      assert(VariationCodec.decode(VariationCodec.encode(seq, ref), ref) == seq)
    }
  }

  test("P7: encoding against itself is always empty") {
    forAll(dnaGen) { s =>
      assert(VariationCodec.encode(s, s) == "")
    }
  }

  test("P9: GC content is bounded and complement-symmetric") {
    forAll(dnaGen) { s =>
      val gc = Cai.gcContent(s)
      assert(gc >= 0.0 && gc <= 100.0)
      val complement = s.map {
        case 'A' => 'T'; case 'T' => 'A'; case 'G' => 'C'; case 'C' => 'G'
      }
      assert(math.abs(Cai.gcContent(complement) - gc) < 1e-9)
    }
  }

  test("minhash band keys: equal token sets always collide on every band") {
    val toksGen = Gen.nonEmptyListOf(Gen.identifier.map(_.take(8)))
    forAll(toksGen) { toks =>
      val b1 = Sketches.bandKeys(Sketches.minHash(toks, 32), 4)
      val b2 = Sketches.bandKeys(Sketches.minHash(scala.util.Random.shuffle(toks), 32), 4)
      assert(b1.sameElements(b2))
    }
  }

  test("simhash hamming distance is a pseudo-metric") {
    val toksGen = Gen.listOf(Gen.identifier.map(_.take(6)))
    forAll(toksGen, toksGen, toksGen) { (a, b, c) =>
      val (ha, hb, hc) = (Sketches.simHash(a), Sketches.simHash(b), Sketches.simHash(c))
      assert(Sketches.hammingDistance(ha, ha) == 0)
      assert(Sketches.hammingDistance(ha, hb) == Sketches.hammingDistance(hb, ha))
      assert(Sketches.hammingDistance(ha, hc) <=
        Sketches.hammingDistance(ha, hb) + Sketches.hammingDistance(hb, hc))
    }
  }

  test("A1: exact stddev formula matches two-pass computation") {
    val xsGen = Gen.nonEmptyListOf(Gen.chooseNum(-1000.0, 1000.0))
    forAll(xsGen) { xs =>
      if (xs.length >= 2) {
        val n = xs.length.toDouble
        val m = xs.sum / n
        val twoPass = math.sqrt(xs.map(x => (x - m) * (x - m)).sum / (n - 1))
        val s1 = xs.sum
        val s2 = xs.map(x => x * x).sum
        val powerSums = math.sqrt(math.max((s2 - s1 * s1 / n) / (n - 1), 0.0))
        assert(math.abs(twoPass - powerSums) < 1e-6 * math.max(1.0, twoPass))
      }
    }
  }

  test("Dice and Jaccard: bounds, symmetry, and the Dice≥Jaccard inequality") {
    val setGen = Gen.listOf(Gen.chooseNum(0, 50)).map(_.toSet)
    forAll(setGen, setGen) { (a, b) =>
      if (a.nonEmpty || b.nonEmpty) {
        val inter = (a & b).size.toDouble
        val dice = 2 * inter / (a.size + b.size)
        val jaccard = inter / (a | b).size
        assert(dice >= 0 && dice <= 1 && jaccard >= 0 && jaccard <= 1)
        assert(dice + 1e-12 >= jaccard) // dice = 2j/(1+j) ≥ j
        val diceBA = 2 * (b & a).size.toDouble / (b.size + a.size)
        assert(math.abs(dice - diceBA) < 1e-12)
      }
    }
  }

  test("T8: chunk spans tile [0, n) with exact 16-token overlaps") {
    // scalar mirror of the t8_chunk_spans arithmetic (64 window / 48
    // stride): K = ceil((n-64)/48) by non-negative floor division
    forAll(Gen.chooseNum(1, 5000)) { n =>
      val k = (math.max(n - 64, 0) + 47) / 48
      val spans = (0 to k).map(i => (i * 48, math.min(i * 48 + 64, n)))
      assert(spans.head._1 == 0 && spans.last._2 == n)
      spans.foreach { case (s, e) => assert(s < e && e - s <= 64) }
      spans.sliding(2).filter(_.size == 2).foreach { w =>
        val (Seq((_, e1), (s2, e2))) = (w: @unchecked)
        assert(e1 - s2 == 16, s"n=$n: overlap ${e1 - s2}")
        assert(e2 > e1)
      }
      // exact-16 overlaps + endpoints pinned above => full cover, no
      // chunk contained in another; total length is then determined:
      assert(spans.map { case (s, e) => e - s }.sum == n + 16 * k)
    }
  }

  test("T6: hash-Bernoulli sampler keeps everything at quota and is antitone in group size") {
    val p = 1000000007L
    def h(id: Long) = ((id % p) * 2654435761L + 2246822519L) % p
    forAll(Gen.chooseNum(0L, 10000000L), Gen.chooseNum(1L, 100000L),
      Gen.chooseNum(1L, 100000L)) { (id, quota, extra) =>
      // cnt == quota: h < p always => every doc of the smallest group kept
      assert(h(id) * quota < quota * p)
      // keep predicate is antitone in cnt: dropped at cnt stays dropped at cnt+extra
      val cnt = quota + extra
      if (h(id) * cnt >= quota * p) assert(h(id) * (cnt + extra) >= quota * p)
    }
  }
}
