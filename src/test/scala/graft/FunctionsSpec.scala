package graft

import graft.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {

  // --- VariationCodec (SURVEY P7/P8; pirateToDatabase.py:175-197) -------

  test("variation encode: identical sequences -> empty delta") {
    assert(VariationCodec.encode("ACGT", "ACGT") == "")
  }

  test("variation encode: first gap is absolute, later gaps relative") {
    // ref:  AAAAAAAAAAAAA    seq diffs at idx 2 (C) and idx 5 (G)
    val ref = "AAAAAAAAAAAAA"
    val seq = "AACAAGAAAAAAA"
    assert(VariationCodec.encode(seq, ref) == "2C3G")
  }

  test("variation decode applies cumulative offsets and strips gaps") {
    assert(VariationCodec.decode("2C3G", "AAAAAAAAAAAAA") == "AACAAGAAAAAAA")
    assert(VariationCodec.decode(null, "AC-GT") == "ACGT")
    assert(VariationCodec.decode("", "AC-GT") == "ACGT")
  }

  test("variation round-trip on random equal-length strings") {
    val rnd = new scala.util.Random(42)
    val alpha = "ACGT"
    (1 to 200).foreach { _ =>
      val n = 1 + rnd.nextInt(120)
      val ref = Array.fill(n)(alpha(rnd.nextInt(4))).mkString
      val seq = Array.fill(n)(alpha(rnd.nextInt(4))).mkString
      val enc = VariationCodec.encode(seq, ref)
      assert(VariationCodec.decode(enc, ref) == seq, s"seq=$seq ref=$ref enc=$enc")
    }
  }

  // --- Cai (SURVEY P10; extendingDB_FeatureAndStrainMetrics.py:45-68) ---

  test("cai: all-optimal codons give 1.0") {
    // GCT has weight 1.0; three codons -> exp((0+0+0)/2) = 1
    assert(Cai.caiForGene("GCTGCTGCT").contains(1.0))
  }

  test("cai: biopython (n-1) mean quirk") {
    // GCA weight 0.586 three times: exp(3*ln(0.586)/2) = 0.586^1.5
    val got = Cai.caiForGene("GCAGCAGCA").get
    assert(math.abs(got - math.pow(0.586, 1.5)) < 1e-12)
  }

  test("cai: ATG/TGG excluded, stops skipped") {
    // ATG skipped; GCA,GCG counted; TAA stop skipped
    val got = Cai.caiForGene("ATGGCAGCGTAA").get
    val want = math.exp((math.log(0.586) + math.log(0.424)) / 1.0)
    assert(math.abs(got - want) < 1e-12)
  }

  test("cai: non-multiple-of-3 raw sequence -> NaN path (reference fidelity)") {
    // The reference's filteredSeq is dead code; biopython sees the trailing
    // partial codon 'GC' -> illegal codon -> raise -> NaN
    assert(Cai.caiForGene("ATGGCAGCGTAAGC").isEmpty)
  }

  test("cai: N-containing sequence -> NaN path (reference fidelity)") {
    // 'NNN' is an illegal codon on the raw-sequence path -> raise -> NaN
    assert(Cai.caiForGene("GCANNNGCA").isEmpty)
    assert(Cai.caiForGene("GCAGCA").nonEmpty)
  }

  test("cai: single scored codon -> undefined (NaN path)") {
    assert(Cai.caiForGene("GCA").isEmpty)
  }

  test("gc content matches biopython GC") {
    assert(Cai.gcContent("ACGT") == 50.0)
    assert(Cai.gcContent("GGCC") == 100.0)
    assert(Cai.gcContent("AATT") == 0.0)
    assert(math.abs(Cai.gcContent("ACGTA") - 40.0) < 1e-12)
  }

  // --- Stats (SURVEY A17) ------------------------------------------------
  // Goldens: published two-sided critical values of the t distribution
  // (p = 0.05 / 0.01 rows of any standard t table).

  test("student-t CDF reproduces published critical values") {
    assert(math.abs(Stats.tTwoSidedP(12.706, 1) - 0.05) < 5e-4)
    assert(math.abs(Stats.tTwoSidedP(2.571, 5) - 0.05) < 5e-4)
    assert(math.abs(Stats.tTwoSidedP(2.228, 10) - 0.05) < 5e-4)
    assert(math.abs(Stats.tTwoSidedP(2.042, 30) - 0.05) < 5e-4)
    assert(math.abs(Stats.tTwoSidedP(3.169, 10) - 0.01) < 5e-4)
    assert(math.abs(Stats.tTwoSidedP(2.756, 29) - 0.01) < 5e-4)
  }

  test("student-t CDF edge behavior") {
    assert(Stats.tTwoSidedP(0.0, 7) == 1.0)
    assert(Stats.tTwoSidedP(-2.228, 10) == Stats.tTwoSidedP(2.228, 10))
    assert(Stats.tTwoSidedP(1.96, 1e6) - 0.05 < 5e-4) // -> normal limit
    assert(Stats.tTwoSidedP(Double.NaN, 5).isNaN)
  }

  test("welch df and t match hand-computed example") {
    // groups: m1=10, sd1=2, n1=20; m2=12, sd2=3, n2=30
    val t = Stats.welchT(10, 2, 20, 12, 3, 30)
    assert(math.abs(t - (-2.0 / math.sqrt(4.0 / 20 + 9.0 / 30))) < 1e-12)
    val df = Stats.welchDf(2, 20, 3, 30)
    val a = 4.0 / 20; val b = 9.0 / 30
    val want = (a + b) * (a + b) / (a * a / 19 + b * b / 29)
    assert(math.abs(df - want) < 1e-12)
    assert(Stats.welchTest(1, 1, 1, 2, 1, 30)._3.isNaN) // n1 < 2 -> NaN
  }

  // --- Newick (SURVEY A12) ----------------------------------------------

  test("newick patristic distances") {
    val idx = Newick.index("((A:1,B:2):3,C:4);")
    assert(idx.distance("A", "B") == 3.0)
    assert(idx.distance("A", "C") == 8.0)
    assert(idx.distance("B", "C") == 9.0)
    assert(idx.distance("A", "Z").isNaN)
  }

  test("newick distances for the DomainOps test tree") {
    val idx = Newick.index(graft.operators.DomainOps.TestTree)
    assert(idx.distance("click", "view") == 3.0)
    assert(idx.distance("click", "error") == 7.0)
    assert(idx.distance("purchase", "signup") == 4.0)
    assert(idx.distance("error", "purchase") == 10.0)
    assert(idx.distance("signup", "view") == 6.0)
  }

  test("newick round-trip on random trees: parse+index equals naive path sums") {
    // random multi-way trees, serialized to Newick and re-parsed; every
    // leaf-pair distance must equal a naive computation on the original
    // structure. Branch lengths are multiples of 0.25 so double sums are
    // exact and the comparison can be equality, not tolerance.
    final case class T(name: String, branch: Double, kids: List[T])
    val rnd = new scala.util.Random(5)
    def gen(leaves: List[String], depth: Int): T =
      if (leaves.size == 1) T(leaves.head, 0.25 * (1 + rnd.nextInt(8)), Nil)
      else {
        val k = if (leaves.size >= 3 && rnd.nextBoolean()) 3 else 2
        val shuffled = rnd.shuffle(leaves)
        val groups = shuffled.grouped(math.max(1, (leaves.size + k - 1) / k))
          .toList.filter(_.nonEmpty)
        T("", if (depth == 0) 0.0 else 0.25 * (1 + rnd.nextInt(8)),
          groups.map(gen(_, depth + 1)))
      }
    def ser(t: T): String =
      if (t.kids.isEmpty) s"${t.name}:${t.branch}"
      else t.kids.map(ser).mkString("(", ",", ")") + s":${t.branch}"
    def naiveDepths(t: T, d: Double, path: List[T],
        acc: scala.collection.mutable.Map[String, (Double, List[T])]): Unit = {
      val nd = d + t.branch
      if (t.kids.isEmpty) acc(t.name) = (nd, (t :: path).reverse)
      else t.kids.foreach(naiveDepths(_, nd, t :: path, acc))
    }
    for (_ <- 1 to 20) {
      val leaves = (0 until (3 + rnd.nextInt(12))).map(i => s"L$i").toList
      val tree = gen(leaves, 0)
      val idx = Newick.index(ser(tree).stripSuffix(":0.0") + ";")
      val acc = scala.collection.mutable.Map[String, (Double, List[T])]()
      naiveDepths(tree, 0.0, Nil, acc)
      for { a <- leaves; b <- leaves if a < b } {
        val (da, pa) = acc(a); val (db, pb) = acc(b)
        val shared = pa.zip(pb).takeWhile { case (x, y) => x eq y }
        val lcaDepth = shared.map(_._1.branch).sum
        val want = da + db - 2.0 * lcaDepth
        assert(idx.distance(a, b) == want, s"pair ($a,$b) in ${ser(tree)}")
      }
    }
  }

  // --- Agglomerative (SURVEY C3) -----------------------------------------

  test("complete linkage merges under the cut and stops above it") {
    // 1-D points at 0, 0.1, 5, 5.1, 20; cut t=1 -> {0,1}, {2,3}, {4}
    val pts = Array(0.0, 0.1, 5.0, 5.1, 20.0)
    val labels = Agglomerative.completeLinkageCut(
      5, (i, j) => math.abs(pts(i) - pts(j)), 1.0)
    assert(labels(0) == labels(1))
    assert(labels(2) == labels(3))
    assert(labels(0) != labels(2))
    assert(Set(labels(0), labels(2), labels(4)).size == 3)
  }

  test("complete linkage uses max-linkage, not single-linkage") {
    // chain 0,1,2 pairwise: d(0,1)=1, d(1,2)=1, d(0,2)=3; cut at 1.5:
    // single-linkage would merge all three; complete linkage must not.
    val d = Map((0, 1) -> 1.0, (1, 2) -> 1.0, (0, 2) -> 3.0)
    def dist(i: Int, j: Int) = d.getOrElse((math.min(i, j), math.max(i, j)), 0.0)
    val labels = Agglomerative.completeLinkageCut(3, dist, 1.5)
    assert(labels.distinct.length == 2)
  }
}
