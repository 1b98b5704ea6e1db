package graft

import graft.functions.Cai
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The distributed (quantized-log relational) CAI must agree with the
  * scalar reference [[Cai.caiForGene]] — same Biopython NaN rules, values
  * within the documented ≤ ~1e-9 quantization bound — on random DNA and
  * every edge the scalar specs pin (empty, partial codon, N codon,
  * all-skipped, single scored codon).
  */
class CaiRelationalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def viaExpr(seqs: Seq[String], caiExpr: String): Map[String, Option[Double]] = {
    import spark.implicits._
    graft.functions.GraftExtensions.registerInto(spark)
    seqs.zipWithIndex.map { case (s, i) => (i.toString, s) }
      .toDF("id", "dna")
      .select(col("id"), col("dna"), expr(caiExpr).as("cai"))
      .collect()
      .map(r => r.getString(1) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
  }

  private def relational(seqs: Seq[String]): Map[String, Option[Double]] =
    viaExpr(seqs, Cai.caiQuantizedSql("dna"))

  test("edge cases match caiForGene's NaN rules exactly") {
    val cases = Seq(
      "",                 // empty -> 1.0 (n = 0 path)
      "GCTGCTGCT",        // all-optimal -> 1.0
      "GCAGCAGCA",        // (n-1) mean quirk
      "ATGGCAGCGTAA",     // ATG skipped, TAA stop skipped
      "ATGGCAGCGTAAGC",   // trailing partial codon -> None
      "GCANNNGCA",        // N codon -> None
      "GCA",              // single scored codon -> None
      "ATGTGG",           // only skipped codons -> n = 0 -> 1.0
      "TAATAGTGA")        // only stops -> n = 0 -> 1.0
    val got = relational(cases)
    cases.foreach { s =>
      val want = Cai.caiForGene(s)
      (got(s), want) match {
        case (None, None)       => ()
        case (Some(a), Some(b)) =>
          assert(math.abs(a - b) <= 5e-9, s"seq=$s rel=$a scalar=$b")
        case (a, b) => fail(s"seq=$s null-disagreement: rel=$a scalar=$b")
      }
    }
  }

  test("cai_quantized kernel is BIT-identical to the relational SQL form") {
    val rnd = new scala.util.Random(13)
    val seqs = ((1 to 120).map { _ =>
      val n = rnd.nextInt(150)
      Array.fill(n)("ACGT"(rnd.nextInt(4))).mkString
    } ++ Seq("", "GCTGCTGCT", "GCAGCAGCA", "ATGGCAGCGTAA", "ATGGCAGCGTAAGC",
      "GCANNNGCA", "GCA", "ATGTGG", "TAATAGTGA", "acgtacgt")).distinct
    val rel = relational(seqs)
    val ker = viaExpr(seqs, "cai_quantized(dna)")
    seqs.foreach { s =>
      assert(ker(s) == rel(s), s"seq=$s kernel=${ker(s)} relational=${rel(s)}")
    }
    // interpreted path agrees with codegen
    val interp = graft.functions.CaiQuantizedExpr(
      org.apache.spark.sql.catalyst.expressions.Literal("GCAGCAGCA")).eval(null)
    assert(Option(interp).map(_.asInstanceOf[Double]) == ker("GCAGCAGCA"))
    // null propagates
    import spark.implicits._
    assert(Seq[Option[String]](None).toDF("dna")
      .select(expr("cai_quantized(dna)")).head().isNullAt(0))
  }

  test("random DNA agrees within the quantization bound") {
    val rnd = new scala.util.Random(7)
    val seqs = (1 to 150).map { _ =>
      val n = rnd.nextInt(120)
      Array.fill(n)("ACGT"(rnd.nextInt(4))).mkString
    }.distinct
    val got = relational(seqs)
    seqs.foreach { s =>
      val want = Cai.caiForGene(s)
      (got(s), want) match {
        case (None, None)       => ()
        case (Some(a), Some(b)) =>
          assert(math.abs(a - b) <= 5e-9, s"seq=$s rel=$a scalar=$b")
        case (a, b) => fail(s"seq=$s null-disagreement: rel=$a scalar=$b")
      }
    }
  }

  test("cai_native kernel is BIT-identical to the scalar caiForGene") {
    val rnd = new scala.util.Random(29)
    // random DNA with lowercase runs, N's, partial tails and gap chars —
    // the enrichment path's decode output domain plus its dirty edges
    val alphabet = "ACGTacgtN-"
    val seqs = ((1 to 200).map { _ =>
      val n = rnd.nextInt(140)
      Array.fill(n)(alphabet(rnd.nextInt(if (rnd.nextBoolean()) 4 else alphabet.length)))
        .mkString
    } ++ Seq("", "GCTGCTGCT", "GCAGCAGCA", "atggcagcgtaa", "ATGGCAGCGTAAGC",
      "GCANNNGCA", "GCA", "ATGTGG", "TAATAGTGA", "gcagcagca")).distinct
    val ker = viaExpr(seqs, "cai_native(dna)")
    seqs.foreach { s =>
      val want = Cai.caiForGene(s)
      assert(ker(s) == want, s"seq=$s kernel=${ker(s)} scalar=$want")
    }
    // interpreted path agrees with codegen; null propagates
    val interp = graft.functions.CaiNativeExpr(
      org.apache.spark.sql.catalyst.expressions.Literal("GCAGCAGCA")).eval(null)
    assert(Option(interp).map(_.asInstanceOf[Double]) == ker("GCAGCAGCA"))
    import spark.implicits._
    assert(Seq[Option[String]](None).toDF("dna")
      .select(expr("cai_native(dna)")).head().isNullAt(0))
  }

  test("enrichment projection has ZERO UDF boundaries") {
    // the plan contract for Pangenome.enrich's metric projection: decode,
    // GC and CAI are all native kernels, no UDF anywhere in the plan —
    // one whole-stage codegen span from input to metric frame
    graft.functions.GraftExtensions.registerInto(spark)
    // inputs hang off range's id (not literals): ConstantFolding would
    // evaluate an all-literal kernel chain away and leave nothing to assert
    val df = spark.range(1)
      .select(concat(col("id").cast("string"), lit("C")).as("Variation"),
        lit("GCA-GCAGCA").as("reference_sequence"))
      .withColumn("full_seq",
        expr("variation_decode_native(Variation, reference_sequence)"))
      .select(
        when(length(col("full_seq")) > 0, expr("gc_content_native(full_seq)")).as("GC"),
        expr("cai_native(full_seq)").as("CAI"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("gc_content_native") && plan.contains("cai_native")
      && plan.contains("variation_decode_native"))
    assert(!plan.contains("UDF"), plan)
    // and it computes: "0C" onto "GCA-GCAGCA" -> CCAGCAGCA after gap strip
    val row = df.head()
    assert(!row.isNullAt(0) && !row.isNullAt(1))
  }
}
