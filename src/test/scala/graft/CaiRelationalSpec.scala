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

  private def relational(seqs: Seq[String]): Map[String, Option[Double]] = {
    import spark.implicits._
    seqs.zipWithIndex.map { case (s, i) => (i.toString, s) }
      .toDF("id", "dna")
      .select(col("id"), col("dna"), expr(Cai.caiQuantizedSql("dna")).as("cai"))
      .collect()
      .map(r => r.getString(1) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
  }

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
}
