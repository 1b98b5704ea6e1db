package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** d9 / d9b / t5 checked against naive in-memory references on seeded
  * random corpora (small vocabulary + planted copies force heavy n-gram
  * sharing). The Spark plans are distributed digest-keyed aggregations;
  * the references here are the obvious quadratic/dictionary forms — any
  * divergence in tokenization, gram windows, dup detection, island
  * merging, or ratio arithmetic fails the comparison.
  */
class DupSpansBruteForceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val n = 6 // must match d9/d9b

  private def toks(text: String): Array[String] =
    text.toLowerCase.split(" ").filter(_.nonEmpty)

  private def grams(ts: Array[String], k: Int): Seq[String] =
    if (ts.length < k) Seq.empty
    else (0 to ts.length - k).map(i => ts.slice(i, i + k).mkString(" "))

  private def corpus(seed: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val fresh = (0 until 24).map { i =>
      i.toLong -> Seq.fill(rnd.nextInt(21))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    // planted copies: shared prefixes force cross-doc duplicate grams
    val copies = (0 until 6).map { j =>
      val src = fresh(rnd.nextInt(fresh.size))._2
      val cut = math.min(toks(src).length, n + rnd.nextInt(4))
      (100L + j) -> (toks(src).take(cut) ++
        Seq.fill(rnd.nextInt(4))(vocab(rnd.nextInt(vocab.size)))).mkString(" ")
    }
    fresh ++ copies
  }

  private def writeCorpus(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_dupbf").toString
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("d9 equals the naive dictionary reference on random corpora") {
    for (seed <- Seq(1, 2, 3)) {
      val docs = corpus(seed)
      val dir = writeCorpus(docs)
      val byDoc = docs.map { case (id, t) => id -> grams(toks(t), n) }
      val docsPerGram = byDoc.flatMap { case (id, gs) => gs.map(_ -> id) }
        .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size }
      val expected = byDoc.map { case (id, gs) =>
        val dupPos = gs.count(g => docsPerGram(g) > 1)
        val dupGrams = gs.distinct.count(g => docsPerGram(g) > 1)
        val ratio = if (gs.nonEmpty) dupPos.toDouble / gs.size else 0.0
        id -> ((gs.size.toLong, dupPos.toLong, dupGrams.toLong, ratio))
      }.toMap
      val got = SparkEntry.queries("d9_dup_ngram_spans")(spark, dir).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
        .toMap
      assert(got == expected, s"d9 mismatch at seed $seed")
    }
  }

  test("d9b equals the naive interval-merge reference on random corpora") {
    for (seed <- Seq(1, 2, 3)) {
      val docs = corpus(seed)
      val dir = writeCorpus(docs)
      val byDoc = docs.map { case (id, t) => id -> grams(toks(t), n) }
      val docsPerGram = byDoc.flatMap { case (id, gs) => gs.map(_ -> id) }
        .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size }
      val expected = byDoc.flatMap { case (id, gs) =>
        // 1-based start positions of duplicated grams, merged when the
        // next covered interval overlaps or touches the previous one
        val ps = gs.zipWithIndex.collect { case (g, i) if docsPerGram(g) > 1 => i + 1 }
        val islands = ps.foldLeft(List.empty[(Int, Int)]) {
          case ((s0, e0) :: rest, p) if p <= e0 + 1 => (s0, math.max(e0, p + n - 1)) :: rest
          case (acc, p) => (p, p + n - 1) :: acc
        }.reverse
        islands.map { case (s0, e0) =>
          (id, s0.toLong, e0.toLong, (e0 - s0 + 1).toLong)
        }
      }.sorted
      val got = SparkEntry.queries("d9b_dup_span_merge")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq.sorted
      assert(got == expected, s"d9b mismatch at seed $seed")
    }
  }

  test("t5 equals the naive frequency reference on random corpora") {
    for (seed <- Seq(1, 2, 3)) {
      val docs = corpus(seed)
      val dir = writeCorpus(docs)
      val expected = docs.map { case (id, t) =>
        val ts = toks(t)
        val bg = grams(ts, 2)
        val tg = grams(ts, 3)
        val topB = if (bg.isEmpty) 0L else bg.groupBy(identity).values.map(_.size).max.toLong
        val dupT = tg.groupBy(identity).values.filter(_.size > 1).map(_.size).sum.toLong
        id -> ((topB, bg.size.toLong,
          if (bg.nonEmpty) topB.toDouble / bg.size else 0.0,
          dupT, tg.size.toLong,
          if (tg.nonEmpty) dupT.toDouble / tg.size else 0.0))
      }.toMap
      val got = SparkEntry.queries("t5_repetition")(spark, dir).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getLong(4), r.getLong(5), r.getDouble(6))))
        .toMap
      assert(got == expected, s"t5 mismatch at seed $seed")
    }
  }
}
