package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r15 stride-literal oracle guard: every declared window's
  * exclusive bound is straddled (pure counts), the route window's
  * constant is re-derived from the dispatch arithmetic, and the
  * Verify-path integration is driven against tiny synthetic parquet
  * dirs on both sides of the PQ family's boundary.
  */
class OracleWindowsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def counts(m: (String, Long)*): String => Long = {
    val mm = m.toMap
    t => mm.getOrElse(t, fail(s"query read unexpected table '$t'"))
  }

  test("every window straddles: bound-1 passes, bound fails with the boundary named") {
    for ((q, ws) <- OracleWindows.byQuery) {
      // the TIGHTEST window per table is what a rising row count hits
      // first (x12e holds two windows on `documents`)
      val tightest = ws.groupBy(_.table).view
        .mapValues(_.minBy(_.maxRowsExclusive)).toMap
      for ((table, w) <- tightest) {
        val others = tightest.keys.filterNot(_ == table).map(_ -> 0L).toSeq
        assert(OracleWindows.violation(q,
          counts((table -> (w.maxRowsExclusive - 1)) +: others: _*)).isEmpty,
          s"$q should be valid just under $table's tightest bound")
        val msg = OracleWindows.violation(q,
          counts((table -> w.maxRowsExclusive) +: others: _*))
        assert(msg.isDefined, s"$q should fail at $table's tightest bound")
        assert(msg.get.contains(q) && msg.get.contains(table) &&
          msg.get.contains(w.maxRowsExclusive.toString),
          s"message must name query, table and bound: ${msg.get}")
      }
    }
  }

  test("unregistered queries are never guarded") {
    assert(OracleWindows.violation("q1_agg",
      _ => fail("must not read any footer")).isEmpty)
  }

  test("stride bounds match the integer-division rules they guard") {
    // max(L, n/k) == L iff n < (L+1)k — the first widening count
    def firstWidening(l: Long, k: Long): Long =
      Iterator.iterate((l + 1) * k - 2)(_ + 1)
        .find(n => math.max(l, n / k) != l).get
    assert(firstWidening(50, 4096) == 51L * 4096)
    assert(firstWidening(50, 256) == 51L * 256)
    assert(firstWidening(25, 2048) == 26L * 2048)
  }

  test("the x12d route window constant is the dispatch arithmetic's own boundary") {
    // smallest n where the default pair ceiling routes away from exact
    def pairs(n: Long) = BigInt(n / 10) * BigInt(n - n / 10)
    val bound = Iterator.iterate(33000L)(_ + 1)
      .find(n => pairs(n) > BigInt(100000000L)).get
    assert(bound == 33337L)
    assert(pairs(33336L) == BigInt(99999999L))
    val w = OracleWindows.byQuery("x12d_hybrid_auto").head
    assert(w.maxRowsExclusive == bound && w.table == "documents")
  }

  test("Verify-path integration: a synthetic dir straddles the PQ boundary") {
    val root = java.nio.file.Files.createTempDirectory("graft_ow").toString
    // footerRowCount only reads record counts — schema is irrelevant
    val inside = s"$root/inside"
    val outside = s"$root/outside"
    spark.range(13055).write.parquet(s"$inside/embeddings.parquet")
    spark.range(13056).write.parquet(s"$outside/embeddings.parquet")
    def check(dir: String) = OracleWindows.violation("d16_pq_adc",
      t => Tables.footerRowCount(spark, dir, t))
    assert(check(inside).isEmpty,
      "13,055 embeddings sit inside the PQ literal's window")
    val msg = check(outside)
    assert(msg.isDefined, "13,056 embeddings must trip the guard")
    assert(msg.get.contains("13056") && msg.get.contains("embeddings"))
    graft.operators.Scratch.deleteRecursively(new java.io.File(root))
  }
}
