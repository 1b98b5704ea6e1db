package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins graft.Bench's episode-detection pieces (BenchDetect) without a
  * Spark session or real IO load: synthetic /proc/stat text stands in
  * for the host, synthetic timing maps for the capture. The scenario
  * test at the bottom is the r15 acceptance case — a capture taken
  * during an induced steady IO episode must flag its victims even
  * though every rep inflated equally (the signature the r14 driver
  * capture evaded).
  */
class BenchDetectSpec extends AnyFunSuite {
  import BenchDetect._

  private val statQuiet =
    """cpu  1000 50 300 8000 20 10 5 0 0 0
      |cpu0 250 12 75 2000 5 2 1 0 0 0
      |intr 12345
      |ctxt 67890
      |procs_running 3
      |procs_blocked 0""".stripMargin

  // 1000 jiffies later: 600 of them iowait (a 60% IO episode)
  private val statBusy =
    """cpu  1150 50 400 7800 620 10 5 0 0 0
      |procs_running 9
      |procs_blocked 4""".stripMargin

  test("parseProcStat extracts iowait/idle/total/procs_running") {
    val s = parseProcStat(statQuiet).get
    assert(s.iowait == 20)
    assert(s.idle == 8000)
    assert(s.total == 1000 + 50 + 300 + 8000 + 20 + 10 + 5 + 0)
    assert(s.procsRunning == 3)
  }

  test("parseProcStat degrades to None on malformed input") {
    assert(parseProcStat("").isEmpty)
    assert(parseProcStat("cpu  notanumber").isEmpty)
    assert(parseProcStat("cpu0 1 2 3 4 5 6 7 8").isEmpty) // no aggregate line
  }

  test("parseProcStat tolerates a missing procs_running line") {
    val s = parseProcStat("cpu  1 2 3 4 5 6 7 8 0 0").get
    assert(s.procsRunning == 0L)
    assert(s.iowait == 5L)
  }

  test("iowaitFrac is the iowait share of elapsed jiffies") {
    val a = parseProcStat(statQuiet).get
    val b = parseProcStat(statBusy).get
    val f = iowaitFrac(a, b)
    // delta: iowait 600, total (1150+50+400+7800+620+10+5) - 9385 = 650
    assert(math.abs(f - 600.0 / 650.0) < 1e-12)
  }

  test("iowaitFrac reads 0 on an empty or inverted window") {
    val a = parseProcStat(statQuiet).get
    assert(iowaitFrac(a, a) == 0.0)
    val b = parseProcStat(statBusy).get
    assert(iowaitFrac(b, a) == 0.0) // inverted = no evidence, not load
  }

  test("within-run: warm reps disagreeing > 3x flag; warm-up alone never does") {
    // cache warm-up (slow rep 1, tight reps 2..3) is NOT an episode
    assert(withinRunSuspects(Seq("warmup" -> Seq(30.0, 1.0, 1.1))).isEmpty)
    // warm reps 2..3 disagree 10x: host interfered mid-run
    assert(withinRunSuspects(Seq("spike" -> Seq(1.0, 10.0, 1.0))) == Seq("spike"))
    // later rep 6.9x the cold rep (the r9 x10 signature)
    assert(withinRunSuspects(
      Seq("x10" -> Seq(3.18, 21.9, 9.9))) == Seq("x10"))
    // needs >= 3 clean reps: short or failed runs are never flagged
    assert(withinRunSuspects(Seq("short" -> Seq(1.0, 10.0))).isEmpty)
    assert(withinRunSuspects(
      Seq("failed" -> Seq(1.0, Double.NaN, 10.0))).isEmpty)
  }

  test("quiet-floor: flags only over-floor AND elevated-iowait together") {
    val floors = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0)
    val io = Map("a" -> 0.30, "b" -> 0.01, "c" -> 0.30, "d" -> 0.30)
    val mins = Map(
      "a" -> 2.5, // over floor, high iowait -> flag
      "b" -> 2.5, // over floor, quiet window -> the slowness is not IO's
      "c" -> 1.5, // within 2x of floor -> normal jitter
      "d" -> 9.9) // no floor (suite growth) -> never flagged
    assert(quietFloorSuspects(mins, floors, io) == Seq("a"))
  }

  test("quiet-floor boundaries are strict where the docs say so") {
    val floors = Map("q" -> 1.0)
    val io = Map("q" -> 0.05)
    // exactly 2x the floor is NOT over it; iowait exactly 0.05 counts
    assert(quietFloorSuspects(Map("q" -> 2.0), floors, io).isEmpty)
    assert(quietFloorSuspects(Map("q" -> 2.0001), floors, io) == Seq("q"))
    assert(quietFloorSuspects(
      Map("q" -> 3.0), floors, Map("q" -> 0.0499)).isEmpty)
    // degenerate floors/values never flag
    assert(quietFloorSuspects(Map("q" -> -1.0), floors, io).isEmpty)
    assert(quietFloorSuspects(Map("q" -> 3.0), Map("q" -> 0.0), io).isEmpty)
  }

  test("scenario: a steady IO episode self-identifies in the capture") {
    // Induced steady load: every query's 3 reps inflated ~3x equally —
    // the within-run signatures see tight warm reps and stay silent
    // (exactly how the driver's r14 112 s capture read) ...
    val runs = Seq(
      "x15_ivf_pq" -> Seq(5.1, 5.0, 5.2),
      "x14_ann_recall" -> Seq(3.0, 2.9, 3.0),
      "p3_translate" -> Seq(0.40, 0.39, 0.40))
    assert(withinRunSuspects(runs).isEmpty)
    // ... but the quiet floors prove the same binary runs 3x faster on
    // a quiet host, and the synthetic stat injector shows the window
    // spent 60% in iowait: the victims are named mechanically.
    val io = {
      val f = iowaitFrac(parseProcStat(statQuiet).get, parseProcStat(statBusy).get)
      runs.map { case (k, _) => k -> f }.toMap
    }
    val floors = Map(
      "x15_ivf_pq" -> 1.70, "x14_ann_recall" -> 1.00, "p3_translate" -> 0.13)
    val mins = runs.map { case (k, ts) => k -> ts.min }.toMap
    assert(quietFloorSuspects(mins, floors, io) ==
      Seq("p3_translate", "x14_ann_recall", "x15_ivf_pq"))
    // the same capture on a quiet host (iowait ~1%) flags nothing:
    // over-floor alone is not evidence
    val quietIo = runs.map { case (k, _) => k -> 0.01 }.toMap
    assert(quietFloorSuspects(mins, floors, quietIo).isEmpty)
  }

  test("loadQuietFloors reads the committed baseline and rejects junk") {
    val tmp = java.nio.file.Files.createTempFile("qb", ".json")
    java.nio.file.Files.write(tmp,
      """{"metric":"quiet_baseline","queries":{"q1":0.5,"q2":1.25,"bad":"x"}}"""
        .getBytes("UTF-8"))
    val fl = loadQuietFloors(tmp.toString).get
    assert(fl == Map("q1" -> 0.5, "q2" -> 1.25)) // non-numeric entries dropped
    assert(loadQuietFloors("/nonexistent/qb.json").isEmpty)
    val junk = java.nio.file.Files.createTempFile("qb2", ".json")
    java.nio.file.Files.write(junk, "not json".getBytes("UTF-8"))
    assert(loadQuietFloors(junk.toString).isEmpty)
    // the real committed baseline parses and covers the suite
    val real = loadQuietFloors("QUIET_BASELINE.json")
    assert(real.exists(_.size > 100))
  }
}
