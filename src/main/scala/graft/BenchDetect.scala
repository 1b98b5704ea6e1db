package graft

/** Pure, injectable pieces of [[Bench]]'s episode detection.
  *
  * Why this exists (r15): the host's contention noise arrives in
  * minutes-long iowait episodes. Bench's two original signatures
  * compare reps WITHIN a run, so a steady episode that inflates all
  * back-to-back reps equally evades them — the driver's r14 capture
  * was 35% inflated in aggregate (x15 at 3.0× its quiet value) yet
  * self-flagged only one query. The fix is host-state evidence: sample
  * `/proc/stat` around every query and flag any query that is BOTH
  * far above its known quiet floor (QUIET_BASELINE.json, maintained by
  * tools/quiet_baseline.py) AND ran under elevated iowait — inflation
  * with a named mechanical cause, visible in the capture itself.
  *
  * Everything here is a pure function of strings/numbers so
  * BenchDetectSpec can drive it with synthetic /proc/stat text and
  * synthetic timings — no Spark session, no real IO load needed.
  */
object BenchDetect {

  /** One `/proc/stat` reading, in jiffies. `total` spans the first
    * eight cpu fields (user nice system idle iowait irq softirq
    * steal); guest time is already included in user/nice on Linux.
    */
  final case class CpuSample(iowait: Long, idle: Long, total: Long,
      procsRunning: Long)

  /** Parse `/proc/stat` content. None on malformed input (a capture
    * must degrade to "no host evidence", never crash the bench).
    */
  def parseProcStat(text: String): Option[CpuSample] = {
    val lines = text.linesIterator.toList
    lines.find(_.startsWith("cpu ")).flatMap { l =>
      val f = l.trim.split("\\s+").drop(1).flatMap(_.toLongOption)
      if (f.length < 5) None
      else {
        val running = lines.find(_.startsWith("procs_running"))
          .flatMap(_.trim.split("\\s+").lift(1)).flatMap(_.toLongOption)
          .getOrElse(0L)
        Some(CpuSample(iowait = f(4), idle = f(3),
          total = f.take(8).sum, procsRunning = running))
      }
    }
  }

  /** Best-effort live reading; None off-Linux or on read failure. */
  def sampleHost(): Option[CpuSample] =
    try parseProcStat(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("/proc/stat")),
      java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => None }

  /** Fraction of the elapsed jiffies spent in iowait between two
    * samples. 0.0 when the window is empty/inverted (clock weirdness
    * must read as "no evidence", not as load).
    */
  def iowaitFrac(before: CpuSample, after: CpuSample): Double = {
    val dt = after.total - before.total
    if (dt <= 0) 0.0
    else (after.iowait - before.iowait).toDouble / dt
  }

  /** The two original within-run signatures (moved verbatim from
    * Bench.main, r12): (a) WARM reps (2..N) disagreeing by > 3×
    * among themselves — work only shrinks after warm-up, so warm reps
    * of a deterministic query are tight unless the host interfered;
    * (b) a later rep running > 3× the COLD first rep. Requires all
    * reps present (>= 3, no failures); caching can produce a fast
    * rep 2+, never a slow one, so neither signature false-positives
    * on warm-up.
    */
  def withinRunSuspects(runs: Seq[(String, Seq[Double])]): Seq[String] =
    runs.collect { case (k, ts)
        if ts.forall(t => !t.isNaN && t > 0) && ts.size >= 3 &&
          (ts.tail.max / ts.tail.min > 3.0 || ts.tail.max > 3.0 * ts.head) =>
      k
    }

  /** The r15 quiet-floor clause: a query whose best rep is still more
    * than `ratio` × its QUIET_BASELINE floor, measured while the host
    * spent at least `iowaitMin` of the query's window in iowait, is an
    * episode victim — the floor proves the same binary ran that fast
    * on a quiet host, and the iowait names the interference. Queries
    * without a floor (suite growth) or without host evidence are never
    * flagged by this clause.
    *
    * Thresholds: quiet captures measure ~0-2% iowait and their worst
    * per-query ratio vs the r14 baseline was 1.48×; the r14 episode
    * capture carried 2.4-3.0× inflations. 2× + 5% sits between the
    * regimes with margin on both sides.
    */
  def quietFloorSuspects(mins: Map[String, Double],
      floors: Map[String, Double], iowaitByQuery: Map[String, Double],
      ratio: Double = 2.0, iowaitMin: Double = 0.05): Seq[String] =
    mins.toSeq.sortBy(_._1).collect {
      case (k, m)
          if m > 0 && floors.get(k).exists(f => f > 0 && m > ratio * f) &&
            iowaitByQuery.get(k).exists(_ >= iowaitMin) =>
        k
    }

  /** Extract the per-query floors from QUIET_BASELINE.json using the
    * Jackson shipped with Spark — None if the file is absent or
    * unparseable (the clause then reports "not checked", distinct
    * from "checked and clean").
    */
  def loadQuietFloors(path: String): Option[Map[String, Double]] =
    try {
      val f = new java.io.File(path)
      if (!f.isFile) None
      else {
        val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
        val qs = root.get("queries")
        if (qs == null || !qs.isObject) None
        else {
          val it = qs.properties().iterator()
          val b = Map.newBuilder[String, Double]
          while (it.hasNext) {
            val e = it.next()
            if (e.getValue.isNumber) b += (e.getKey -> e.getValue.asDouble())
          }
          Some(b.result())
        }
      }
    } catch { case _: Throwable => None }
}
