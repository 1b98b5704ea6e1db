package graft

/** Validity windows for oracle rows whose DuckDB SQL hardcodes a
  * stride or route literal that the Spark side derives from parquet
  * footer counts.
  *
  * Why (r15): the ANN/retrieval oracles re-derive entire indexes in
  * DuckDB with the stride as a LITERAL (50 / 25), which is correct
  * because every footer-count stride rule floors at that literal below
  * a documented table size (e.g. `max(50, footer/4096)` reads 50 below
  * 51·4096 rows). If a future testdata generation crosses a boundary,
  * the Spark stride widens, the oracle's doesn't, and the round's
  * correctness gate would report a bare hash mismatch with nothing
  * pointing at the real cause. [[Verify]] consults this registry
  * before running each query and fails LOUDLY with the boundary named
  * — the Spark result would still be correct; it is the ORACLE text
  * that stops covering the configuration.
  *
  * Bounds are EXCLUSIVE first-failing row counts, integer-division
  * exact: `max(L, n/k)` leaves the literal L iff `n/k <= L` iff
  * `n < (L+1)·k`. OracleWindowsSpec pins each one by straddling it.
  */
object OracleWindows {

  final case class OWindow(table: String, maxRowsExclusive: Long, rule: String)

  private val ivfEmb = OWindow("embeddings", 51L * 4096,
    "IVF coarse stride max(50, footer/4096): the oracle's literal 50 " +
      "holds only below 51*4096 = 208,896 rows")
  private val pqEmb = OWindow("embeddings", 51L * 256,
    "PQ codebook stride max(50, footer/256) (the 256-codeword 8-bit " +
      "cap): the oracle's literal 50 holds only below 51*256 = 13,056 rows")
  private val ivfDocs = OWindow("documents", 51L * 4096,
    "x12 IVF coarse stride max(50, footer/4096): the oracle's literal " +
      "50 holds only below 51*4096 = 208,896 rows")
  private val pqDocs = OWindow("documents", 51L * 256,
    "x12e PQ codebook stride max(stride, footer/256): the oracle's " +
      "literal 50 holds only below 51*256 = 13,056 rows")
  private val chunkDocs = OWindow("documents", 26L * 2048,
    "x11 chunk-centroid stride max(25, footer/2048): the oracle's " +
      "literal 25 holds only below 26*2048 = 53,248 rows")
  // smallest n with (n/10)·(n − n/10) > 1e8 is 33,337 (n=33,336 gives
  // 3,333 × 30,003 = 99,999,999); assumes the DEFAULT
  // graft.x12.maxExactDensePairs — a session overriding the ceiling
  // changes the route and must not trust the x12d oracle either way
  private val routeDocs = OWindow("documents", 33337L,
    "x12d's oracle pins the EXACT dense leg, which the dispatch picks " +
      "only while (n/10)*(n - n/10) <= 1e8 (default ceiling); first " +
      "failing count is 33,337 documents")

  val byQuery: Map[String, Seq[OWindow]] = Map(
    "d7_ann_ivf" -> Seq(ivfEmb),
    "d13_semdedup" -> Seq(ivfEmb),
    "x10_embedding_curation" -> Seq(ivfEmb),
    "x14_ann_recall" -> Seq(ivfEmb),
    "x15_ivf_pq" -> Seq(ivfEmb, pqEmb),
    "d16_pq_adc" -> Seq(pqEmb),
    "x12c_hybrid_ivf" -> Seq(ivfDocs),
    "x12e_hybrid_ivfpq" -> Seq(ivfDocs, pqDocs),
    "x12d_hybrid_auto" -> Seq(routeDocs),
    "x11_rag_retrieval" -> Seq(chunkDocs))

  /** First violated window's message for `query` at the footer counts
    * `rowCount` reports; None when inside every window or unregistered.
    */
  def violation(query: String, rowCount: String => Long): Option[String] =
    byQuery.getOrElse(query, Nil).iterator.flatMap { w =>
      val n = rowCount(w.table)
      if (n >= w.maxRowsExclusive)
        Some(s"oracle validity window exceeded for $query: table " +
          s"'${w.table}' has $n rows >= ${w.maxRowsExclusive}. ${w.rule}. " +
          "The Spark plan is still correct at this size — widen the " +
          "ORACLE's stride/route literal (or use testdata inside the " +
          "window) before trusting a hash compare.")
      else None
    }.take(1).toList.headOption
}
