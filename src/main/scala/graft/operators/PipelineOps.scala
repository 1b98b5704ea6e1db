package graft.operators

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-data pipeline operators over `documents` / `embeddings` — the
  * 100 TB-scale extension surface (dedup, similarity search, text analysis,
  * multimodal plumbing). Design rules applied throughout:
  *
  *  - sketches (MinHash/SimHash/hyperplane-LSH) turn all-pairs O(N²) work
  *    into bucket-local candidate joins — the only shape that survives a
  *    billion-document corpus;
  *  - candidate verification recomputes the exact measure, so sketches can
  *    only lose recall, never precision;
  *  - every non-sketch operator is a single scan + hash agg / bucket join,
  *    no driver-side loops; doubles that cross the oracle boundary come
  *    from exact-integer arithmetic.
  */
object PipelineOps {

  /** Canonical text normalization shared by the dedup family. */
  private def norm(c: Column): Column =
    array_join(filter(split(trim(lower(c)), " "), x => x =!= ""), " ")

  /** Partition-level PNG synthesis: ONE reused `ImageWriter` per
    * partition ([[graft.functions.PngCodec.encodeBatch]]), not the
    * per-row `ImageIO.write` convenience path. An object-level val, not
    * a lambda at the call site: [[pngPayloads]]' two callers must build
    * CANONICALLY EQUAL plans for the CacheManager to dedupe the shared
    * frame, and `MapPartitions` plan equality compares the function
    * reference — a fresh closure per call would defeat it.
    */
  private val encodePartition: Iterator[Long] => Iterator[(Long, Array[Byte])] =
    graft.functions.PngCodec.encodeBatch

  /** The m-family's synthesized binary column, shared m3/m4 (lazy persist
    * or scratch via [[SharedFrame]]): payload generation is harness-only
    * — a real corpus READS its stored binary column rather than encoding
    * one per query — so the two multimodal queries share one
    * materialization instead of paying the PNG encode twice per bench
    * pass. Downstream of the `(doc_id, png)` pair everything is
    * payload-agnostic.
    */
  private def pngPayloads(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    import s.implicits._
    SharedFrame(
      T.documents(s, d).select(col("doc_id")).repartition(col("doc_id")).as[Long]
        .mapPartitions(encodePartition).toDF("doc_id", "png"),
      "m_png", d)
  }

  /** Stable function references for the other two modalities' payload
    * synthesis — object-level vals for the same CacheManager plan-equality
    * reason as [[encodePartition]].
    */
  private val synthContainers: Iterator[Long] => Iterator[(Long, Array[Byte])] =
    graft.functions.FrameContainer.synthesizePartition

  private val synthWavs: Iterator[Long] => Iterator[(Long, Array[Byte])] =
    _.map(id => (id, graft.functions.WavCodec.synthesize(id)))

  /** The m2b multi-frame container column, shared via [[SharedFrame]] for
    * the same reason as [[pngPayloads]]: payload generation is
    * harness-only (a real corpus READS its stored binary column), so it
    * materializes once per dataset instead of re-encoding per bench rep.
    */
  private def containerPayloads(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    import s.implicits._
    SharedFrame(
      T.documents(s, d).select(col("doc_id")).repartition(col("doc_id")).as[Long]
        .mapPartitions(synthContainers).toDF("doc_id", "container"),
      "m_container", d)
  }

  /** The m5 WAV payload column — same SharedFrame + repartition layout
    * as the PNG/container frames, so the decode stage fans out across
    * partitions. (Through r8 this frame deliberately stayed single-split
    * because the decoder went through `AudioSystem`'s synchronized
    * provider registry, which serializes concurrent decodes; the
    * registry-free RIFF parse in [[graft.functions.WavCodec.decode]]
    * removed that shared state, so the PNG partitioning rule applies
    * again.)
    */
  private def wavPayloads(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    import s.implicits._
    SharedFrame(
      T.documents(s, d).select(col("doc_id")).repartition(col("doc_id")).as[Long]
        .mapPartitions(synthWavs).toDF("doc_id", "wav"),
      "m_wav", d)
  }

  /** Untimed bench prep: force the three synthesized payload frames so
    * the timed m-family queries measure what the operators actually claim
    * — demux + decode + features — not ImageIO/RIFF *encode*, a cost no
    * real corpus pays at query time (it reads a stored binary column).
    * m2b at r6 spent ~10% of the whole bench encoding its own input;
    * Bench calls this during warmup so every timed rep reads the
    * materialized payloads. Verify is unaffected (oracles re-derive from
    * the closed forms either way).
    */
  def prepareMultimodalPayloads(s: org.apache.spark.sql.SparkSession, d: String): Unit = {
    pngPayloads(s, d).count(): Unit
    containerPayloads(s, d).count(): Unit
    wavPayloads(s, d).count(): Unit
  }

  /** t14's hashed-linear-classifier columns (n_toks, logit, score,
    * keep_flag) appended to any frame carrying (doc_id, text). Stateless
    * per-row projection — the same expressions gate a live stream
    * ([[graft.streaming.StreamingJobs.streamingClassifierGate]]), the
    * gopherFlags precedent. The weight table is a closed-form
    * deterministic stand-in for shipped fastText parameters (see the
    * t14 QueryDef comment); swapping real weights in means broadcasting
    * a (feature id -> weight) lookup frame instead of inlining the map.
    */
  def classifierScore(docs: DataFrame): DataFrame = {
    val D = 4096L // hashed feature space (fastText's bucket trick)
    val W = 2003L // weight modulus (prime): weights in [-1001, 1001]
    docs
      .withColumn("__cts",
        filter(split(lower(col("text")), " "), x => x =!= ""))
      .withColumn("n_toks", size(col("__cts")).cast("long"))
      .withColumn("logit", expr(
        s"""aggregate(
           |  transform(__cts, t ->
           |    (CAST(conv(substr(md5(t), 1, 8), 16, 10) AS BIGINT) % ${D}L
           |       * 2654435761L + 40503L) % ${W}L - ${(W - 1) / 2}L),
           |  0L, (acc, x) -> acc + x)""".stripMargin))
      .withColumn("score",
        when(col("n_toks") > 0,
          col("logit").cast("double") / col("n_toks"))
          .otherwise(lit(0.0)))
      .withColumn("keep_flag",
        when(col("logit") >= 0, 1).otherwise(0))
      .drop("__cts")
  }

  /** d18's content-defined chunk derivation as a STATELESS per-document
    * projection: (doc_id, chunk_idx, start, clen, dg) — cut positions
    * from the O(n) `window_hashes` kernel (w=8, hash ≡ 0 mod 64), span
    * arithmetic, substring chunks, 60-bit digests, text dropped the
    * moment the digest exists. No cross-row state, so the SAME frame
    * composes into a batch plan (d18's dedup accounting) or a streaming
    * plan ([[graft.streaming.StreamingJobs.streamingCdcChunks]] — the
    * gopherFlags/classifierGate precedent) unchanged.
    */
  def cdcChunks(docs: DataFrame): DataFrame = {
    graft.functions.GraftExtensions.registerInto(docs.sparkSession)
    docs
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"), length(col("text")).as("n"))
      .withColumn("cuts", expr(
        """filter(
          |  transform(window_hashes(text, 8),
          |    (h, i) -> IF(h % 64 = 0, CAST(i + 8 AS BIGINT), CAST(NULL AS BIGINT))),
          |  p -> p IS NOT NULL AND p < n)""".stripMargin))
      .withColumn("starts",
        expr("concat(array(CAST(1 AS BIGINT)), transform(cuts, p -> p + 1))"))
      .withColumn("ends", expr("concat(cuts, array(CAST(n AS BIGINT)))"))
      .select(col("doc_id"), col("text"),
        posexplode(expr("arrays_zip(starts, ends)")).as(Seq("ci", "se")))
      .select(col("doc_id"), col("text"), (col("ci") + 1).as("chunk_idx"),
        col("se.starts").as("start"),
        (col("se.ends") - col("se.starts") + 1).as("clen"))
      .withColumn("dg", expr(
        """CAST(conv(substr(md5(substring(text, CAST(start AS INT), CAST(clen AS INT))),
          |               1, 15), 16, 10) AS BIGINT)""".stripMargin))
      .drop("text") // digest computed — only doc_id/start/clen/dg ride the dg shuffle
  }

  /** The FULL BM25 score matrix: (qdoc, doc_id, score_q) with score_q
    * the 1e-6 fixed-pointed BM25 sum (exact int64 — see the d15
    * QueryDef comment for the rational rewrite). Since r15 this is the
    * shuffle strategy's internal stream only — every consumer goes
    * through [[bm25Top5]], which shares the top-5 head instead of
    * caching the matrix.
    *
    * `graft.bm25.maxDfFrac` (double in (0,1], default off) is the
    * standard stop-word/hot-term pruning every production BM25 engine
    * ships (Lucene's common-terms handling, WAND's upper-bound skips):
    * postings for terms whose document frequency exceeds frac·Nd are
    * dropped BEFORE the qterms×postings join — the candidate generator's
    * fan-out is the posting-list length, so the hottest terms (df≈Nd,
    * idf≈bit_length(1)=1, near-zero score contribution) are exactly the
    * ones that cost the most and discriminate the least. The cutoff is
    * integer-exact (df·1e6 ≤ round(frac·1e6)·Nd) so a given conf value
    * prunes the same term set on every run. Off by default: the oracled
    * d15 row scores the full postings list.
    */
  private def confMaxDfPpm(
      s: org.apache.spark.sql.SparkSession): Option[Long] =
    s.conf.getOption("graft.bm25.maxDfFrac").map { raw =>
      // name the conf key on a non-numeric value too — a bare
      // NumberFormatException("x") doesn't say which conf was bad
      val f = raw.trim.toDoubleOption.getOrElse(
        throw new IllegalArgumentException(
          s"graft.bm25.maxDfFrac must be a number in (0, 1], got '$raw'"))
      // fail fast at plan build: frac <= 0 would silently prune EVERY
      // posting and make empty retrieval results look like "no matches"
      require(f > 0 && f <= 1,
        s"graft.bm25.maxDfFrac must be in (0, 1], got $raw")
      math.round(f * 1e6)
    }

  private def bm25Scores(s: org.apache.spark.sql.SparkSession, d: String,
      maxDfPpm: Option[Long]): DataFrame = {
    // r15 cold-build rewrite (the r14 crossover measured this frame's
    // one-time build at 519-629 s at the 30x point — the retrieval
    // family's dominant cold term): tf and dl are PER-DOCUMENT facts,
    // and a document's tokens already live in one row, so the old
    // explode -> groupBy(doc_id, term) / groupBy(doc_id) pipeline
    // shuffled tens of millions of token rows to compute values each
    // row already held. Replaced with map-side sorted-run counting:
    // sort the token array, find run starts, emit (term, tf) pairs per
    // doc; dl = size(tokens). The tf/dl equi-join disappears with the
    // shuffles. Counts are exact integers either way, so every
    // downstream contrib/score — and the DuckDB oracle hash — is
    // bit-identical to the shuffled formulation. The only shuffles
    // left are the ones that genuinely cross documents: df
    // (groupBy term), the qterms x postings join, and the final
    // (qdoc, doc_id) aggregation.
    //
    // ANSI-safe run counting: element_at THROWS on index 0 /
    // out-of-bounds under spark.sql.ansi.enabled (the 4.x default), so
    // both edge lookups use try_element_at (null at the edges;
    // `i = 1 OR <null>` still admits the first run start — true OR
    // null = true).
    //
    // The sorted array and the run-start index array are bound as
    // one-element-`transform` lambda variables (`sa`, `starts`) — SQL's
    // only let-binding — NOT as withColumn aliases: Catalyst's
    // CollapseProject inlines chained projection aliases into the
    // downstream lambda bodies, re-evaluating sort_array / the
    // run-start scan PER ARRAY ELEMENT (measured 25 s for 4500 sf0.1
    // docs, ~30x the whole old build). A lambda variable is evaluated
    // exactly once per row by construction, optimizer-proof.
    val base = bm25Base(s, d)
    val perDoc = bm25PerDoc(base)
    val dfreq = perDoc.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // the df cap prunes the TERM dimension before the fan-out join (the
    // r15 upstream move): hot-term postings never enter the join's
    // probe at all, instead of being filtered out of its output
    val enriched = dfreq.crossJoin(broadcast(bm25Tot(base)))
    val kept = maxDfPpm.fold(enriched)(ppm =>
      enriched.filter(col("df") * lit(1000000L) <= lit(ppm) * col("nd")))
    val postings = bm25Contrib(perDoc.join(kept, Seq("term")))
      .select(col("term"), col("doc_id"), col("contrib"))
    bm25Qterms(s, d).join(postings, Seq("term"))
      .groupBy(col("qdoc"), col("doc_id"))
      .agg(sum(col("contrib")).as("score_q"))
  }

  private def bm25ToksCol: org.apache.spark.sql.Column =
    filter(split(lower(col("text")), " "), x => x =!= "")

  /** Corpus-side doc rows: (doc_id, ts). size > 0 matches the exploded
    * formulation — a tokenless doc contributed no tf/dl rows, so it
    * must not count toward nd/big_l either.
    */
  private def bm25Base(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    T.documents(s, d)
      .filter(col("doc_id") % 10 =!= 7)
      .select(col("doc_id"), bm25ToksCol.as("ts"))
      .filter(size(col("ts")) > 0)

  /** Map-side (doc_id, dl, term, tf) via per-doc sorted-run counting —
    * see the strategy comment in bm25Scores. The run-length arithmetic:
    * run length = next run start (or the end-of-array sentinel) - own
    * start; element_at(sa, st) is always in bounds (st from
    * sequence(1, size)) so the plain ANSI form is safe there.
    */
  private def bm25PerDoc(base: DataFrame): DataFrame = {
    val pairsExpr =
      """element_at(transform(array(sort_array(ts)), sa ->
        |  element_at(transform(array(filter(sequence(1, size(sa)),
        |                i -> i = 1 OR try_element_at(sa, i) != try_element_at(sa, i - 1))),
        |      starts ->
        |    zip_with(starts,
        |             concat(slice(starts, 2, size(starts)), array(size(sa) + 1)),
        |             (st, en) -> named_struct('term', element_at(sa, st),
        |                                      'tf', CAST(en - st AS BIGINT)))), 1)), 1)"""
        .stripMargin
    base
      .withColumn("dl", size(col("ts")).cast("long"))
      .withColumn("pairs", expr(pairsExpr))
      .select(col("doc_id"), col("dl"), explode(col("pairs")).as("p"))
      .select(col("doc_id"), col("dl"),
        col("p.term").as("term"), col("p.tf").as("tf"))
  }

  /** 1-row (big_l, nd) from the doc-level frame directly — no dl
    * shuffle (big_l = Σ size(ts), nd = doc count).
    */
  private def bm25Tot(base: DataFrame): DataFrame =
    base.agg(sum(size(col("ts")).cast("long")).as("big_l"),
      count(lit(1)).as("nd"))

  /** (qdoc, term), unique by construction: per-doc array_distinct makes
    * the old explode + global distinct() shuffle unnecessary.
    */
  private def bm25Qterms(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    T.documents(s, d)
      .filter(col("doc_id") % 10 === 7)
      .select(col("doc_id").as("qdoc"),
        explode(array_distinct(bm25ToksCol)).as("term"))

  /** Attaches idf + the exact-rational 1e-6 fixed-point contribution to
    * a frame carrying (tf, dl, df, big_l, nd) — see the d15 QueryDef
    * comment for the rational rewrite.
    */
  private def bm25Contrib(joined: DataFrame): DataFrame =
    joined
      .withColumn("idf",
        length(conv(expr("nd div df"), 10, 2)).cast("long"))
      .withColumn("contrib", floor(
        expr("CAST(idf * tf * 44 * big_l AS DOUBLE) / " +
          "(20 * big_l * tf + 6 * big_l + 18 * dl * nd)") *
          lit(1000000) + lit(0.5)).cast("long"))

  /** The shared top-5-per-query BM25 head (r15): EVERY consumer of the
    * scores frame (d15, d15b, the x12 family's lexical leg) reduces it
    * to top-5 per qdoc under the same (score DESC, doc ASC) tie-break,
    * so this — not the full (qdoc, doc) score matrix — is the frame
    * worth SharedFrame-ing: at the 30× crossover the full matrix was
    * ~0.5e9 rows and its build the retrieval family's dominant
    * one-time cold cost (18.6 GB shuffle + 17 GB spill measured); the
    * head is 5 rows per query.
    *
    * Two physical strategies, result-identical (RetrievalSpec pins the
    * equality law by running both on one fixture):
    *
    *  - shuffle (any scale): bm25Scores' term-keyed fan-out join +
    *    full (qdoc, doc) aggregation, then bounded-heap TopK — the
    *    Σ qf·df fan-out crosses the shuffle. The only safe plan when
    *    the query side itself is corpus-scale.
    *  - broadcast+combine (bounded query side): the query-term map and
    *    the query-vocabulary df rows broadcast; postings stay
    *    partitioned by DOCUMENT (they derive map-side from the scan),
    *    so every (qdoc, doc) sum completes inside its own partition
    *    and a mapPartitions combiner emits only each partition's local
    *    top-5 per query — the shuffle carries ≤ 5·|qdocs| rows per
    *    partition instead of the fan-out. mapPartitions is justified
    *    here by the guideline's own escape hatch: this is the
    *    two-level combine (sum on (qdoc, doc), then top-k on qdoc)
    *    that Catalyst cannot fuse across different grouping keys —
    *    expressed as two groupBys, the first exchange alone carries
    *    the full score matrix. Local sums are globally complete
    *    because a document's postings never leave their partition
    *    (both joins are broadcast; the explicit repartition is
    *    doc-row-atomic).
    *
    * Route: footer count ≤ `graft.bm25.maxBroadcastQueryDocs`
    * (default 500k docs — ≈130 MB of query-term broadcast at the %10
    * convention's worst case) takes the broadcast path; above it the
    * shuffle plan. Like every routed operator here the decision is a
    * deterministic function of snapshot + conf, zero plan-build jobs.
    */
  private def bm25Top5(s0: org.apache.spark.sql.SparkSession, d: String,
      maxDfPpm0: Option[Long]): DataFrame = {
    // the TopK group count is |qdocs| — far past the 128-key
    // ObjectHashAggregate valve; same scoped-session raise as x12
    val s = graft.functions.TopK.sessionWithHashAggCapacity(s0)
    val maxDfPpm = maxDfPpm0.orElse(confMaxDfPpm(s))
    val nd = T.footerRowCount(s, d, "documents")
    val bcastCeiling =
      confPosLong(s, "graft.bm25.maxBroadcastQueryDocs", 500000L)
    val topAgg =
      if (nd > bcastCeiling)
        bm25Scores(s, d, maxDfPpm)
          .groupBy(col("qdoc"))
          .agg(graft.functions.TopK.udaf(5)(
            col("score_q").cast("double"), col("doc_id")).as("top"))
      else {
        // per-task combiner state is the partition's distinct
        // (qdoc, doc) pairs; size the doc repartition so that stays
        // ~4M entries (~150 MB) from the footer-count worst case
        // (pairs ≤ (nd/10)·(9nd/10)), bounded to [shuffle
        // partitions, 4096]
        val shufP = s.sessionState.conf.numShufflePartitions
        val pairsEst = BigInt(nd / 10) * BigInt(nd - nd / 10)
        val nParts = (pairsEst / 4000000L)
          .max(BigInt(shufP)).min(BigInt(4096)).toInt
        val base = bm25Base(s, d).repartition(nParts)
        val perDoc = bm25PerDoc(base)
        val qterms = bm25Qterms(s, d)
        // df over the FULL corpus (semantics unchanged), but only the
        // query-vocabulary rows ride the broadcast — the corpus
        // vocabulary is unbounded, the query vocabulary is what the
        // route just bounded. Non-query terms never survive the
        // qterms join anyway, so dropping them early changes nothing.
        val dfreq = perDoc.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val qdf = dfreq
          .join(qterms.select(col("term")).distinct(), Seq("term"), "left_semi")
          .crossJoin(broadcast(bm25Tot(base)))
        val kept = maxDfPpm.fold(qdf)(ppm =>
          qdf.filter(col("df") * lit(1000000L) <= lit(ppm) * col("nd")))
        import s.implicits._
        val fanout = bm25Contrib(perDoc.join(broadcast(kept), Seq("term")))
          .join(broadcast(qterms), Seq("term"))
          .select(col("qdoc").as("_1"), col("doc_id").as("_2"),
            col("contrib").as("_3"))
          .as[(Long, Long, Long)]
        val localTop = fanout.mapPartitions { it =>
          val sums = scala.collection.mutable.LongMap
            .empty[scala.collection.mutable.LongMap[Long]]
          it.foreach { case (q, doc, c) =>
            val inner = sums.getOrElseUpdate(q,
              scala.collection.mutable.LongMap.empty[Long])
            inner(doc) = inner.getOrElse(doc, 0L) + c
          }
          sums.iterator.flatMap { case (q, inner) =>
            // bounded local top-5 by (score DESC, doc ASC) — the exact
            // order TopK applies globally; deterministic regardless of
            // map iteration order because (score, doc) is a total
            // order (doc unique within a partition's pair set)
            val top = new java.util.ArrayList[(Long, Long)](6)
            inner.foreach { case (doc, sc) =>
              var i = 0
              while (i < top.size && {
                  val (s0, d0) = top.get(i)
                  s0 > sc || (s0 == sc && d0 < doc)
                }) i += 1
              if (i < 5) {
                top.add(i, (sc, doc))
                if (top.size > 5) top.remove(5)
              }
            }
            (0 until top.size).iterator
              .map { i => val (sc, doc) = top.get(i); (q, doc, sc) }
          }
        }
        localTop.toDF("qdoc", "doc_id", "score_q")
          .groupBy(col("qdoc"))
          .agg(graft.functions.TopK.udaf(5)(
            col("score_q").cast("double"), col("doc_id")).as("top"))
      }
    SharedFrame(
      topAgg
        .select(col("qdoc"), posexplode(col("top")).as(Seq("rk0", "sc")))
        .select(col("qdoc"), (col("rk0") + 1).cast("int").as("rk"),
          col("sc._2").as("doc_id"), col("sc._1").cast("long").as("score_q")),
      // the df cap changes the frame's contents: key it so a session
      // toggling the conf never reads a stale cached variant
      maxDfPpm.fold("d15_top5")(ppm => s"d15_top5_df$ppm"), d)
  }

  /** x12's doc-level hashed bag-of-words embedding: (doc_id, q, nn) with
    * x11's exact-int64 16-dim projection applied to the WHOLE document
    * (no chunking — the fusion composite ranks documents). Map-side only.
    */
  private def docEmbed(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    SharedFrame(
      T.documents(s, d)
        .select(col("doc_id"),
          filter(split(lower(col("text")), " "), x => x =!= "").as("ts"))
        .filter(size(col("ts")) > 0)
        .withColumn("fids", expr(
          "transform(ts, t -> CAST(conv(substr(md5(t), 1, 8), 16, 10) AS BIGINT) % 1000003L)"))
        .withColumn("q", expr(
          """transform(sequence(0, 15), j ->
            |  aggregate(fids, 0L, (acc, f) ->
            |    acc + (f * 2654435761L + j * 97003999L) % 2003L - 1001L))""".stripMargin))
        .withColumn("nn", expr("long_dot(q, q)"))
        .filter(col("nn") > 0)
        .select(col("doc_id"), col("q"), col("nn")),
      "x12_docemb", d)

  /** Executable form of COVERAGE.md's retrieval-family decision rule
    * (r12 wrote the rule as prose + measured anchors; r13 makes it a
    * dispatch): the exact dense leg's candidate volume is
    * |queries| × |corpus| ≈ (Nd/10) · (9·Nd/10) — BOTH sides scale with
    * the corpus, the family's measured super-linear growth term — while
    * the IVF leg's search cost scales with list size. Route exact while
    * the pair product is at or below `graft.x12.maxExactDensePairs`
    * (default 1e8 — between the sf0.1 bench point at 2.25e6 pairs,
    * where exact is both fastest and the exactness anchor, and the 30×
    * crossover at 2.0e9 pairs, where exact read 71–78 s vs IVF 18.4 s
    * on the identical corpus; extrapolating the 30× rate puts the
    * default boundary at ~3–4 s of dense-leg work). Both cardinalities
    * come from the documents parquet FOOTERS (driver-side metadata,
    * zero Spark jobs at plan build — the d4/rgpMine de-eager contract),
    * and the %10 probe-set split is definitional, so the route is a
    * deterministic function of the snapshot + conf: on every test
    * corpus it resolves to "exact", which is what x12d's oracle pins.
    * The product is compared in BigInt — at 100 TB (Nd ~ 1e10) the
    * long product overflows, and a silently negative product would
    * route a trillion-pair corpus to the exact leg.
    *
    * The THIRD route (r14, closing the prose rule's last clause: "when
    * vectors no longer fit, move the dense leg to x15's IVF-PQ"): past
    * the pair boundary, compare the corpus's raw dense-vector bytes —
    * nCorpus × 16 dims × 8 B, the hashed doc embedding's exact storage
    * — against `graft.x12.maxIvfVectorBytes` (default 32 GiB). At or
    * below it the IVF leg's full-vector inverted lists are a
    * RAM-scale working set and exact-cosine-inside-lists is optimal;
    * above it the leg switches to `"pq"` — the same IVF pruning with
    * d16's 4-subspace PQ codes + ADC scoring inside the probed lists,
    * which shrinks the resident corpus 32× (4 small codes vs 16
    * int64s) at a bounded recall cost (x15's measured machinery). The
    * default sits between the largest corpus this engine has measured
    * (150k docs ≈ 19 MB of vectors — decisively IVF) and the
    * billion-vector regime the PQ literature targets (1e9 × 128 B =
    * 128 GB — decisively PQ). Same BigInt discipline: byte math on a
    * 100 TB footer count must not overflow-route.
    */
  /** Strict positive-long conf read shared by every consumer of the
    * retrieval-dispatch ceilings (denseLegAuto, the rehearsal's
    * hybrid_auto_route): a malformed or non-positive value FAILS with
    * the key named — a silent fallback to the default would record
    * routing evidence for a ceiling the operator never configured.
    */
  private[graft] def confPosLong(s: org.apache.spark.sql.SparkSession,
      key: String, dflt: Long): Long = s.conf.getOption(key)
    .map(raw => raw.trim.toLongOption.filter(_ > 0).getOrElse(
      throw new IllegalArgumentException(
        s"$key must be a positive integer, got '$raw'")))
    .getOrElse(dflt)

  /** The three-way decision rule ITSELF, factored out (r15) so the
    * production dispatch ([[denseLegAuto]]) and the rehearsal's
    * routing-evidence stage (CorpusRehearsal `hybrid_auto_route`) run
    * the SAME arithmetic — the rehearsal used to re-implement only the
    * pair clause with its own hardcoded default, so it could never
    * route to the pq leg and a future rule change would silently
    * diverge from the recorded evidence. The 16 × 8 B term is the
    * family's dense-embedding geometry (16 int64 dims per vector —
    * docEmbed and the rehearsal's embedQ share it).
    */
  private[graft] def denseLegRoute(nQueries: Long, nCorpus: Long,
      pairCeiling: Long, byteCeiling: Long): String =
    if (BigInt(nQueries) * BigInt(nCorpus) <= BigInt(pairCeiling)) "exact"
    else if (BigInt(nCorpus) * 16 * 8 <= BigInt(byteCeiling)) "ivf"
    else "pq"

  private[graft] def denseLegAuto(s: org.apache.spark.sql.SparkSession,
      d: String): String = {
    val pairCeiling = confPosLong(s, "graft.x12.maxExactDensePairs", 100000000L)
    val byteCeiling = confPosLong(s, "graft.x12.maxIvfVectorBytes", 34359738368L)
    val nd = T.footerRowCount(s, d, "documents")
    // r15: the `nd / 10` query cardinality is the CONVENTION of this
    // family's synthetic corpus (the doc_id % 10 === 7 probe slice),
    // not a law of the dispatch — on a production corpus the query set
    // lives outside the documents table and its cardinality is the
    // caller's knowledge. `graft.x12.queryCount` supplies it: when set,
    // the whole table is corpus and the conf is the query side; when
    // unset, the probe convention splits nd as before. The x12 family's
    // own query SET stays definitional either way — the conf only
    // feeds the routing arithmetic.
    val (nQueries, nCorpus) =
      s.conf.getOption("graft.x12.queryCount") match {
        case Some(_) => (confPosLong(s, "graft.x12.queryCount", 0L), nd)
        case None    => (nd / 10, nd - nd / 10)
      }
    denseLegRoute(nQueries, nCorpus, pairCeiling, byteCeiling)
  }

  /** x12/x12b/x12c's shared body: RRF fusion of the BM25 lexical leg
    * (d15's postings scores, optionally df-cap pruned — d15b's production
    * stop-word posture) and a dense leg chosen by `denseLeg`:
    *
    *  - `"exact"` — brute-force corpus × queries cosine (d5's baseline;
    *    oracle-exact by definition). Both sides scale with the corpus
    *    (queries are 10% of docs by this query's definition), so the leg
    *    is the fusion composite's measured super-linear growth term
    *    (scaling_x12_out.json: ~12.5× per 3× docs at the 30× point).
    *  - `"ivf"` — d7's inverted-file pruning dropped in as the dense
    *    leg: deterministic stride-sampled coarse centroids (bounded
    *    ≈ 4096 by the footer-count stride rule), every corpus doc
    *    assigned to its nearest list, queries probe their 2 nearest
    *    lists and run exact cosine + bounded-heap top-k INSIDE them —
    *    search cost scales with list size, not corpus size
    *    (scaling_x15_out.json measured the same swap at 57.0 s where
    *    the exact leg read 127.2 s on the identical 150k-doc corpus).
    *    Bounded recall: a true neighbor outside the probed lists is
    *    unseen; RRF semantics under misses are unchanged (lex-only
    *    docs keep dense_rk = 0, the x12b stop-word precedent).
    *  - `"pq"` — x15's IVF-PQ composition as the dense leg (r14):
    *    d7's 2-probe candidate generation UNCHANGED, but inside the
    *    probed lists candidates are scored by d16's asymmetric
    *    distance over 4-subspace PQ codes (each 4-dim subvector of
    *    the 16-dim embedding encoded as its nearest stride-sampled
    *    subspace centroid) instead of exact cosine — the resident
    *    corpus shrinks from 16 int64s to 4 small codes per doc, THE
    *    enabler when the vectors themselves no longer fit (Jégou et
    *    al. 2011). Ranking is (ADC distance ASC, doc_id ASC) —
    *    int64-exact end to end (quantized coords, squared L2 sums;
    *    the TopK double cast is exact below 2^53, far above any
    *    realistic ADC magnitude at 16 dims). Recall is bounded twice
    *    (probe misses + code approximation); RRF absorbs both the
    *    same way (dense_rk = 0).
    *
    * Factored so every composite is the SAME code modulo its two
    * parameters — the d15/d15b precedent applied twice.
    */
  private def hybridRetrieval(s0: org.apache.spark.sql.SparkSession, d: String,
      maxDfPpm: Option[Long], denseLeg: String = "exact"): DataFrame = {
    require(denseLeg == "exact" || denseLeg == "ivf" || denseLeg == "pq",
      s"denseLeg must be 'exact', 'ivf' or 'pq', got '$denseLeg'")
    // both TopK aggregations below group on the QUERY side — thousands
    // of groups per task, far past Spark's 128-key ObjectHashAggregate
    // fallback, which would silently SORT the full candidate stream
    // (measured: 31 GB of sort spill at the 30× point). The raise rides
    // a scoped session clone so the CALLER's session keeps the 128-key
    // valve for its unbounded object aggs (r13); the whole plan below is
    // built from the clone, which owns the conf at execution time.
    val s = graft.functions.TopK.sessionWithHashAggCapacity(s0)
    graft.functions.GraftExtensions.registerInto(s)
    val W = org.apache.spark.sql.expressions.Window
    // both legs' top-5 run through the bounded-heap TopK Aggregator
    // (d5b/d7's shape): at most 5 rows per (query, input partition)
    // cross the shuffle instead of sorting the full candidate set
    // per query. Tie-break (score DESC, id ASC) is TopK's contract,
    // identical to the window formulation; score_q < 2^53 so the
    // double cast is exact.
    val lex = bm25Top5(s, d, maxDfPpm)
      .select(col("qdoc"), col("doc_id"), col("rk").as("lex_rk"))
    val emb = docEmbed(s, d)
    val queries = emb.filter(col("doc_id") % 10 === 7)
      .select(col("doc_id").as("qdoc"), col("q").as("qq"), col("nn").as("qn"))
    val corpus = emb.filter(col("doc_id") % 10 =!= 7)
    val cosine =
      expr("long_dot(q, qq)").cast("double") /
        sqrt(col("qn").cast("double") * col("nn").cast("double"))
    // candidate generation is the legs' only difference; scoring,
    // top-k and fusion below are shared verbatim (the pq leg swaps the
    // SCORING too — ADC over codes instead of exact cosine). The footer
    // read is lazy and shared: the exact leg never pays the driver-side
    // parquet-footer I/O it doesn't use, and the pq leg's two stride
    // rules read the count once.
    lazy val nd = T.footerRowCount(s, d, "documents")
    lazy val stride = math.max(50L, nd / 4096L)
    val cands =
      if (denseLeg == "exact")
        // corpus x queries is the exact leg's hot loop: the codegen
        // long_dot kernel (identical BIGINT arithmetic, d13's proof)
        corpus.join(broadcast(queries))
      else {
        // d7's index over the hashed doc embeddings: stride-sampled
        // centroids (deterministic — the oracle re-derives them; the
        // cap keeps the broadcast and the O(N·K) assignment bounded).
        // Query docs are excluded from the sample (r15): below the
        // oracle window stride is 50 and doc_id % 50 = 0 already
        // implies % 10 = 0 ≠ 7, so every test-SF result — and the
        // oracle's literal WHERE — is unchanged; at scale the stride
        // stops being a multiple of 10 and without the predicate the
        // held-out query set would leak into the index geometry
        val cents = emb.filter(
            col("doc_id") % stride === 0 && col("doc_id") % 10 =!= 7)
          .select(col("doc_id").as("cid"), col("q").as("cq"), col("nn").as("cn"))
        val simToCent =
          expr("long_dot(q, cq)").cast("double") /
            sqrt(col("nn").cast("double") * col("cn").cast("double"))
        // inverted lists: every corpus doc -> nearest centroid (ids-only
        // exchange; q/nn ride the original frame, not the assignment)
        val assigned = corpus.join(broadcast(cents))
          .withColumn("sim", simToCent)
          .groupBy(col("doc_id"))
          .agg(max_by(col("cid"), struct(col("sim"), -col("cid"))).as("list_id"))
        val listed = corpus.join(assigned, "doc_id")
        // queries probe their 2 nearest lists; a doc lives in exactly
        // ONE list, so (qdoc, doc_id) candidates are already unique
        val probes = queries.withColumnRenamed("qq", "q")
          .join(broadcast(cents))
          .withColumn("sim",
            expr("long_dot(q, cq)").cast("double") /
              sqrt(col("qn").cast("double") * col("cn").cast("double")))
          .withColumn("rk", row_number().over(
            W.partitionBy(col("qdoc")).orderBy(col("sim").desc, col("cid"))))
          .filter(col("rk") <= 2)
          .select(col("qdoc"), col("q").as("qq"), col("qn"),
            col("cid").as("probe_list"))
        listed.join(probes, col("list_id") === col("probe_list"))
          .drop("list_id", "probe_list")
      }
    // per-(qdoc, doc_id) dense evidence: exact/ivf score by cosine on
    // the candidate row; pq re-scores the SAME candidates by d16's
    // asymmetric distance over PQ codes
    val scored =
      if (denseLeg != "pq") cands.withColumn("s", cosine)
      else {
        // subspace views: (doc_id, b, s) with s = dims [b*4+1, b*4+4]
        // of the 16-dim hashed embedding — m = 4 subspaces of 4 dims,
        // d16's geometry scaled to this embedding width
        val subs = emb.select(col("doc_id"),
          posexplode(expr(
            "transform(sequence(0, 3), b -> slice(q, b * 4 + 1, 4))"))
            .as(Seq("b", "s")))
        // codebooks: stride-sampled subvectors, but with the PQ-specific
        // cap of ≤ 256 codewords per subspace (8-bit codes — Jégou et
        // al.'s k* = 256, every production PQ deployment's geometry).
        // The coarse quantizer's ≈4096-doc stride rule is WRONG here at
        // scale: the encode join is O(N·K) per subspace, and the r14 30×
        // crossover measured K ≈ 3000 (stride 50 on 150k docs) making
        // that encode the leg's dominant term (179 s warm) — a cost that
        // buys recall the 8-bit code can't even store. Below 12,800 docs
        // (footer/256 < 50) the two rules coincide at stride 50, so
        // every test-SF result — and the DuckDB oracle's literal 50 —
        // is unchanged; the cap only bites at the corpus sizes where
        // the encode term matters.
        val pqStride = math.max(stride, nd / 256L)
        // same query-doc exclusion as the coarse sample above: a no-op
        // below the PQ oracle window (stride 50 ⇒ % 10 = 0), a
        // train/query leak-stopper past it
        val pqCents = subs.filter(
            col("doc_id") % pqStride === 0 && col("doc_id") % 10 =!= 7)
          .select(col("b"), col("doc_id").as("pcid"), col("s").as("cs"))
        val sqDist = expr(
          "aggregate(zip_with(s, cs, (a, c) -> (a - c) * (a - c)), 0L, (acc, x) -> acc + x)")
        // encode the corpus: nearest subspace centroid per (doc, b) —
        // O(N·K) with a broadcast codebook, the one-time index build
        val codes = subs.filter(col("doc_id") % 10 =!= 7)
          .join(broadcast(pqCents), Seq("b"))
          .withColumn("dist", sqDist)
          .groupBy(col("doc_id"), col("b"))
          .agg(min_by(col("pcid"), struct(col("dist"), col("pcid"))).as("pcid"))
        // per-query ADC table: distance to every codebook entry. NOT
        // broadcast-hinted: x12's query side is Nd/10 (scales with the
        // corpus), so the table is (Nd/10)·K·4 rows — the scoring join
        // below is equi-keyed on (qdoc, b, pcid) and shuffles fine;
        // Spark still auto-broadcasts it under the size threshold
        val adcTab = subs.filter(col("doc_id") % 10 === 7)
          .select(col("doc_id").as("qdoc"), col("b"), col("s"))
          .join(broadcast(pqCents), Seq("b"))
          .withColumn("qdist", sqDist)
          .select(col("qdoc"), col("b"), col("pcid"), col("qdist"))
        // ADC distance = Σ over subspaces of the table entry for the
        // candidate's code; negate so the shared TopK (largest-first)
        // ranks by (adist ASC, doc_id ASC). Int64-exact; the double
        // view is exact below 2^53 (16-dim int coords keep ADC sums
        // orders of magnitude under it)
        cands.select(col("qdoc"), col("doc_id"))
          .join(codes, Seq("doc_id"))
          .join(adcTab, Seq("qdoc", "b", "pcid"))
          .groupBy(col("qdoc"), col("doc_id"))
          .agg(sum(col("qdist")).as("adist"))
          .withColumn("s", -col("adist").cast("double"))
      }
    val dense = scored
      .groupBy(col("qdoc"))
      .agg(graft.functions.TopK.udaf(5)(col("s"), col("doc_id")).as("top"))
      .select(col("qdoc"), posexplode(col("top")).as(Seq("rk0", "sc")))
      .select(col("qdoc"), col("sc._2").as("doc_id"),
        (col("rk0") + 1).cast("int").as("dense_rk"))
    lex.join(dense, Seq("qdoc", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(expr("1000000 div (60 + lex_rk)"), lit(0L)) +
          coalesce(expr("1000000 div (60 + dense_rk)"), lit(0L)))
      .withColumn("rk", row_number().over(W.partitionBy(col("qdoc"))
        .orderBy(col("rrf").desc, col("doc_id"))))
      .filter(col("rk") <= 5)
      .select(col("qdoc"), col("rk").cast("int").as("rk"),
        col("doc_id").as("r_doc"), col("rrf"),
        coalesce(col("lex_rk"), lit(0)).cast("int").as("lex_rk"),
        coalesce(col("dense_rk"), lit(0)).cast("int").as("dense_rk"))
      .orderBy(col("qdoc"), col("rk"))
  }

  /** x12/x12b/x12c/x12e's oracle SQL — identical text modulo the d15b
    * pruning predicate in the postings CTE and the dense-leg CTE block
    * (exact cross vs full IVF re-derivation: stride-50 centroids,
    * nearest-list assignment with d7's (sim DESC, cid ASC) tiebreak,
    * 2-probe, exact cosine inside the probed lists; the pq leg extends
    * the IVF chain with d16's machinery — 4×4-dim subspace codebooks
    * from the same stride sample, nearest-codebook codes with
    * (dist ASC, pcid ASC) tiebreak, per-query ADC tables, candidates
    * ranked by (ADC sum ASC, doc_id ASC)), so a boundary off-by-one in
    * either engine still mismatches the hash. The stride is the literal
    * 50: footerRowCount/4096 < 50 at every test SF (d7's precedent —
    * the cap only widens beyond ~205k documents), and the PQ codebook
    * stride (max(stride, footer/256) — the ≤256-codeword 8-bit-code
    * cap) also reads 50 below 12,800 documents, which every test SF is.
    */
  private def hybridOracleSql(maxDfPpm: Option[Long],
      denseLeg: String = "exact"): String = {
    val prune = maxDfPpm.fold("")(ppm =>
      s"\n  WHERE df * 1000000 <= $ppm * nd")
    // the pq leg shares the whole IVF candidate chain (cents → asim →
    // assigned → probes) and swaps only the scoring tail
    val pqTail =
      """cand AS (
        |  SELECT pr.qdoc, a.doc_id
        |  FROM probes pr JOIN assigned a ON a.list_id = pr.probe_list),
        |subs AS (
        |  SELECT doc_id, b, q[b * 4 + 1 : b * 4 + 4] AS s
        |  FROM base, (SELECT unnest(range(0, 4)) AS b)),
        |pqcents AS (
        |  SELECT b, doc_id AS pcid, s AS cs FROM subs
        |  WHERE doc_id % 50 = 0 AND doc_id % 10 != 7),
        |codes AS (
        |  SELECT doc_id, b, pcid FROM (
        |    SELECT v.doc_id, v.b, c.pcid,
        |      row_number() OVER (PARTITION BY v.doc_id, v.b ORDER BY
        |        list_reduce([(v.s[i] - c.cs[i]) * (v.s[i] - c.cs[i])
        |                     FOR i IN range(1, len(v.s) + 1)],
        |                    (a, x) -> a + x) ASC, c.pcid ASC) AS rn
        |    FROM subs v JOIN pqcents c USING (b)
        |    WHERE v.doc_id % 10 != 7) WHERE rn = 1),
        |adctab AS (
        |  SELECT v.doc_id AS qdoc, v.b, c.pcid,
        |    list_reduce([(v.s[i] - c.cs[i]) * (v.s[i] - c.cs[i])
        |                 FOR i IN range(1, len(v.s) + 1)],
        |                (a, x) -> a + x) AS qdist
        |  FROM subs v JOIN pqcents c USING (b)
        |  WHERE v.doc_id % 10 = 7),
        |dense AS (
        |  SELECT qdoc, doc_id, rk AS dense_rk FROM (
        |    SELECT sc.qdoc, sc.doc_id,
        |      row_number() OVER (PARTITION BY sc.qdoc
        |        ORDER BY sc.adist ASC, sc.doc_id ASC) AS rk
        |    FROM (
        |      SELECT cd.qdoc, cd.doc_id, CAST(sum(a.qdist) AS BIGINT) AS adist
        |      FROM cand cd
        |      JOIN codes e ON e.doc_id = cd.doc_id
        |      JOIN adctab a ON a.qdoc = cd.qdoc AND a.b = e.b AND a.pcid = e.pcid
        |      GROUP BY cd.qdoc, cd.doc_id) sc) WHERE rk <= 5)"""
    val denseCte =
      if (denseLeg == "exact")
        """dense AS (
          |  SELECT qdoc, doc_id, rk AS dense_rk FROM (
          |    SELECT p.qdoc, v.doc_id,
          |      row_number() OVER (PARTITION BY p.qdoc ORDER BY
          |        (list_reduce([v.q[i] * p.qq[i] FOR i IN range(1, len(v.q) + 1)],
          |                     (a, b) -> a + b)::DOUBLE
          |           / sqrt(p.qn::DOUBLE * v.nn::DOUBLE)) DESC,
          |        v.doc_id ASC) AS rk
          |    FROM base v CROSS JOIN queries p
          |    WHERE v.doc_id % 10 != 7) WHERE rk <= 5)"""
      else
        """cents AS (
          |  SELECT doc_id AS cid, q AS cq, nn AS cn FROM base
          |  WHERE doc_id % 50 = 0 AND doc_id % 10 != 7),
          |corpus AS (SELECT * FROM base WHERE doc_id % 10 != 7),
          |asim AS (
          |  SELECT v.doc_id, c.cid,
          |    list_reduce([v.q[i] * c.cq[i] FOR i IN range(1, len(v.q) + 1)],
          |                (a, b) -> a + b)::DOUBLE
          |      / sqrt(v.nn::DOUBLE * c.cn::DOUBLE) AS sim
          |  FROM corpus v CROSS JOIN cents c),
          |assigned AS (
          |  SELECT doc_id, cid AS list_id FROM (
          |    SELECT doc_id, cid,
          |      row_number() OVER (PARTITION BY doc_id
          |        ORDER BY sim DESC, cid ASC) AS rn
          |    FROM asim) WHERE rn = 1),
          |probes AS (
          |  SELECT qdoc, probe_list FROM (
          |    SELECT p.qdoc, c.cid AS probe_list,
          |      row_number() OVER (PARTITION BY p.qdoc ORDER BY
          |        (list_reduce([p.qq[i] * c.cq[i] FOR i IN range(1, len(p.qq) + 1)],
          |                     (a, b) -> a + b)::DOUBLE
          |           / sqrt(p.qn::DOUBLE * c.cn::DOUBLE)) DESC,
          |        c.cid ASC) AS rn
          |    FROM queries p CROSS JOIN cents c) WHERE rn <= 2),
          |""" + (if (denseLeg == "pq") pqTail else
        """dense AS (
          |  SELECT qdoc, doc_id, rk AS dense_rk FROM (
          |    SELECT p.qdoc, v.doc_id,
          |      row_number() OVER (PARTITION BY p.qdoc ORDER BY
          |        (list_reduce([v.q[i] * p.qq[i] FOR i IN range(1, len(v.q) + 1)],
          |                     (a, b) -> a + b)::DOUBLE
          |           / sqrt(p.qn::DOUBLE * v.nn::DOUBLE)) DESC,
          |        v.doc_id ASC) AS rk
          |    FROM probes pr
          |    JOIN queries p ON p.qdoc = pr.qdoc
          |    JOIN assigned a ON a.list_id = pr.probe_list
          |    JOIN corpus v ON v.doc_id = a.doc_id) WHERE rk <= 5)""")
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    unnest(list_filter(str_split(lower(text), ' '), x -> x <> ''))
       |      AS term
       |  FROM documents),
       |train AS (SELECT * FROM toks WHERE doc_id % 10 != 7),
       |tf AS (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM train GROUP BY doc_id, term),
       |dl AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
       |  FROM train GROUP BY doc_id),
       |df AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |tot AS (
       |  SELECT CAST(sum(dl) AS BIGINT) AS big_l,
       |         CAST(count(*) AS BIGINT) AS nd
       |  FROM dl),
       |qterms AS (
       |  SELECT DISTINCT doc_id AS qdoc, term FROM toks WHERE doc_id % 10 = 7),
       |post AS (
       |  SELECT tf.term, tf.doc_id,
       |    CAST(floor(
       |      CAST(CAST(length(bin(nd // df)) AS BIGINT)
       |             * tf * 44 * big_l AS DOUBLE)
       |        / (20 * big_l * tf + 6 * big_l + 18 * dl * nd)
       |      * 1000000 + 0.5) AS BIGINT) AS contrib
       |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term)
       |  CROSS JOIN tot$prune),
       |sc AS (
       |  SELECT q.qdoc, p.doc_id, CAST(sum(p.contrib) AS BIGINT) AS score_q
       |  FROM qterms q JOIN post p USING (term)
       |  GROUP BY q.qdoc, p.doc_id),
       |lex AS (
       |  SELECT qdoc, doc_id, rk AS lex_rk FROM (
       |    SELECT *, row_number() OVER (PARTITION BY qdoc
       |      ORDER BY score_q DESC, doc_id ASC) AS rk
       |    FROM sc) WHERE rk <= 5),
       |dts AS (
       |  SELECT doc_id,
       |         list_filter(str_split(lower(text), ' '), x -> x <> '') AS ts
       |  FROM documents),
       |emb AS (
       |  SELECT doc_id,
       |    [list_reduce(list_prepend(CAST(0 AS BIGINT),
       |       list_transform(ts, tk ->
       |         ((CAST('0x' || substr(md5(tk), 1, 8) AS BIGINT) % 1000003)
       |            * 2654435761 + j * 97003999) % 2003 - 1001)),
       |       (a, b) -> a + b)
       |     FOR j IN range(0, 16)] AS q
       |  FROM dts WHERE len(ts) > 0),
       |base AS (
       |  SELECT * FROM (
       |    SELECT doc_id, q,
       |      list_reduce([q[i] * q[i] FOR i IN range(1, len(q) + 1)],
       |                  (a, b) -> a + b) AS nn
       |    FROM emb) WHERE nn > 0),
       |queries AS (
       |  SELECT doc_id AS qdoc, q AS qq, nn AS qn
       |  FROM base WHERE doc_id % 10 = 7),
       |$denseCte,
       |fused AS (
       |  SELECT coalesce(l.qdoc, de.qdoc) AS qdoc,
       |         coalesce(l.doc_id, de.doc_id) AS doc_id,
       |    CAST(coalesce(1000000 // (60 + l.lex_rk), 0)
       |           + coalesce(1000000 // (60 + de.dense_rk), 0) AS BIGINT)
       |      AS rrf,
       |    coalesce(l.lex_rk, 0) AS lex_rk,
       |    coalesce(de.dense_rk, 0) AS dense_rk
       |  FROM lex l FULL OUTER JOIN dense de
       |    ON l.qdoc = de.qdoc AND l.doc_id = de.doc_id)
       |SELECT qdoc, rk::INT AS rk, doc_id AS r_doc, rrf,
       |       lex_rk::INT AS lex_rk, dense_rk::INT AS dense_rk
       |FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qdoc
       |    ORDER BY rrf DESC, doc_id ASC) AS rk
       |  FROM fused) WHERE rk <= 5
       |ORDER BY qdoc, rk""".stripMargin
  }

  /** The x6/x6b shared quality + language gate — t2's exact quality
    * arithmetic and t1's language argmax, verbatim (the oracles mirror
    * those queries' SQL). SharedFrame'd: within each composite it feeds
    * several consumers (rep metrics, keep-min dedup, join-back, stage
    * stats), and across the two funnel composites the CacheManager (or
    * the scratch path's write-once keying) dedupes the identical plan,
    * so the corpus scan + projections materialize once per dataset.
    */
  private def corpusGated(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val toks = filter(split(col("text"), " "), x => x =!= "")
    val nToks = size(toks)
    val nChars = length(col("text"))
    val stop = size(array_intersect(array_distinct(toks),
      array(Seq("the", "a", "of", "and", "is", "table", "row").map(lit): _*)))
    def lscore(words: Seq[String]) =
      size(array_intersect(array_distinct(split(lower(col("text")), " ")),
        array(words.map(lit): _*)))
    val scored = T.documents(s, d)
      .withColumn("n_toks", nToks)
      .withColumn("mean_tok_len",
        when(nToks > 0, (nChars - (nToks - 1)).cast("double") / nToks).otherwise(0.0))
      .withColumn("stop_ratio",
        when(nToks > 0, stop.cast("double") / nToks).otherwise(0.0))
      .withColumn("quality",
        when(col("n_toks") >= 5, 1.0).otherwise(0.0) * 0.4 +
          when(col("mean_tok_len").between(3.0, 10.0), 1.0).otherwise(0.0) * 0.3 +
          when(col("stop_ratio") > 0, 1.0).otherwise(0.0) * 0.3)
      .withColumn("s_de", lscore(Seq("der", "die", "und", "ist", "von")))
      .withColumn("s_en", lscore(Seq("the", "a", "of", "and", "is")))
      .withColumn("s_es", lscore(Seq("el", "los", "y", "de", "es")))
      .withColumn("s_fr", lscore(Seq("le", "la", "et", "de", "est")))
    val best = greatest(col("s_de"), col("s_en"), col("s_es"), col("s_fr"))
    SharedFrame(scored
      .withColumn("pred_lang",
        when(best === 0, "unknown")
          .when(col("s_de") === best, "de")
          .when(col("s_en") === best, "en")
          .when(col("s_es") === best, "es")
          .otherwise("fr"))
      .filter(col("quality") >= 0.7 && col("pred_lang") =!= "unknown")
      .select(col("doc_id"), col("text"), col("n_toks"),
        col("quality"), col("pred_lang")), "x6_gated", d)
  }

  /** SQL text of the canonical normalization (hoist into a column before
    * using inside lambdas — a regex inside a per-trigram lambda re-executes
    * per element).
    */
  // whitespace-collapse WITHOUT the regex engine: split/filter/array_join
  // stays in whole-stage codegen and measured 5x faster than
  // regexp_replace(' +') at sf0.1, byte-identical output (TimeAudit)
  // private[graft]: the ScalingSlopes d4auto diagnostic reconstructs d4's
  // exact token derivation to report the router's probe numbers
  private[graft] val normSql = "array_join(filter(split(trim(lower(text)), ' '), x -> x != ''), ' ')"

  /** MinHash signature columns for a (doc_id, text) frame: banded LSH keys
    * (`bands`) for candidate generation and the sorted shingle-hash array
    * (`hs`) for exact-Jaccard verification — the d2 kernel, shared with
    * the incremental streaming dedup (StreamingJobs.incrementalNearDedup).
    *
    * `numPerms`/`rowsPerBand` trade candidate volume for recall at lower
    * similarity floors (see [[Similarity.bandGeometryFor]] for the
    * S-curve and the perms ladder): the default 32/4 (8 bands) is the
    * classic near-dup shape and the one d2's DuckDB oracle re-derives;
    * corpus owners hunting mid-similarity duplicates pick 32/2 or 64/2,
    * heavy-duplication corpora pick 32/8. Frames banded with different
    * geometries never share a signature store (band keys mix the band
    * index, not the geometry — collisions across geometries would be
    * meaningless).
    */
  def minhashSignatures(docs: DataFrame, numPerms: Int = 32,
      rowsPerBand: Int = 4): DataFrame = {
    require(numPerms > 0 && rowsPerBand > 0 && numPerms % rowsPerBand == 0,
      s"rowsPerBand must divide the $numPerms-perm signature, got $rowsPerBand")
    graft.functions.GraftExtensions.registerInto(docs.sparkSession)
    // shingling is a builtin chain and the banding is the minhash_bands
    // codegen kernel (SketchExprs) — the whole signature pass is one
    // WholeStageCodegen span with no UDF materialization of the token
    // arrays. SketchExprsSpec pins equality with the scalar Sketches
    // chain (the stability contract the persisted signature store
    // depends on).
    docs
      .withColumn("toks",
        expr("filter(split(lower(coalesce(text, '')), ' '), x -> x != '')"))
      .withColumn("shingles",
        expr("""CASE WHEN size(toks) < 2 THEN toks
               |ELSE array_distinct(transform(sequence(1, size(toks) - 1),
               |       i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))) END"""
          .stripMargin))
      .select(col("doc_id"),
        expr(s"minhash_bands(shingles, $numPerms, $rowsPerBand)").as("bands"),
        expr("array_sort(transform(shingles, x -> xxhash64(x)))").as("hs"))
  }

  /** Verified near-dup pairs (Jaccard >= `minJaccard`) between two
    * signature frames from [[minhashSignatures]]. Band-key equality
    * generates candidates on ids only; signatures join back per survivor.
    * `ordered = true` (self-join) keeps id1 < id2; `false` (two disjoint
    * frames, e.g. corpus-vs-batch) keeps every cross pair.
    */
  def nearDupPairs(left: DataFrame, right: DataFrame, minJaccard: Double,
      ordered: Boolean = true): DataFrame = {
    graft.functions.GraftExtensions.registerInto(left.sparkSession)
    // band position is safe under plain key equality: bandKeys mixes the
    // band index into the key, so band i only collides with band i
    val l = left.select(col("doc_id").as("id1"), explode(col("bands")).as("bk"))
    val r = right.select(col("doc_id").as("id2"), explode(col("bands")).as("bk2"))
    val pairCond = if (ordered) col("id1") < col("id2") else col("id1") =!= col("id2")
    val cand = l.join(r, col("bk") === col("bk2") && pairCond)
      .select(col("id1"), col("id2")).dropDuplicates("id1", "id2")
    cand
      .join(left.select(col("doc_id").as("id1"), col("hs").as("h1")), Seq("id1"))
      .join(right.select(col("doc_id").as("id2"), col("hs").as("h2")), Seq("id2"))
      .withColumn("inter", expr("sorted_intersect_size(h1, h2)"))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("h1")) + size(col("h2")) - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** SemDeDup core (Abbas et al. 2023) over a prepared quantized frame
    * `(vec_id, q: array<long>, nn: long)`: stride-sampled centroids,
    * d7's nearest-centroid assignment (max sim, then min cid), then a
    * within-cluster pair scan that drops every member holding a
    * semantic duplicate (pair cosine >= tau) of higher keep-priority —
    * the paper's rule keeps the member FARTHEST from the centroid,
    * tie-broken by vec_id, compared on the 1e-6-fixed-pointed centroid
    * cosine so priority never depends on an FP inequality. Returns
    * survivors `(vec_id, list_id, cqc)`.
    *
    * Scale shape: the cluster-bounded quadratic IS the operator's
    * semantics (per-cluster pairs at (N/K)², K growing with the corpus
    * via the caller's stride); the corpus-wide shuffles key on vec_id
    * (assignment) and list_id (pair scan), centroids broadcast, and the
    * members frame — three consumers: both pair sides + the survivor
    * anti-join — materializes once under `membersName`/`cacheKey`
    * ([[SharedFrame]]'s contract).
    */
  /** The t12 Gopher rule flags as added columns (`n_words`, the seven
    * `r_*` integer flags, `pass`) over any frame with a `text` column —
    * shared by the t12 diagnostic query and the streaming quality gate
    * ([[graft.streaming.StreamingJobs.streamingQualityGate]]): every
    * rule is a stateless per-row projection (exact integer
    * cross-multiplies, no shuffle), so the same expressions compose
    * into a batch scan or a streaming plan unchanged. `minStop` is the
    * stopword-presence threshold (Gopher's paper form is 2; the sf
    * vocabulary carries only 'the', so the t12 query pins 1).
    */
  def gopherFlags(docs: DataFrame, minStop: Int = 1): DataFrame = {
    val toks = filter(split(col("text"), " "), x => x =!= "")
    val lines = split(col("text"), "\n")
    docs
      .withColumn("n_words", size(toks))
      .withColumn("n_lines", size(lines))
      .withColumn("wchars",
        expr("aggregate(transform(filter(split(text, ' '), x -> x != ''), " +
          "x -> length(x)), 0L, (a, b) -> a + b)"))
      .withColumn("alpha_words",
        size(filter(toks, x => x.rlike("[a-zA-Z]"))))
      .withColumn("n_sym",
        (length(col("text")) - length(replace(col("text"), lit("#"), lit("")))) +
          (length(col("text")) - length(replace(col("text"), lit("..."), lit("")))) / 3)
      .withColumn("bullet_lines",
        size(filter(lines, l =>
          substring(l, 1, 2) === "- " || substring(l, 1, 2) === "* ")))
      .withColumn("ellipsis_lines",
        size(filter(lines, l => substring(l, -3, 3) === "...")))
      .withColumn("n_stop",
        size(array_intersect(array_distinct(toks),
          array(Seq("the", "be", "to", "of", "and", "that", "have", "with")
            .map(lit): _*))))
      .withColumn("r_words",
        when(col("n_words").between(20, 100000), 1).otherwise(0))
      .withColumn("r_meanlen",
        when(col("n_words") > 0 &&
          col("wchars") >= col("n_words") * 3 &&
          col("wchars") <= col("n_words") * 10, 1).otherwise(0))
      .withColumn("r_symbol",
        when(col("n_sym") * 10 <= col("n_words"), 1).otherwise(0))
      .withColumn("r_bullet",
        when(col("bullet_lines") * 10 <= col("n_lines") * 9, 1).otherwise(0))
      .withColumn("r_ellipsis",
        when(col("ellipsis_lines") * 10 <= col("n_lines") * 3, 1).otherwise(0))
      .withColumn("r_alpha",
        when(col("alpha_words") * 5 >= col("n_words") * 4, 1).otherwise(0))
      .withColumn("r_stop",
        when(col("n_stop") >= minStop, 1).otherwise(0))
      .withColumn("pass",
        col("r_words") * col("r_meanlen") * col("r_symbol") * col("r_bullet") *
          col("r_ellipsis") * col("r_alpha") * col("r_stop"))
      .drop("n_lines", "wchars", "alpha_words", "n_sym", "bullet_lines",
        "ellipsis_lines", "n_stop")
  }

  def semDedup(base: DataFrame, stride: Long, tau: Double,
      membersName: String, cacheKey: String,
      maxCluster: Int = Int.MaxValue): DataFrame = {
    // the N×K assignment and the Σ|cluster|² pair scan each evaluate one
    // dot per row — the codegen long_dot kernel, not the interpreted
    // aggregate(zip_with(...)) fold, is what keeps the stage's cost in
    // the arithmetic instead of lambda dispatch (identical BIGINT math,
    // so oracles written against the builtin form are unaffected)
    graft.functions.GraftExtensions.registerInto(base.sparkSession)
    require(maxCluster > 0, s"maxCluster must be positive, got $maxCluster")
    val cents = base.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("cid"), col("q").as("cq"), col("nn").as("cn"))
    val simToCent =
      expr("long_dot(q, cq)")
        .cast("double") / sqrt(col("nn").cast("double") * col("cn").cast("double"))
    val assigned0 = base.join(broadcast(cents))
      .withColumn("sim", simToCent)
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cid"), col("sim")),
        struct(col("sim"), -col("cid"))).as("b"))
      .select(col("vec_id"), col("b.cid").as("list_id"),
        floor(col("b.sim") * lit(1000000) + lit(0.5)).cast("long").as("cqc"))
    // Oversized-cluster guard: stride-sampled centroids carry no balance
    // promise, and ONE mega-cluster makes the pair scan quadratic in its
    // size (the LSH-bucket failure mode in embedding space). With a
    // finite maxCluster, clusters above it sub-split deterministically
    // by vec_id hash into ceil(size / maxCluster) buckets and the pair
    // scan keys on (cluster, bucket) — work bounded at ~size·maxCluster
    // per hot cluster. The trade is SemDeDup's own: duplicates
    // straddling sub-buckets go uncompared, exactly as the paper
    // accepts across k-means cells (production raises K first; the
    // guard is the backstop against adversarial concentration). Off by
    // default — the plan (and d13's oracle) is byte-identical when
    // maxCluster is unset.
    val assigned =
      if (maxCluster == Int.MaxValue) assigned0
      else assigned0
        .withColumn("csz",
          count(lit(1)).over(Window.partitionBy(col("list_id"))))
        .withColumn("sub",
          pmod(xxhash64(col("vec_id")),
            expr(s"(csz + ${maxCluster - 1}) div $maxCluster")))
        .drop("csz")
    val members = SharedFrame(base.join(assigned, "vec_id"), membersName, cacheKey)
    val subCond =
      if (maxCluster == Int.MaxValue) lit(true)
      else col("sub") === col("sub2")
    val m2 = {
      val sel = Seq(col("list_id").as("l2"), col("vec_id").as("id2"),
        col("q").as("q2"), col("nn").as("n2"), col("cqc").as("p2")) ++
        (if (maxCluster == Int.MaxValue) Nil else Seq(col("sub").as("sub2")))
      members.select(sel: _*)
    }
    val dropped = members
      .join(m2, col("list_id") === col("l2") && col("vec_id") =!= col("id2")
        && subCond)
      .withColumn("dot", expr("long_dot(q, q2)"))
      .withColumn("cos",
        col("dot").cast("double") /
          sqrt(col("nn").cast("double") * col("n2").cast("double")))
      .filter(col("cos") >= tau &&
        (col("p2") < col("cqc") ||
          (col("p2") === col("cqc") && col("id2") < col("vec_id"))))
      .select(col("vec_id")).distinct()
    members.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("list_id"), col("cqc"))
  }

  /** Per-row DISTINCT 6-gram md5 60-bit digests from a token-array
    * column — ONE definition of the gram rule shared by d23 and the
    * streaming KMV sketch (the Hll/Hdr one-definition discipline):
    * per-doc dedup stays inside the array world (d21's shuffle lesson)
    * and the short-doc guard is an IF, never greatest() (Spark's
    * sequence(1, 0) descends).
    */
  def gramDigests(tsName: String): Column = expr(
    s"""transform(
       |  IF(size($tsName) < 6, CAST(array() AS ARRAY<STRING>),
       |     array_distinct(transform(sequence(1, size($tsName) - 5),
       |       i -> array_join(slice($tsName, i, 6), ' ')))),
       |  g -> CAST(conv(substr(md5(g), 1, 15), 16, 10) AS BIGINT))""".stripMargin)

  /** Gaps-and-islands merge of n-gram coverage positions — ONE
    * definition of the span arithmetic shared by d9b (duplicated-span
    * merge), d25 (exact-substring removal spans), x6b's coverage rollup
    * and the streaming substring dedup, so batch/stream span parity and
    * the d9b/d25 oracle hashes all rest on the same rule: coverage
    * intervals [pos, pos+n-1] all have equal length, so "new island" is
    * pos > lag(pos) + n (adjacent/overlapping merge), and a span is
    * [min pos, max pos + n - 1]. Input frame needs (doc_id, pos);
    * output is (doc_id, span_start, span_end, n_tokens), unordered —
    * consumers filter/order/aggregate.
    */
  private[graft] def islandSpans(positions: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    positions
      .select(col("doc_id"), col("pos"))
      .withColumn("new_island",
        when(col("pos") > lag(col("pos"), 1).over(w) + n, 1)
          .when(lag(col("pos"), 1).over(w).isNull, 1)
          .otherwise(0))
      .withColumn("island", sum(col("new_island")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (n - 1)).as("span_end"))
      .select(col("doc_id"),
        col("span_start").cast("long").as("span_start"),
        col("span_end").cast("long").as("span_end"),
        (col("span_end") - col("span_start") + 1).cast("long").as("n_tokens"))
  }

  /** d20's Count-Min geometry — ONE definition shared by the batch
    * query and [[graft.streaming.StreamingJobs.streamingCmsCells]]
    * (the cdcChunks/gramDigests discipline), so batch/stream cell
    * equality is structural. ONE md5 per token; the `cmsDepth` row
    * columns derive by Kirsch-Mitzenmacher composition
    * c_r = (h1 + r·h2) mod W with h2 forced nonzero (KM 2006 — two
    * hashes suffice for CMS rows; hashing the token stream D times
    * would be D× the work). Input frame needs a `tok` column.
    */
  private[graft] val cmsDepth = 4
  private[graft] val cmsWidth = 32
  /** Version of the CMS hash derivation — part of the sketch's IDENTITY
    * (cells hashed under different derivations never merge meaningfully).
    * Bump on ANY change to [[cmsRowCols]]'s digest/row-composition rule;
    * [[graft.streaming.StreamingJobs.sketchVersionGuard]] enforces the
    * pairing on checkpoints/stores. History: v1 = the r10 one-digest KM
    * retrofit (h2 parity unconstrained); v2 = r11's odd-h2 composition.
    */
  private[graft] val cmsDerivationVersion = 2
  private[graft] def cmsRowCols(toks: DataFrame): DataFrame = toks
    .withColumn("dg", expr("CAST(conv(substr(md5(tok), 1, 15), 16, 10) AS BIGINT)"))
    .withColumn("r", explode(expr(s"sequence(0, ${cmsDepth - 1})")))
    // Kirsch-Mitzenmacher composition c_r = (h1 + r·h2) mod W from ONE
    // digest. h2 = 1 + 2·(… mod W/2) is ODD by construction: W is a
    // power of two, so an odd h2 is coprime with W and the r-step walks
    // distinct columns for every row — an even h2 (gcd > 1 with W) would
    // let some tokens reuse identical column offsets across rows,
    // weakening the per-row independence the KM result relies on.
    .withColumn("c", expr(
      s"pmod(pmod(dg, $cmsWidth) + r * (1 + 2 * pmod(dg div $cmsWidth, ${cmsWidth / 2})), $cmsWidth)"))

  /** The CMS cells of a (text)-carrying document frame: depth×width
    * additive counters — a plain keyed count, so the SAME definition is
    * a batch aggregate and a live streaming aggregate (update/complete
    * mode), ≤ 128 rows of state regardless of volume.
    *
    * The hash derivation is part of the sketch's IDENTITY: cells hashed
    * under different derivations never merge meaningfully, so an engine
    * upgrade that changes [[cmsRowCols]] (r10's one-digest retrofit,
    * r11's odd-h2 fix) requires a FRESH checkpoint for any live
    * streaming aggregate built on this definition, and persisted cell
    * frames must not be unioned across the change. The stateful groupBy
    * has no schema slot for a version column, so the contract is
    * ENFORCED beside the state instead (r12): [[cmsDerivationVersion]] +
    * [[graft.streaming.StreamingJobs.sketchVersionGuard]] stamp a
    * `_graft_sketch_version` marker on the checkpoint/store directory
    * and fail fast when state predates or mismatches the current
    * derivation — use the checkpoint-taking streamingCmsCells overload
    * (or call the guard directly on persisted-cell directories).
    */
  def cmsCells(docs: DataFrame): DataFrame =
    cmsRowCols(docs.select(
      explode(filter(split(lower(col("text")), " "), x => x =!= ""))
        .as("tok")))
      .groupBy(col("r"), col("c")).agg(count(lit(1)).as("cell"))

  /** d24's AMS F2 sign counters of a (lang, text) document frame — ONE
    * definition for the batch query and
    * [[graft.streaming.StreamingJobs.streamingAmsCounters]]: 32 linear
    * ±1-sign counters per lang, signs read from BITS of one md5 60-bit
    * digest per token. Counters are LINEAR in the stream (sums of
    * per-row ±1), hence additive, merge-order-independent and a valid
    * live streaming aggregate with 32 longs of state per lang.
    */
  def amsCounters(docs: DataFrame): DataFrame = docs
    .select(col("lang"),
      explode(filter(split(lower(col("text")), " "), x => x =!= ""))
        .as("tok"))
    .withColumn("hv",
      expr("CAST(conv(substr(md5(tok), 1, 15), 16, 10) AS BIGINT)"))
    .withColumn("sx", explode(expr("sequence(0, 31)")))
    .withColumn("sig", expr(
      "1 - 2 * pmod(hv div shiftleft(CAST(1 AS BIGINT), CAST(sx AS INT)), 2)"))
    .groupBy(col("lang"), col("sx"))
    .agg(sum(col("sig")).as("c"))

  /** The per-shard data-card pipeline, factored so ONE definition serves
    * x16 (batch, oracled) and the streaming incremental store
    * ([[graft.streaming.StreamingJobs.incrementalDataCard]] writes the
    * delta frames per batch; `readDataCard` merges and assembles):
    * every carrier is additive (cell counts/sums SUM-merge, min/max
    * MIN/MAX-merge, HLL registers MAX-merge), which is exactly why the
    * card maintains incrementally without read-modify-write state.
    */
  def shardCardBase(docs: DataFrame, nShards: Long = 8L): DataFrame = docs
    .select(col("doc_id"),
      filter(split(lower(col("text")), " "), x => x =!= "").as("ts"))
    .withColumn("shard", expr(
      s"pmod(CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT), $nShards)"))
    .withColumn("v", size(col("ts")).cast("long"))

  /** Doc-grain delta cells: one row per (shard, HDR bucket) carrying the
    * additive statistics. Zero-token docs land in withBuckets' sentinel
    * cell (e = -1) so counts stay total.
    */
  def shardCardCells(base: DataFrame): DataFrame =
    Hdr.withBuckets(base)
      .groupBy(col("shard"), col("e"), col("m"), col("pw"))
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sv"),
        min(col("v")).as("mnv"), max(col("v")).as("mxv"))

  /** Token-grain delta registers: one row per (shard, HLL register). */
  def shardCardRegs(base: DataFrame): DataFrame =
    base.select(col("shard"), explode(col("ts")).as("tok"))
      .withColumn("h",
        expr("CAST(conv(substr(md5(tok), 1, 15), 16, 10) AS BIGINT)"))
      .withColumn("j", Hll.jExpr())
      .withColumn("rho", Hll.rhoExpr())
      .groupBy(col("shard"), col("j"))
      .agg(max(col("rho")).as("reg"))

  /** Merged cells + registers → one card row per shard. Callers merge
    * deltas first (SUM cnt/sv, MIN mnv, MAX mxv, MAX reg) — a single
    * batch's frames are already merged by construction.
    */
  def assembleShardCard(cells: DataFrame, regs: DataFrame): DataFrame = {
    val perShard = cells.withColumn("lo", Hdr.loExpr)
      .groupBy(col("shard"))
      .agg(sum(col("cnt")).as("n_docs"), sum(col("sv")).as("n_tokens"),
        min(col("mnv")).as("min_toks"), max(col("mxv")).as("max_toks"),
        sort_array(collect_list(when(col("e") >= 0,
          struct(col("e"), col("m"), col("lo"), col("cnt"))))).as("hist"),
        sum(when(col("e") >= 0, col("cnt")).otherwise(0L)).as("nq"))
    // empty-shard quantiles read -1 straight from the fold's init
    val card = perShard.select(col("shard"), col("n_docs"),
      col("n_tokens"), col("min_toks"), col("max_toks"),
      Hdr.quantileLo(500L, "p50_lo"), Hdr.quantileLo(950L, "p95_lo"))
    // absent registers folded in arithmetically (M_j = 0 -> 2^54 each),
    // so no densifying join
    val hll = regs.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_present"),
        sum(Hll.termExpr()).as("s_present"))
      .select(col("shard"), (lit(64L) - col("n_present")).as("v_zero"),
        Hll.sScaledFromPresent().as("s_scaled"))
    card.join(hll, Seq("shard"), "left")
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        col("min_toks"), col("max_toks"), col("p50_lo"), col("p95_lo"),
        coalesce(col("v_zero"), lit(64L)).as("v_zero"),
        coalesce(col("s_scaled"),
          expr("64 * CAST(18014398509481984 AS BIGINT)")).as("s_scaled"))
      .withColumn("hll_est", Hll.estExpr())
      .orderBy(col("shard"))
  }

  val defs: Seq[QueryDef] = Seq(

    // D1: exact dedup — hash-groupBy on normalized text; canonical row =
    // min doc_id, duplicates counted. One shuffle on the 16-byte digest
    // (never on the text itself — at 100 TB the digest is what moves).
    QueryDef(
      "d1_exact_dedup",
      (s, d) =>
        T.documents(s, d)
          .withColumn("h", md5(norm(col("text"))))
          .groupBy(col("h"))
          .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
          .select(col("canonical_id"), col("n_copies"))
          .orderBy(col("canonical_id")),
      Some("""SELECT min(doc_id) AS canonical_id, count(*) AS n_copies
             |FROM (SELECT doc_id,
             |        md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')) AS h
             |      FROM documents) t
             |GROUP BY h ORDER BY canonical_id""".stripMargin),
      doc = "dedup/exact; BASELINE.json north star (SURVEY §7 step 10)"),

    // D2: MinHash + LSH near-dup detection — shingle -> 32-perm signature
    // -> 8 banded keys -> bucket join -> exact-Jaccard verification.
    // Candidate generation is linear in corpus size; only bucket-colliding
    // pairs are compared. Portable hashing (graft.functions.Sketches), so
    // the signature of a document is stable across runs/partitions.
    QueryDef(
      "d2_minhash_lsh",
      (s, d) => {
        // verify stage carries xxhash64'd SORTED shingles, not strings:
        // cardinalities (hence Jaccard) are hash-collision-equal, and the
        // per-candidate intersection is the codegen two-pointer merge
        // instead of a boxed string hash set (same trick as d4). Candidate
        // generation moves ids only; signatures join back per survivor.
        // The signature frame feeds FOUR consumers (two band sides, two
        // hs join-backs) with different prunings, so exchange reuse can't
        // dedupe them — persist LAZILY instead (zero jobs at build;
        // CacheManager dedupes repeats; the shingle+minhash UDF pass runs
        // once per action instead of 4x). At 100 TB this frame is the
        // persisted signature store the streaming dedup already maintains
        // (StreamingJobs.incrementalNearDedup) — caching it here is the
        // batch form of the same materialization.
        val sig = SharedFrame(minhashSignatures(
          T.documents(s, d).select(col("doc_id"), col("text"))), "d2_sig", d)
        nearDupPairs(sig, sig, 0.5).orderBy(col("id1"), col("id2"))
      },
      // The FULL sketch pipeline re-derived in DuckDB: the portable
      // minhash arithmetic (Sketches) is plain mod-1e9+7 BIGINT math, so
      // the permutations, band keys and candidate set are reproduced
      // exactly in SQL (list lambdas); verification intersects shingle
      // STRINGS where Spark intersects their xxhash64s — identical
      // cardinalities absent 64-bit collisions, hence identical doubles.
      // ASCII-only corpus makes unicode(c) == Java charAt (non-BMP text
      // would split surrogate pairs differently). Candidate recall is
      // additionally pinned by SketchesSpec planted-dup tests.
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |         list_filter(string_split(lower(text), ' '), x -> x != '') AS t
             |  FROM documents),
             |sh AS (
             |  SELECT doc_id,
             |         CASE WHEN len(t) < 2 THEN t
             |              ELSE list_distinct([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))])
             |         END AS s
             |  FROM toks),
             |hashes AS (
             |  SELECT doc_id, s,
             |         [list_reduce([unicode(c)::BIGINT FOR c IN string_split(g, '')],
             |                      (a, b) -> (a * 31 + b) % 1000000007) FOR g IN s] AS hs
             |  FROM sh),
             |sigs AS (
             |  SELECT doc_id, s,
             |         [list_min([((2654435761 + 40503 * i) % 1000000007 *
             |                     (h % 1000000007) % 1000000007
             |                     + (2246822519 + 9973 * i)) % 1000000007 FOR h IN hs])
             |          FOR i IN range(0, 32)] AS sig
             |  FROM hashes),
             |bands AS (
             |  SELECT doc_id, s,
             |         [list_reduce([b] || [sig[i] FOR i IN range(4*b + 1, 4*b + 5)],
             |                      (a, x) -> (a * 1315423911 + x) % 1000000007)
             |          FOR b IN range(0, 8)] AS bk
             |  FROM sigs),
             |exploded AS (
             |  SELECT doc_id, unnest(bk) AS k FROM bands),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
             |  FROM exploded a JOIN exploded b ON a.k = b.k AND a.doc_id < b.doc_id),
             |verified AS (
             |  SELECT id1, id2,
             |         len(list_intersect(x.s, y.s))::DOUBLE /
             |           (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) AS jaccard
             |  FROM cand JOIN bands x ON cand.id1 = x.doc_id
             |            JOIN bands y ON cand.id2 = y.doc_id)
             |SELECT id1, id2, jaccard FROM verified WHERE jaccard >= 0.5
             |ORDER BY id1, id2""".stripMargin),
      doc = "dedup/minhash-lsh; SURVEY C1/C2 scale path (RGPs.ipynb cell 70)"),

    // D3: SimHash near-dup — 64-bit signature, banded into 4×16-bit keys;
    // pairs whose signatures agree on ≥1 band are verified by Hamming
    // distance ≤ 6 (≈ 90% token overlap).
    QueryDef(
      "d3_simhash",
      (s, d) => {
        graft.functions.GraftExtensions.registerInto(s)
        // signature is the simhash64 codegen kernel (SketchExprs; empty
        // text = null text = empty token multiset, the UDF's old null
        // contract); Hamming is the builtin bit_count over xor — no UDF
        // anywhere in the operator.
        val docs = T.documents(s, d)
          .select(col("doc_id"),
            expr("simhash64(coalesce(text, ''))").as("sim"))
        val banded = docs.select(col("doc_id"), col("sim"),
          explode(expr("transform(sequence(0, 3), b -> " +
            "concat(b, ':', CAST(shiftright(sim, b * 16) & 65535 AS STRING)))"))
            .as("band"))
        val a = banded.select(col("band"), col("doc_id").as("id1"), col("sim").as("s1"))
        val b = banded.select(col("band").as("b2"), col("doc_id").as("id2"), col("sim").as("s2"))
        a.join(b, col("band") === col("b2") && col("id1") < col("id2"))
          .dropDuplicates("id1", "id2")
          .withColumn("hamming", expr("CAST(bit_count(s1 ^ s2) AS INT)"))
          .filter(col("hamming") <= 6)
          .select(col("id1"), col("id2"), col("hamming"))
          .orderBy(col("id1"), col("id2"))
      },
      // Full sketch re-derivation in DuckDB, including the splitmix64
      // finalizer: DuckDB integers ERROR on overflow instead of wrapping,
      // so Java's u64 arithmetic is emulated in HUGEINT over [0, 2^64) —
      // adds reduce mod 2^64, multiplies split into 32-bit halves
      // (alo·blo + (alo·bhi + ahi·blo mod 2^32)·2^32, exact in HUGEINT),
      // xors round-trip through signed BIGINT, and >>> k is integer
      // division (shifted values stay below 2^63, so only the unshifted
      // operand needs the sign dance). m1-m9 are one splitmix stage each;
      // the per-bit majority vote is 2·ones > n over the token hash list.
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(string_split(lower(coalesce(text, '')), ' '),
             |                                    x -> x != '')) AS tok
             |  FROM documents),
             |th AS (
             |  SELECT doc_id,
             |         list_reduce([unicode(c)::BIGINT FOR c IN string_split(tok, '')],
             |                     (a, b) -> (a * 31 + b) % 1000000007)::HUGEINT AS h
             |  FROM toks),
             |m1 AS (SELECT doc_id, (h + 11400714819323198485) % 18446744073709551616 AS z FROM th),
             |m2 AS (SELECT doc_id,
             |         xor((CASE WHEN z >= 9223372036854775808
             |                   THEN z - 18446744073709551616 ELSE z END)::BIGINT,
             |             (z // 1073741824)::BIGINT) AS sx
             |       FROM m1),
             |m3 AS (SELECT doc_id,
             |         (sx::HUGEINT + CASE WHEN sx < 0 THEN 18446744073709551616::HUGEINT
             |                             ELSE 0::HUGEINT END) % 4294967296 AS xl,
             |         (sx::HUGEINT + CASE WHEN sx < 0 THEN 18446744073709551616::HUGEINT
             |                             ELSE 0::HUGEINT END) // 4294967296 AS xh
             |       FROM m2),
             |m4 AS (SELECT doc_id,
             |         (xl * 484763065 + (xl * 3210233709 + xh * 484763065) % 4294967296 * 4294967296)
             |           % 18446744073709551616 AS z
             |       FROM m3),
             |m5 AS (SELECT doc_id,
             |         xor((CASE WHEN z >= 9223372036854775808
             |                   THEN z - 18446744073709551616 ELSE z END)::BIGINT,
             |             (z // 134217728)::BIGINT) AS sx
             |       FROM m4),
             |m6 AS (SELECT doc_id,
             |         (sx::HUGEINT + CASE WHEN sx < 0 THEN 18446744073709551616::HUGEINT
             |                             ELSE 0::HUGEINT END) % 4294967296 AS xl,
             |         (sx::HUGEINT + CASE WHEN sx < 0 THEN 18446744073709551616::HUGEINT
             |                             ELSE 0::HUGEINT END) // 4294967296 AS xh
             |       FROM m5),
             |m7 AS (SELECT doc_id,
             |         (xl * 321982955 + (xl * 2496678331 + xh * 321982955) % 4294967296 * 4294967296)
             |           % 18446744073709551616 AS z
             |       FROM m6),
             |m8 AS (SELECT doc_id,
             |         xor((CASE WHEN z >= 9223372036854775808
             |                   THEN z - 18446744073709551616 ELSE z END)::BIGINT,
             |             (z // 2147483648)::BIGINT) AS sx
             |       FROM m7),
             |m9 AS (SELECT doc_id,
             |         sx::HUGEINT + CASE WHEN sx < 0 THEN 18446744073709551616::HUGEINT
             |                            ELSE 0::HUGEINT END AS h64
             |       FROM m8),
             |perdoc AS (SELECT doc_id, list(h64) AS hl FROM m9 GROUP BY doc_id),
             |sims AS (
             |  SELECT doc_id,
             |         list_sum([CASE WHEN 2 * len(list_filter(hl, h -> (h // (1::HUGEINT << b)) % 2 = 1))
             |                        > len(hl)
             |                   THEN (1::HUGEINT << b) ELSE 0::HUGEINT END
             |                   FOR b IN range(0, 64)]) AS usim
             |  FROM perdoc),
             |banded AS (
             |  SELECT doc_id,
             |         (CASE WHEN usim >= 9223372036854775808
             |               THEN usim - 18446744073709551616 ELSE usim END)::BIGINT AS sim,
             |         unnest([b::VARCHAR || ':' || ((usim // (1::HUGEINT << (b * 16))) % 65536)::VARCHAR
             |                 FOR b IN range(0, 4)]) AS band
             |  FROM sims),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2, a.sim AS sim1, b.sim AS sim2
             |  FROM banded a JOIN banded b ON a.band = b.band AND a.doc_id < b.doc_id)
             |SELECT id1, id2, bit_count(xor(sim1, sim2))::INT AS hamming
             |FROM cand WHERE bit_count(xor(sim1, sim2)) <= 6
             |ORDER BY id1, id2""".stripMargin),
      doc = "dedup/simhash; Charikar 2002 random-projection sketch"),

    // D4: exact n-gram Jaccard near-dup, blocked by (lang, length bucket) —
    // the exact counterpart the sketches approximate. Blocking bounds the
    // quadratic pair join: near-duplicates have near-equal lengths, so a
    // coarse length bucket (plus lang) caps block size without losing the
    // high-similarity pairs the operator exists to find. The unblocked
    // all-pairs form is what d2 (MinHash-LSH) replaces at scale.
    QueryDef(
      "d4_ngram_jaccard",
      (s, d) => {
        // Normalization is hoisted into its own column so the regex runs
        // once per document, NOT once per trigram inside the lambda (a 20x
        // plan bug caught by stage profiling); trigrams are then hashed to
        // 64-bit ints so the per-pair intersection works on longs, not
        // strings, and SORTED once per document so the pair stage is a
        // codegen two-pointer merge (sorted_intersect_size — the boxed
        // array_intersect hash set per pair was 26 s of the sf0.1 bench).
        // Set cardinalities — hence the Jaccard — are unchanged.
        graft.functions.GraftExtensions.registerInto(s)
        // hashed_trigrams = the builtin chain
        // array_sort(array_distinct(transform(sequence(...), xxhash64 ∘
        // substring))) as ONE primitive codegen pass (no boxed Longs, no
        // per-doc hash set) — proven element-identical in FunctionsSpec
        val docs = T.documents(s, d)
          .select(col("lang"), floor(col("n_chars") / 32).as("lb"),
            col("doc_id"), expr(normSql).as("nt"))
          .withColumn("g", expr("hashed_trigrams(nt)"))
          .drop("nt")
          // pre-partition on the block key: both self-join sides then read
          // the same shuffle layout instead of each re-deriving the
          // trigram column behind its own exchange (measured ~35% off the
          // whole query at sf0.1)
          .repartition(col("lang"), col("lb"))
        // Size dispatch, tuned from the r7 TimeAudit crossover sweep
        // (1/2/4/8x corpora, 5k -> 40k docs, length-preserving replicas
        // so block SIZES grow with N — the regime that kills the
        // quadratic): quadratic 0.57/1.46/3.86/17.1 s vs PrefixJoin
        // 3.2/4.8/16.3/40.6 s. The quadratic wins at every measured size
        // but grows ~4x per doubling on the last step vs the prefix
        // index's ~2.5x; the measured growth rates cross near ~100-150k
        // docs, so the dispatch switches at 100k (the conservative end).
        // In the other regime (replicas spread into fresh length buckets,
        // block count grows, sizes don't) the quadratic wins at every N
        // (0.74/0.96/1.93/7.7 s vs 9.9/13.4/10.0/75.6 s) — see NOTES_r7.
        // At t=0.35 prefixes span 65% of each token set, so candidate
        // generation costs more than the in-block pair scan until blocks
        // get big. Above the threshold the LOSSLESS prefix index
        // (PrefixJoin, output proven bit-identical in PrefixJoinSpec)
        // takes over. Both branches produce identical rows — the dispatch
        // never changes the answer, only the plan. The cardinality comes
        // from the parquet FOOTERS (driver-side metadata, zero Spark jobs
        // at plan build — the same de-eager contract x1/x2/rgpMine honor).
        // graft.d4.maxExactRows overrides the 100k default: below it the
        // quadratic runs UNPROBED (zero Spark jobs at plan build — the
        // footer count is driver-side metadata, and at these sizes the
        // quadratic wins in every measured regime). ABOVE it the r7
        // N-based rule assumed open-vocabulary text, where df-ordered
        // prefixes are rare tokens and the index prunes — but the r10
        // density diagnostic (ScalingSlopes d4stats) measured a
        // DENSE-vocabulary corpus (~37^3 trigram space, every prefix
        // token common) whose candidate stage approached the in-block
        // cross product TIMES the shared-prefix width (>230 GB of
        // pre-distinct shuffle at 150k docs, run aborted) while the
        // quadratic scan finished in 163.7 s with zero spill. Corpus
        // SIZE cannot see that regime, so above maxExactRows the
        // dispatch is VOCABULARY-AWARE (r11): PrefixJoin.jaccardPairsAuto
        // measures the actual prefix-candidate volume from the df table
        // (two linear scouting aggregates) before committing to a join —
        // dense corpora stream the quadratic automatically, absurdly
        // large dense corpora fail fast naming d2_minhash_lsh, and no
        // human has to read SCALING.md first. Both branches are lossless
        // and bit-identical (PrefixJoinSpec); the dispatch never changes
        // the answer, only the plan.
        val maxExact = s.conf.getOption("graft.d4.maxExactRows")
          .map(raw => raw.trim.toLongOption.filter(_ > 0).getOrElse(
            throw new IllegalArgumentException(
              s"graft.d4.maxExactRows must be a positive integer, got '$raw'")))
          .getOrElse(100000L)
        def posConf(key: String, default: Double): Double =
          s.conf.getOption(key)
            .map(raw => raw.trim.toDoubleOption.filter(_ > 0).getOrElse(
              throw new IllegalArgumentException(
                s"$key must be a positive number, got '$raw'")))
            .getOrElse(default)
        // integer confs parse as integers: a fractional
        // maxQuadraticPairs would pass a double filter, floor to 0 in
        // toLong, and die later with an error naming neither the key
        // nor the user's value (r11 review) — fail fast here instead,
        // the maxExactRows convention
        def posLongConf(key: String, default: Long): Long =
          s.conf.getOption(key)
            .map(raw => raw.trim.toLongOption.filter(_ > 0).getOrElse(
              throw new IllegalArgumentException(
                s"$key must be a positive integer, got '$raw'")))
            .getOrElse(default)
        val pairs =
          if (T.footerRowCount(s, d, "documents") <= maxExact)
            PrefixJoin.quadraticPairs(docs, "doc_id", "g", Seq("lang", "lb"), 0.35)
          else PrefixJoin.jaccardPairsAuto(docs, "doc_id", "g",
            Seq("lang", "lb"), 0.35,
            denseRatio = posConf("graft.d4.densePrefixRatio", 0.5),
            maxQuadraticPairs =
              posLongConf("graft.d4.maxQuadraticPairs", 20000000000L),
            ceilingHint = "set graft.d4.maxQuadraticPairs (this call " +
              "site's conf-backed ceiling)",
            // the per-round testdata dir is an immutable snapshot, so the
            // routing decision is cached across plan builds (r13): only
            // the FIRST build above maxExactRows pays the probe's
            // scouting aggregates; explain/audit/bench-rep rebuilds run
            // zero probe jobs (PrefixJoinSpec pins both halves)
            snapshotKey = Some(s"d4:$d")).pairs
        pairs
          .select(col("lang"), col("id1"), col("id2"), col("jaccard"))
          // land the (small) pair output on a shuffle boundary before the
          // global sort: RangePartitioning samples its child to pick
          // bounds, and without this the sampler re-runs the in-block
          // pair scan — the query's entire cost — a second time. The
          // extra exchange moves ~|pairs| rows; the scan runs once.
          .repartition(col("lang"))
          .orderBy(col("lang"), col("id1"), col("id2"))
      },
      Some("""WITH g AS (
             |  SELECT lang, n_chars // 32 AS lb, doc_id,
             |    list_distinct(list_transform(
             |      range(1, greatest(length(regexp_replace(trim(lower(text)), ' +', ' ', 'g')) - 2, 0) + 1),
             |      i -> substring(regexp_replace(trim(lower(text)), ' +', ' ', 'g'), CAST(i AS INT), 3))) AS gr
             |  FROM documents)
             |SELECT a.lang AS lang, a.doc_id AS id1, b.doc_id AS id2,
             |  CAST(len(list_intersect(a.gr, b.gr)) AS DOUBLE)
             |    / (len(a.gr) + len(b.gr) - len(list_intersect(a.gr, b.gr))) AS jaccard
             |FROM g a JOIN g b ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
             |WHERE CAST(len(list_intersect(a.gr, b.gr)) AS DOUBLE)
             |    / (len(a.gr) + len(b.gr) - len(list_intersect(a.gr, b.gr))) >= 0.35
             |ORDER BY a.lang, id1, id2""".stripMargin),
      doc = "dedup/ngram-jaccard exact, length-bucket blocked; SURVEY C2"),

    // D5: brute-force cosine top-k over the embedding column — the exact
    // ANN baseline. Embeddings are quantized to an integer grid first so
    // dot/norm sums are exact integers (engine-portable doubles); ranking
    // ties break on vec_id. Query side is broadcast; corpus side streams.
    QueryDef(
      "d5_cosine_topk",
      (s, d) => {
        val q = expr("transform(embedding, x -> CAST(floor(x * 1000 + 0.5) AS BIGINT))")
        val base = T.embeddings(s, d).select(col("vec_id"), q.as("q"))
          .withColumn("nn",
            expr("aggregate(zip_with(q, q, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
        val queries = base.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("q").as("qq"), col("nn").as("qn"))
        val pairs = base.join(broadcast(queries), col("vec_id") =!= col("qid"))
          .withColumn("dot",
            expr("aggregate(zip_with(q, qq, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
          .withColumn("cos",
            col("dot").cast("double") /
              sqrt(col("qn").cast("double") * col("nn").cast("double")))
        pairs
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))))
          .filter(col("rk") <= 5)
          .select(col("qid"), col("vec_id").as("eid"), col("cos"), col("rk"))
          .orderBy(col("qid"), col("rk"))
      },
      Some("""WITH e AS (
             |  SELECT vec_id,
             |    list_transform(embedding, x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS q
             |  FROM embeddings),
             |n AS (SELECT vec_id, q, list_dot_product(q, q) AS nn FROM e),
             |qs AS (SELECT vec_id AS qid, q AS qq, nn AS qn FROM n WHERE vec_id < 10),
             |pairs AS (
             |  SELECT qs.qid, n.vec_id AS eid,
             |    list_dot_product(n.q, qs.qq) / sqrt(qs.qn * n.nn) AS cos
             |  FROM qs JOIN n ON n.vec_id <> qs.qid),
             |r AS (SELECT qid, eid, cos,
             |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, eid) AS rk
             |      FROM pairs)
             |SELECT qid, eid, cos, rk FROM r WHERE rk <= 5
             |ORDER BY qid, rk""".stripMargin),
      doc = "similarity/brute-force cosine top-k (ANN baseline)"),

    // D5b: the same top-k ANN answer via the bounded-heap Aggregator
    // (functions/TopK) instead of window row_number: map-side combine keeps
    // ≤k rows per query per partition, so the shuffle carries k·partitions
    // rows instead of the full candidate set, and nothing is globally
    // sorted. Same oracle as d5 — identical output proves the rewrite.
    QueryDef(
      "d5b_cosine_topk_agg",
      (s0, d) => {
        // the bounded heap only stays a HASH aggregation while the task's
        // group count fits the ObjectHashAggregate fallback threshold —
        // build the plan on a scoped session clone carrying the raised
        // threshold so a wider query side never silently sorts (TopK doc)
        val s = graft.functions.TopK.sessionWithHashAggCapacity(s0)
        val q = expr("transform(embedding, x -> CAST(floor(x * 1000 + 0.5) AS BIGINT))")
        val base = T.embeddings(s, d).select(col("vec_id"), q.as("q"))
          .withColumn("nn",
            expr("aggregate(zip_with(q, q, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
        val queries = base.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("q").as("qq"), col("nn").as("qn"))
        val pairs = base.join(broadcast(queries), col("vec_id") =!= col("qid"))
          .withColumn("dot",
            expr("aggregate(zip_with(q, qq, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
          .withColumn("cos",
            col("dot").cast("double") /
              sqrt(col("qn").cast("double") * col("nn").cast("double")))
        pairs.groupBy(col("qid"))
          .agg(graft.functions.TopK.udaf(5)(col("cos"), col("vec_id")).as("top"))
          .select(col("qid"), posexplode(col("top")).as(Seq("rk0", "sc")))
          .select(col("qid"), col("sc._2").as("eid"), col("sc._1").as("cos"),
            (col("rk0") + 1).cast("int").as("rk"))
          .orderBy(col("qid"), col("rk"))
      },
      Some("""WITH e AS (
             |  SELECT vec_id,
             |    list_transform(embedding, x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS q
             |  FROM embeddings),
             |n AS (SELECT vec_id, q, list_dot_product(q, q) AS nn FROM e),
             |qs AS (SELECT vec_id AS qid, q AS qq, nn AS qn FROM n WHERE vec_id < 10),
             |pairs AS (
             |  SELECT qs.qid, n.vec_id AS eid,
             |    list_dot_product(n.q, qs.qq) / sqrt(qs.qn * n.nn) AS cos
             |  FROM qs JOIN n ON n.vec_id <> qs.qid),
             |r AS (SELECT qid, eid, cos,
             |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, eid) AS rk
             |      FROM pairs)
             |SELECT qid, eid, cos, CAST(rk AS INT) AS rk FROM r WHERE rk <= 5
             |ORDER BY qid, rk""".stripMargin),
      doc = "similarity/top-k via bounded-heap Aggregator (no window sort)"),

    // D6: LSH-bucketed approximate nearest neighbours — 8-bit deterministic
    // random-hyperplane signature; candidates share a signature, verified by
    // exact cosine ≥ 0.2. The scale path: bucket join replaces the N×Q
    // cross join of d5.
    QueryDef(
      "d6_ann_lsh",
      (s, d) => {
        graft.functions.GraftExtensions.registerInto(s)
        val q = expr("transform(embedding, x -> CAST(floor(x * 1000 + 0.5) AS BIGINT))")
        val base = T.embeddings(s, d)
          .select(col("vec_id"), q.as("q"),
            expr("hyperplane_sig(embedding, 8)").as("sig"))
          .withColumn("nn",
            expr("aggregate(zip_with(q, q, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
        val a = base.select(col("sig"), col("vec_id").as("id1"),
          col("q").as("q1"), col("nn").as("n1"))
        val b = base.select(col("sig").as("sig2"), col("vec_id").as("id2"),
          col("q").as("q2"), col("nn").as("n2"))
        a.join(b, col("sig") === col("sig2") && col("id1") < col("id2"))
          .withColumn("dot",
            expr("aggregate(zip_with(q1, q2, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
          .withColumn("cos",
            col("dot").cast("double") /
              sqrt(col("n1").cast("double") * col("n2").cast("double")))
          .filter(col("cos") >= 0.2)
          .select(col("id1"), col("id2"), col("cos"))
          .orderBy(col("id1"), col("id2"))
      },
      // Full sketch re-derivation in DuckDB: the hyperplane weights are
      // BIGINT arithmetic, and the float32 semantics line up exactly —
      // Scala's `vec(i) * m` is a Float×Long→Float (float32) multiply
      // accumulated into a Double, which DuckDB reproduces as
      // (FLOAT * m::FLOAT)::DOUBLE summed in element order by
      // list_reduce; the quantized q/nn/dot values are exact BIGINTs, so
      // the cosines are identical doubles. Recall additionally pinned by
      // SketchesSpec/AnnSpec.
      Some("""WITH base AS (
             |  SELECT vec_id,
             |         [floor((embedding[i] * 1000)::DOUBLE + 0.5)::BIGINT
             |          FOR i IN range(1, len(embedding) + 1)] AS q,
             |         list_sum([CASE WHEN
             |             list_reduce([(embedding[i] *
             |                 (((2654435761 + 40503 * (j * 131 + (i - 1))) % 2001
             |                   - 1000)::FLOAT))::DOUBLE
             |                 FOR i IN range(1, len(embedding) + 1)],
             |               (a, b) -> a + b) > 0
             |           THEN 1 << j ELSE 0 END FOR j IN range(0, 8)]) AS sig
             |  FROM embeddings),
             |withnn AS (
             |  SELECT vec_id, q, sig,
             |         list_reduce([q[i] * q[i] FOR i IN range(1, len(q) + 1)],
             |                     (a, b) -> a + b) AS nn
             |  FROM base),
             |pairs AS (
             |  SELECT a.vec_id AS id1, b.vec_id AS id2,
             |         list_reduce([a.q[i] * b.q[i] FOR i IN range(1, len(a.q) + 1)],
             |                     (x, y) -> x + y) AS dot,
             |         a.nn AS n1, b.nn AS n2
             |  FROM withnn a JOIN withnn b ON a.sig = b.sig AND a.vec_id < b.vec_id)
             |SELECT id1, id2, dot::DOUBLE / sqrt(n1::DOUBLE * n2::DOUBLE) AS cos
             |FROM pairs WHERE dot::DOUBLE / sqrt(n1::DOUBLE * n2::DOUBLE) >= 0.2
             |ORDER BY id1, id2""".stripMargin),
      doc = "similarity/ann hyperplane-LSH; scale path for d5"),

    // D7: IVF-style ANN — coarse quantizer (sampled centroids, no Lloyd
    // iterations: deterministic `vec_id % 50` seeds; production retrains
    // offline) assigns every vector to its nearest centroid; queries probe
    // the 2 nearest inverted lists and run exact cosine + bounded-heap
    // top-k inside them. Search cost scales with list size, not corpus
    // size — the complementary scale path to d6's hyperplane LSH.
    QueryDef(
      "d7_ann_ivf",
      (s0, d) => {
        val s = graft.functions.TopK.sessionWithHashAggCapacity(s0) // see TopK doc
        val q = expr("transform(embedding, x -> CAST(floor(x * 1000 + 0.5) AS BIGINT))")
        // four consumers (centroids, assignment, listing, probes) with
        // different prunings re-derive the quantized frame — lazy persist
        // shares one pass (tiny: |vectors| × dim longs; the cache
        // contract documented in Analyses.positioned)
        val base = SharedFrame(
          T.embeddings(s, d).select(col("vec_id"), q.as("q"))
            .withColumn("nn",
              expr("aggregate(zip_with(q, q, (a, b) -> a * b), 0L, (acc, x) -> acc + x)")),
          "d7_base", d)
        // centroid count must be CAPPED, not a fixed fraction: vec_id % 50
        // grows the broadcast and the O(N·K) assignment linearly with N.
        // Real IVF uses fixed K; the stride widens (footer count, zero
        // jobs — d4's dispatch pattern) so K ≈ min(N/50, 4096). At the
        // test scales N/4096 < 50, so the selection is unchanged there.
        val stride = math.max(50L,
          T.footerRowCount(s, d, "embeddings") / 4096L)
        val cents = base.filter(col("vec_id") % stride === 0)
          .select(col("vec_id").as("cid"), col("q").as("cq"), col("nn").as("cn"))
        val simToCent =
          expr("aggregate(zip_with(q, cq, (a, b) -> a * b), 0L, (acc, x) -> acc + x)")
            .cast("double") / sqrt(col("nn").cast("double") * col("cn").cast("double"))
        // inverted lists: every vector -> nearest centroid
        val assigned = base.join(broadcast(cents))
          .withColumn("sim", simToCent)
          .groupBy(col("vec_id"))
          .agg(max_by(col("cid"), struct(col("sim"), -col("cid"))).as("list_id"))
        val listed = base.join(assigned, "vec_id")
        // queries probe their 2 nearest lists
        val probes = base.filter(col("vec_id") < 10).join(broadcast(cents))
          .withColumn("sim", simToCent)
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("cid"))))
          .filter(col("rk") <= 2)
          .select(col("vec_id").as("qid"), col("q").as("qq"), col("nn").as("qn"),
            col("cid").as("probe_list"))
        val cand = probes.join(listed,
          col("list_id") === col("probe_list") && col("vec_id") =!= col("qid"))
        cand
          .withColumn("dot",
            expr("aggregate(zip_with(q, qq, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
          .withColumn("cos",
            col("dot").cast("double") /
              sqrt(col("qn").cast("double") * col("nn").cast("double")))
          .dropDuplicates("qid", "vec_id")
          .groupBy(col("qid"))
          .agg(graft.functions.TopK.udaf(5)(col("cos"), col("vec_id")).as("top"))
          .select(col("qid"), posexplode(col("top")).as(Seq("rk0", "sc")))
          .select(col("qid"), col("sc._2").as("eid"), col("sc._1").as("cos"),
            (col("rk0") + 1).cast("int").as("rk"))
          .orderBy(col("qid"), col("rk"))
      },
      // Full index re-derivation in DuckDB: centroid selection, nearest-
      // list assignment (row_number over (sim DESC, cid ASC) = Spark's
      // max_by(cid, struct(sim, -cid)) tiebreak), 2-probe and the top-5
      // are all exact BIGINT dots / identical-double cosines. The stride
      // is the literal 50: footerRowCount/4096 < 50 at every test SF
      // (the cap only widens beyond ~205k vectors). Recall/determinism
      // additionally pinned vs brute force in AnnSpec.
      Some("""WITH base AS (
             |  SELECT vec_id,
             |         [floor((embedding[i] * 1000)::DOUBLE + 0.5)::BIGINT
             |          FOR i IN range(1, len(embedding) + 1)] AS q
             |  FROM embeddings),
             |withnn AS (
             |  SELECT vec_id, q,
             |         list_reduce([q[i] * q[i] FOR i IN range(1, len(q) + 1)],
             |                     (a, b) -> a + b) AS nn
             |  FROM base),
             |cents AS (
             |  SELECT vec_id AS cid, q AS cq, nn AS cn FROM withnn WHERE vec_id % 50 = 0),
             |simsc AS (
             |  SELECT v.vec_id, v.q, v.nn, c.cid,
             |         list_reduce([v.q[i] * c.cq[i] FOR i IN range(1, len(v.q) + 1)],
             |                     (a, b) -> a + b)::DOUBLE
             |           / sqrt(v.nn::DOUBLE * c.cn::DOUBLE) AS sim
             |  FROM withnn v CROSS JOIN cents c),
             |assigned AS (
             |  SELECT vec_id, cid AS list_id FROM (
             |    SELECT vec_id, cid,
             |           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) AS rn
             |    FROM simsc) WHERE rn = 1),
             |probes AS (
             |  SELECT vec_id AS qid, q AS qq, nn AS qn, cid AS probe_list FROM (
             |    SELECT s.vec_id, s.q, s.nn, s.cid,
             |           row_number() OVER (PARTITION BY s.vec_id ORDER BY s.sim DESC, s.cid ASC) AS rn
             |    FROM simsc s WHERE s.vec_id < 10) WHERE rn <= 2),
             |cand AS (
             |  SELECT DISTINCT p.qid, p.qq, p.qn, v.vec_id, v.q, v.nn
             |  FROM probes p
             |  JOIN assigned a ON a.list_id = p.probe_list AND a.vec_id != p.qid
             |  JOIN withnn v ON v.vec_id = a.vec_id),
             |scored AS (
             |  SELECT qid, vec_id AS eid,
             |         list_reduce([q[i] * qq[i] FOR i IN range(1, len(q) + 1)],
             |                     (a, b) -> a + b)::DOUBLE
             |           / sqrt(qn::DOUBLE * nn::DOUBLE) AS cos
             |  FROM cand),
             |ranked AS (
             |  SELECT qid, eid, cos,
             |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, eid ASC) AS rk
             |  FROM scored)
             |SELECT qid, eid, cos, rk::INT AS rk FROM ranked WHERE rk <= 5
             |ORDER BY qid, rk""".stripMargin),
      doc = "similarity/ann IVF inverted lists + bounded-heap top-k"),

    // D8: embedding-cosine near-duplicate detection with canonical
    // assignment — the embedding analogue of d1/d2: banded 32-bit
    // hyperplane signatures (4×8) generate candidates linearly in N,
    // exact integer-quantized cosine verifies them, and connected
    // components collapse duplicate groups to a canonical member (min
    // vec_id). Every vector appears once; non-duplicates map to
    // themselves. Components are GraphX-iterative (actions inside the
    // builder, like c3's documented exception). Scale shape: the band
    // self-join carries IDS ONLY (d2's contract — vectors never ride the
    // band shuffle), the verified dup mapping is materialized to a scratch
    // parquet (the natural shuffle-boundary checkpoint at 100 TB), and
    // every cache the query created — dupPairs AND GraphX's Pregel
    // internals — is released before the final lazy plan is returned, so
    // nothing leaks into later queries of the session.
    QueryDef(
      "d8_embedding_neardup",
      (s, d) => {
        val cachedBefore = s.sparkContext.getPersistentRDDs.keySet
        graft.functions.GraftExtensions.registerInto(s)
        val q = expr("transform(embedding, x -> CAST(floor(x * 1000 + 0.5) AS BIGINT))")
        // band shuffle carries (band, vec_id) only; q/nn join back per
        // candidate afterwards (column-pruned re-scan, d2's shape)
        val banded = T.embeddings(s, d)
          .select(col("vec_id"), expr("hyperplane_sig(embedding, 32)").as("sig"))
          .select(col("vec_id"),
            explode(expr("transform(sequence(0, 3), b -> " +
              "concat(b, ':', CAST(shiftright(sig, b * 8) & 255 AS STRING)))"))
              .as("band"))
        val cand = banded.select(col("band"), col("vec_id").as("id1"))
          .join(banded.select(col("band").as("bb"), col("vec_id").as("id2")),
            col("band") === col("bb") && col("id1") < col("id2"))
          .select(col("id1"), col("id2"))
          .dropDuplicates("id1", "id2")
        val vecs = T.embeddings(s, d).select(col("vec_id"), q.as("q"))
          .withColumn("nn",
            expr("aggregate(zip_with(q, q, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
        val dupPairs = cand
          .join(vecs.select(col("vec_id").as("id1"), col("q").as("q1"),
            col("nn").as("n1")), "id1")
          .join(vecs.select(col("vec_id").as("id2"), col("q").as("q2"),
            col("nn").as("n2")), "id2")
          .withColumn("dot",
            expr("aggregate(zip_with(q1, q2, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
          .withColumn("cos",
            col("dot").cast("double") /
              sqrt(col("n1").cast("double") * col("n2").cast("double")))
          .filter(col("cos") >= 0.98)
          .select(col("id1"), col("id2"))
          // CC is GraphX-iterative: its vertex and edge RDDs each pull
          // from this plan, so persist the verified pairs once — the
          // isEmpty probe and both CC inputs then read the cache instead
          // of re-running the candidate-join + cosine-verify pipeline.
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // clean corpora are the common case: skip the iterative CC jobs
        // entirely when no pair survives verification
        val mapped =
          if (dupPairs.isEmpty) {
            dupPairs.unpersist(blocking = true)
            import s.implicits._
            Seq.empty[(Long, Long)].toDF("vid", "cid")
          } else {
            val comp = graft.pangenome.GraphFallback.similarityComponents(s, dupPairs)
            val canon = comp.groupBy(col("component"))
              .agg(min(col("member").cast("long")).as("cid"))
            val plan = comp.join(canon, "component")
              .select(col("member").cast("long").as("vid"), col("cid"))
            // materialize the (small) dup mapping once, then drop every
            // cache this query created: our own pairs persist explicitly,
            // GraphX's internals via the level-filtered sweep (which
            // leaves other threads' MEMORY_AND_DISK persists alone); the
            // returned plan reads the scratch parquet, so nothing
            // downstream needs the caches
            val scratch = Scratch.uniqueDir(s, "d8_mapped")
            plan.write.mode("overwrite").parquet(scratch)
            dupPairs.unpersist(blocking = true)
            graft.pangenome.GraphFallback
              .releaseGraphXCaches(s.sparkContext, cachedBefore)
            s.read.parquet(scratch)
          }
        T.embeddings(s, d).select(col("vec_id"))
          .join(mapped, col("vec_id") === col("vid"), "left")
          .select(col("vec_id"),
            coalesce(col("cid"), col("vec_id")).as("canonical_id"),
            (col("cid").isNotNull && col("cid") =!= col("vec_id")).cast("int")
              .as("is_dup"))
          .orderBy(col("vec_id"))
      },
      // Full re-derivation in DuckDB including the connected components:
      // the 32-plane signature / bands / verified pairs are the d6-style
      // exact arithmetic, and GraphX's CC becomes a recursive-CTE
      // transitive closure (union-distinct terminates; dup groups are
      // tiny by construction) with canonical = least(v, min reachable).
      // Planted-duplicate groups additionally pinned in AnnSpec.
      Some("""WITH RECURSIVE sigs AS (
             |  SELECT vec_id,
             |         [floor((embedding[i] * 1000)::DOUBLE + 0.5)::BIGINT
             |          FOR i IN range(1, len(embedding) + 1)] AS q,
             |         list_sum([CASE WHEN
             |             list_reduce([(embedding[i] *
             |                 (((2654435761 + 40503 * (j * 131 + (i - 1))) % 2001
             |                   - 1000)::FLOAT))::DOUBLE
             |                 FOR i IN range(1, len(embedding) + 1)],
             |               (a, b) -> a + b) > 0
             |           THEN 1::BIGINT << j ELSE 0 END FOR j IN range(0, 32)]) AS sig
             |  FROM embeddings),
             |withnn AS (
             |  SELECT vec_id, q, sig,
             |         list_reduce([q[i] * q[i] FOR i IN range(1, len(q) + 1)],
             |                     (a, b) -> a + b) AS nn
             |  FROM sigs),
             |banded AS (
             |  SELECT vec_id,
             |         unnest([b::VARCHAR || ':' || ((sig // (1::BIGINT << (b * 8))) % 256)::VARCHAR
             |                 FOR b IN range(0, 4)]) AS band
             |  FROM withnn),
             |cand AS (
             |  SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
             |  FROM banded a JOIN banded b ON a.band = b.band AND a.vec_id < b.vec_id),
             |dup AS (
             |  SELECT id1, id2 FROM (
             |    SELECT c.id1, c.id2,
             |           list_reduce([x.q[i] * y.q[i] FOR i IN range(1, len(x.q) + 1)],
             |                       (a, b) -> a + b)::DOUBLE
             |             / sqrt(x.nn::DOUBLE * y.nn::DOUBLE) AS cos
             |    FROM cand c JOIN withnn x ON c.id1 = x.vec_id
             |                JOIN withnn y ON c.id2 = y.vec_id)
             |  WHERE cos >= 0.98),
             |edges AS (SELECT id1 AS a, id2 AS b FROM dup UNION SELECT id2, id1 FROM dup),
             |reach AS (
             |  SELECT a, b FROM edges
             |  UNION
             |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
             |canon AS (SELECT a AS vid, least(a, min(b)) AS cid FROM reach GROUP BY a)
             |SELECT e.vec_id,
             |       coalesce(c.cid, e.vec_id) AS canonical_id,
             |       (c.cid IS NOT NULL AND c.cid != e.vec_id)::INT AS is_dup
             |FROM embeddings e LEFT JOIN canon c ON e.vec_id = c.vid
             |ORDER BY e.vec_id""".stripMargin),
      doc = "dedup/embedding-cosine near-dup + canonical id; brief's dedup list"),

    // D9: duplicate n-gram span detection — the exact-substring face of
    // training-data dedup (Lee et al. 2022, "Deduplicating Training Data
    // Makes Language Models Better"): every word-level 6-gram occurring in
    // more than one document is a duplicated span; report per document how
    // much of it such spans cover. Scale shape: grams are digested BEFORE
    // the shuffle (the hashed_ngrams codegen kernel — one reusable buffer,
    // 8-byte keys on the wire; the oracle groups by the gram text, which
    // is count-equal modulo 64-bit collisions, d4's convention), and the
    // gram stream is derived ONCE — partial counts keyed (digest, doc) ->
    // a digest-partitioned window for the distinct-doc count -> a
    // doc-keyed rollup. No join back to the gram stream, so nothing heavy
    // runs twice; the totals side re-reads only (doc_id, text). 6 rides
    // above the incidental-overlap floor of the corpus vocabulary
    // (4-grams collide by chance; 6-gram sharing means copied spans).
    QueryDef(
      "d9_dup_ngram_spans",
      (s, d) => {
        graft.functions.GraftExtensions.registerInto(s)
        val n = 6
        val toks = filter(split(lower(col("text")), " "), x => x =!= "")
        val base = T.documents(s, d).select(col("doc_id"), toks.as("ts"))
        val perGramDoc = base
          .select(col("doc_id"), explode(expr(s"hashed_ngrams(ts, $n)")).as("h"))
          .groupBy(col("h"), col("doc_id"))
          .agg(count(lit(1)).as("pos_in_doc"))
        val dupPerDoc = perGramDoc
          // rows are (gram, doc)-unique, so a plain count over the digest
          // partition IS the distinct-document count — no second distinct
          .withColumn("docs_with", count(lit(1)).over(Window.partitionBy(col("h"))))
          .filter(col("docs_with") > 1)
          .groupBy(col("doc_id"))
          .agg(sum(col("pos_in_doc")).as("dp"), count(lit(1)).as("dg"))
        base
          .select(col("doc_id"),
            greatest(size(col("ts")) - (n - 1), lit(0)).cast("long").as("n_grams"))
          .join(dupPerDoc, Seq("doc_id"), "left")
          .withColumn("n_dup_positions", coalesce(col("dp"), lit(0L)))
          .withColumn("n_dup_grams", coalesce(col("dg"), lit(0L)))
          .select(col("doc_id"), col("n_grams"), col("n_dup_positions"), col("n_dup_grams"),
            when(col("n_grams") > 0,
              col("n_dup_positions").cast("double") / col("n_grams"))
              .otherwise(0.0).as("dup_ratio"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(str_split(lower(text), ' '), x -> x <> '') AS ts
             |  FROM documents),
             |pos AS (
             |  SELECT doc_id, ts, unnest(range(1, greatest(len(ts) - 4, 1))) AS i FROM toks),
             |grams AS (
             |  SELECT doc_id, md5(array_to_string(ts[i : i + 5], ' ')) AS h FROM pos),
             |per AS (
             |  SELECT h, doc_id, count(*) AS pos_in_doc FROM grams GROUP BY h, doc_id),
             |dup AS (
             |  SELECT doc_id, CAST(sum(pos_in_doc) AS BIGINT) AS dp, count(*) AS dg
             |  FROM (SELECT *, count(*) OVER (PARTITION BY h) AS docs_with FROM per)
             |  WHERE docs_with > 1 GROUP BY doc_id)
             |SELECT t.doc_id,
             |  CAST(greatest(len(ts) - 5, 0) AS BIGINT) AS n_grams,
             |  coalesce(dp, 0) AS n_dup_positions,
             |  coalesce(dg, 0) AS n_dup_grams,
             |  CASE WHEN len(ts) - 5 > 0
             |       THEN CAST(coalesce(dp, 0) AS DOUBLE) / (len(ts) - 5)
             |       ELSE 0.0 END AS dup_ratio
             |FROM toks t LEFT JOIN dup USING (doc_id) ORDER BY doc_id""".stripMargin),
      doc = "dedup/exact duplicate n-gram spans across documents; brief's dedup list"),

    // D9b: maximal duplicated spans — d9's positions merged into the span
    // list a training pipeline actually edits with (Lee et al. 2022 remove
    // the SPAN, not the document): per doc, every token range covered by
    // cross-document duplicated 6-grams, overlapping/adjacent coverage
    // merged. The hashed_ngrams kernel emits digests whose array INDEX is
    // the gram position, so posexplode recovers (position, digest) with no
    // struct building; the merge is gaps-and-islands per document: 6-gram
    // coverage intervals all have equal length, so "new island" is just
    // pos > lag(pos) + 6 — no running-max window. Every shuffle is keyed
    // by digest or doc hash; nothing global.
    QueryDef(
      "d9b_dup_span_merge",
      (s, d) => {
        graft.functions.GraftExtensions.registerInto(s)
        val n = 6
        val toks = filter(split(lower(col("text")), " "), x => x =!= "")
        val base = T.documents(s, d).select(col("doc_id"), toks.as("ts"))
        val gramStream = base
          .select(col("doc_id"),
            posexplode(expr(s"hashed_ngrams(ts, $n)")).as(Seq("pos0", "h")))
          .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("h"))
        // the duplicated-digest set is UNBOUNDED — over a real web corpus
        // the n-grams occurring in >1 document are billions of rows (the
        // very workload substring dedup targets), so it must NOT be
        // force-broadcast (a broadcast() hint overrides Spark's size limit
        // and OOMs the driver at exactly the scale this operator exists
        // for). The static plan is a shuffled equi-join on the 8-byte
        // digest — the scale-safe form — and AQE upgrades it to a runtime
        // broadcast when the measured dup set is actually small (the
        // sf0.1/clean-corpus case), which is the right dispatch: decided
        // by observed size, not by an asserted comment. countDistinct
        // still runs map-side-partial on (h, doc); the stream is derived
        // twice, but both derivations are scan+project — no exchange.
        // SKEW posture (SkewSpec): a pathologically hot digest (site
        // boilerplate shared by ~every doc) fattens one fact partition,
        // and AQE CANNOT skew-split this join — the dim side's
        // HashAggregate sits between its shuffle and the join, which the
        // skew rule's both-children-are-shuffle-stages pattern excludes
        // (pinned negatively in SkewSpec). At that point the mitigation
        // is Skew.saltedJoin(gramStream, dupH, "h", salts) or
        // materializing dupH first; the clean-corpus default needs
        // neither.
        val dupH = gramStream
          .groupBy(col("h"))
          .agg(countDistinct(col("doc_id")).as("nd"))
          .filter(col("nd") > 1)
          .select(col("h"))
        val dupPos = gramStream.join(dupH, Seq("h"))
          .select(col("doc_id"), col("pos"))
        islandSpans(dupPos, n)
          .orderBy(col("doc_id"), col("span_start"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(str_split(lower(text), ' '), x -> x <> '') AS ts
             |  FROM documents),
             |pos AS (
             |  SELECT doc_id, ts, unnest(range(1, greatest(len(ts) - 4, 1))) AS i FROM toks),
             |grams AS (
             |  SELECT doc_id, i, md5(array_to_string(ts[i : i + 5], ' ')) AS h FROM pos),
             |dup AS (
             |  SELECT h FROM grams GROUP BY h HAVING count(DISTINCT doc_id) > 1),
             |dp AS (
             |  SELECT doc_id, i AS p FROM grams JOIN dup USING (h)),
             |isl AS (
             |  SELECT doc_id, p,
             |    CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL THEN 1
             |         WHEN p > lag(p) OVER (PARTITION BY doc_id ORDER BY p) + 6 THEN 1
             |         ELSE 0 END AS new_island
             |  FROM dp),
             |grp AS (
             |  SELECT doc_id, p,
             |    sum(new_island) OVER (PARTITION BY doc_id ORDER BY p
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
             |  FROM isl)
             |SELECT doc_id,
             |  CAST(min(p) AS BIGINT) AS span_start,
             |  CAST(max(p) + 5 AS BIGINT) AS span_end,
             |  CAST(max(p) + 5 - min(p) + 1 AS BIGINT) AS n_tokens
             |FROM grp GROUP BY doc_id, island
             |ORDER BY doc_id, span_start""".stripMargin),
      doc = "dedup/maximal duplicated span merge (gaps-and-islands over d9 positions)"),

    // T1: language identification — stopword-overlap scoring against
    // per-language seed lists, deterministic argmax (alphabetical tiebreak).
    QueryDef(
      "t1_lang_id",
      (s, d) => {
        def score(words: Seq[String]) =
          size(array_intersect(array_distinct(split(lower(col("text")), " ")),
            array(words.map(lit): _*)))
        val scored = T.documents(s, d)
          .withColumn("s_de", score(Seq("der", "die", "und", "ist", "von")))
          .withColumn("s_en", score(Seq("the", "a", "of", "and", "is")))
          .withColumn("s_es", score(Seq("el", "los", "y", "de", "es")))
          .withColumn("s_fr", score(Seq("le", "la", "et", "de", "est")))
        val best = greatest(col("s_de"), col("s_en"), col("s_es"), col("s_fr"))
        scored.select(col("doc_id"),
            when(best === 0, "unknown")
              .when(col("s_de") === best, "de")
              .when(col("s_en") === best, "en")
              .when(col("s_es") === best, "es")
              .otherwise("fr").as("pred_lang"),
            best.as("score"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH sc AS (
             |  SELECT doc_id,
             |    len(list_intersect(list_distinct(str_split(lower(text), ' ')),
             |        ['der','die','und','ist','von'])) AS s_de,
             |    len(list_intersect(list_distinct(str_split(lower(text), ' ')),
             |        ['the','a','of','and','is'])) AS s_en,
             |    len(list_intersect(list_distinct(str_split(lower(text), ' ')),
             |        ['el','los','y','de','es'])) AS s_es,
             |    len(list_intersect(list_distinct(str_split(lower(text), ' ')),
             |        ['le','la','et','de','est'])) AS s_fr
             |  FROM documents)
             |SELECT doc_id,
             |  CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'unknown'
             |       WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
             |       WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
             |       WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
             |       ELSE 'fr' END AS pred_lang,
             |  greatest(s_de, s_en, s_es, s_fr) AS score
             |FROM sc ORDER BY doc_id""".stripMargin),
      doc = "text/lang-id n-gram heuristic"),

    // T2: quality scoring — length, mean token length, stopword ratio,
    // alpha ratio folded into one score. Integer-derived doubles keep the
    // oracle exact.
    QueryDef(
      "t2_quality_score",
      (s, d) => {
        val toks = filter(split(col("text"), " "), x => x =!= "")
        val nToks = size(toks)
        val nChars = length(col("text"))
        val stop = size(array_intersect(array_distinct(toks),
          array(Seq("the", "a", "of", "and", "is", "table", "row").map(lit): _*)))
        T.documents(s, d)
          .withColumn("n_toks", nToks)
          .withColumn("mean_tok_len",
            when(nToks > 0, (nChars - (nToks - 1)).cast("double") / nToks).otherwise(0.0))
          .withColumn("stop_ratio",
            when(nToks > 0, stop.cast("double") / nToks).otherwise(0.0))
          .withColumn("quality",
            when(col("n_toks") >= 5, 1.0).otherwise(0.0) * 0.4 +
              when(col("mean_tok_len").between(3.0, 10.0), 1.0).otherwise(0.0) * 0.3 +
              when(col("stop_ratio") > 0, 1.0).otherwise(0.0) * 0.3)
          .select(col("doc_id"), col("n_toks"), col("mean_tok_len"),
            col("stop_ratio"), col("quality"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, text,
             |    len(list_filter(str_split(text, ' '), x -> x <> '')) AS n_toks,
             |    len(list_intersect(
             |      list_distinct(list_filter(str_split(text, ' '), x -> x <> '')),
             |      ['the','a','of','and','is','table','row'])) AS stop
             |  FROM documents)
             |SELECT doc_id, n_toks,
             |  CASE WHEN n_toks > 0
             |       THEN CAST(length(text) - (n_toks - 1) AS DOUBLE) / n_toks
             |       ELSE 0.0 END AS mean_tok_len,
             |  CASE WHEN n_toks > 0 THEN CAST(stop AS DOUBLE) / n_toks
             |       ELSE 0.0 END AS stop_ratio,
             |  CASE WHEN n_toks >= 5 THEN 1.0 ELSE 0.0 END * 0.4 +
             |  CASE WHEN (CASE WHEN n_toks > 0
             |             THEN CAST(length(text) - (n_toks - 1) AS DOUBLE) / n_toks
             |             ELSE 0.0 END) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END * 0.3 +
             |  CASE WHEN stop > 0 THEN 1.0 ELSE 0.0 END * 0.3 AS quality
             |FROM t ORDER BY doc_id""".stripMargin),
      doc = "text/quality scoring"),

    // T3: token counting — whitespace tokens and a BPE-ish regex pass
    // (letter runs / digit runs / single other chars).
    QueryDef(
      "t3_token_count",
      (s, d) =>
        T.documents(s, d)
          .select(col("doc_id"),
            size(filter(split(col("text"), " "), x => x =!= "")).as("ws_tokens"),
            size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)")).as("re_tokens"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  len(list_filter(str_split(text, ' '), x -> x <> '')) AS ws_tokens,
             |  len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS re_tokens
             |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "text/token counting"),

    // T4: document fingerprint — rolling polynomial hash (base 31 mod
    // 1e9+7) over the character codepoints. One codegen pass over the
    // UTF-8 bytes (functions.RollingHashExpr); the builtin-chain form it
    // replaced (split into per-char strings + aggregate fold) allocated
    // two objects per character — ~3x the cost, VERDICT r4 note. The
    // equivalence of both forms on ASCII is pinned in GcContentExprSpec.
    QueryDef(
      "t4_fingerprint",
      (s, d) => {
        graft.functions.GraftExtensions.registerInto(s)
        T.documents(s, d)
          .filter(length(col("text")) > 0)
          .select(col("doc_id"),
            expr("rolling_hash(text)").as("fingerprint"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  list_reduce(
             |    list_prepend(CAST(0 AS BIGINT), list_transform(split(text, ''), x -> CAST(unicode(x) AS BIGINT))),
             |    (acc, c) -> (acc * 31 + c) % 1000000007) AS fingerprint
             |FROM documents WHERE length(text) > 0 ORDER BY doc_id""".stripMargin),
      doc = "text/fingerprint rolling hash"),

    // T5: within-document repetition metrics — the Gopher/MassiveText
    // repetition quality filters (Rae et al. 2021, §A1.1): the share of a
    // document occupied by its most frequent word bigram, and the fraction
    // of trigram positions whose trigram repeats inside the document
    // (d9 is the CROSS-document form of the same statistic). Counting is a
    // (doc_id, digest)-keyed aggregation — the shuffle key carries the doc
    // hash, so work distributes per document and no global structure
    // exists; grams shuffle as hashed_ngrams 8-byte digests (the gram text
    // never appears in the output, so only the digest needs to move).
    QueryDef(
      "t5_repetition",
      (s, d) => {
        graft.functions.GraftExtensions.registerInto(s)
        val toks = filter(split(lower(col("text")), " "), x => x =!= "")
        val base = T.documents(s, d).select(col("doc_id"), toks.as("ts"))
        def counts(n: Int) = base
          .select(col("doc_id"), explode(expr(s"hashed_ngrams(ts, $n)")).as("h"))
          .groupBy(col("doc_id"), col("h"))
          .agg(count(lit(1)).as("c"))
        val bg = counts(2).groupBy(col("doc_id"))
          .agg(max(col("c")).as("tb"), sum(col("c")).as("nb"))
        val tg = counts(3).groupBy(col("doc_id"))
          .agg(sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("dt"),
            sum(col("c")).as("nt"))
        base.select(col("doc_id"))
          .join(bg, Seq("doc_id"), "left")
          .join(tg, Seq("doc_id"), "left")
          .withColumn("top_bigram_count", coalesce(col("tb"), lit(0L)))
          .withColumn("n_bigrams", coalesce(col("nb"), lit(0L)))
          .withColumn("dup_tri_positions", coalesce(col("dt"), lit(0L)))
          .withColumn("n_trigrams", coalesce(col("nt"), lit(0L)))
          .select(col("doc_id"),
            col("top_bigram_count"), col("n_bigrams"),
            when(col("n_bigrams") > 0,
              col("top_bigram_count").cast("double") / col("n_bigrams"))
              .otherwise(0.0).as("top_bigram_frac"),
            col("dup_tri_positions"), col("n_trigrams"),
            when(col("n_trigrams") > 0,
              col("dup_tri_positions").cast("double") / col("n_trigrams"))
              .otherwise(0.0).as("dup_trigram_frac"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(str_split(lower(text), ' '), x -> x <> '') AS ts
             |  FROM documents),
             |bg AS (
             |  SELECT doc_id, md5(array_to_string(ts[i : i + 1], ' ')) AS h
             |  FROM (SELECT doc_id, ts, unnest(range(1, greatest(len(ts), 1))) AS i FROM toks)),
             |bagg AS (
             |  SELECT doc_id, CAST(max(c) AS BIGINT) AS tb, CAST(sum(c) AS BIGINT) AS nb
             |  FROM (SELECT doc_id, h, count(*) AS c FROM bg GROUP BY doc_id, h)
             |  GROUP BY doc_id),
             |tg AS (
             |  SELECT doc_id, md5(array_to_string(ts[i : i + 2], ' ')) AS h
             |  FROM (SELECT doc_id, ts, unnest(range(1, greatest(len(ts) - 1, 1))) AS i FROM toks)),
             |tagg AS (
             |  SELECT doc_id,
             |    CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dt,
             |    CAST(sum(c) AS BIGINT) AS nt
             |  FROM (SELECT doc_id, h, count(*) AS c FROM tg GROUP BY doc_id, h)
             |  GROUP BY doc_id)
             |SELECT t.doc_id,
             |  coalesce(tb, 0) AS top_bigram_count,
             |  coalesce(nb, 0) AS n_bigrams,
             |  CASE WHEN coalesce(nb, 0) > 0 THEN CAST(tb AS DOUBLE) / nb ELSE 0.0 END
             |    AS top_bigram_frac,
             |  coalesce(dt, 0) AS dup_tri_positions,
             |  coalesce(nt, 0) AS n_trigrams,
             |  CASE WHEN coalesce(nt, 0) > 0 THEN CAST(dt AS DOUBLE) / nt ELSE 0.0 END
             |    AS dup_trigram_frac
             |FROM toks t LEFT JOIN bagg USING (doc_id) LEFT JOIN tagg USING (doc_id)
             |ORDER BY doc_id""".stripMargin),
      doc = "text/repetition quality metrics (Gopher rep-filters); brief's text-analysis list"),

    // M1: multimodal metadata — media as opaque binary + typed metadata;
    // content digest and a deterministic stand-in for decoded dimensions
    // (the real decoder is pluggable per SURVEY §2.9 / X1: external codecs
    // run via mapPartitions, stubbed in this container).
    QueryDef(
      "m1_multimodal_meta",
      (s, d) =>
        T.documents(s, d)
          .withColumn("blob", col("text").cast("binary"))
          .withColumn("sha", sha2(col("blob"), 256))
          .select(col("doc_id"),
            length(col("blob")).as("n_bytes"),
            col("sha"),
            ((ascii(substring(col("sha"), 1, 1)) * 256 +
              ascii(substring(col("sha"), 2, 1))) % 1024).as("fake_width"),
            ((ascii(substring(col("sha"), 3, 1)) * 256 +
              ascii(substring(col("sha"), 4, 1))) % 1024).as("fake_height"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  length(text) AS n_bytes,
             |  sha256(text) AS sha,
             |  (ascii(substring(sha256(text), 1, 1)) * 256 +
             |   ascii(substring(sha256(text), 2, 1))) % 1024 AS fake_width,
             |  (ascii(substring(sha256(text), 3, 1)) * 256 +
             |   ascii(substring(sha256(text), 4, 1))) % 1024 AS fake_height
             |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "multimodal/binary metadata + digest (decode stubbed)"),

    // M2: frame sampling — every-kth-offset windows over the binary payload
    // (video frame-sample analogue): one generator row per frame, digest per
    // frame. posexplode(sequence(...)) keeps the fan-out inside codegen.
    QueryDef(
      "m2_frame_sample",
      (s, d) =>
        T.documents(s, d)
          .filter(length(col("text")) >= 64)
          .select(col("doc_id"), col("text"),
            posexplode(expr("sequence(1, length(text) - 31, 50)"))
              .as(Seq("frame_idx", "off")))
          .select(col("doc_id"), col("frame_idx"),
            md5(expr("CAST(substring(text, off, 32) AS BINARY)")).as("frame_digest"))
          .orderBy(col("doc_id"), col("frame_idx")),
      Some("""WITH f AS (
             |  SELECT doc_id, text,
             |    unnest(range(1, length(text) - 30, 50)) AS off,
             |    unnest(range(0, (length(text) - 32) // 50 + 1)) AS frame_idx
             |  FROM documents WHERE length(text) >= 64)
             |SELECT doc_id, frame_idx, md5(substring(text, CAST(off AS INT), 32)) AS frame_digest
             |FROM f ORDER BY doc_id, frame_idx""".stripMargin),
      doc = "multimodal/frame sampling over opaque payloads"),

    // M2b: frame sampling over a REAL multi-frame container — the video
    // analogue of m3/m5's codec realism: a length-prefixed stream of
    // genuine PNG frames ("GRFT" | n | n × (len | png)), demuxed and
    // frame-sampled (every 2nd frame) with skipped frames never decoded —
    // only their length prefix is read to seek past them, so decode cost
    // scales with the SAMPLE while IO scales with the container, the
    // whole point of frame sampling at 100 TB. One ImageWriter/
    // ImageReader per CodecChunk docs, reused across the chunk's frames
    // (graft.functions.FrameContainer) — chunked so live payload bytes
    // stay bounded per executor. The closed-form frames keep
    // demux + sampling + decode DuckDB-oracle-checked end to end.
    QueryDef(
      "m2b_container_frames",
      (s, d) => {
        import s.implicits._
        containerPayloads(s, d).as[(Long, Array[Byte])]
          .mapPartitions(rows =>
            graft.functions.FrameContainer.decodeSampledPartition(rows, stride = 2))
          .toDF("doc_id", "frame_idx", "px_w", "px_h", "px_sum")
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      // the oracle re-derives every SAMPLED frame from the closed forms
      // (nFrames = 4 + id%5, sampled fi ∈ range(0, n, 2), dims
      // (8+(id+fi)%3) × (8+(id+2fi)%4), pixel = (7x+13y+131·id+fi) mod
      // 256) — DuckDB can't demux the container, but it doesn't need to
      Some("""WITH g AS (SELECT doc_id, CAST(4 + doc_id % 5 AS INT) AS n
             |            FROM documents),
             |f AS (SELECT doc_id, CAST(unnest(range(0, n, 2)) AS INT) AS fi FROM g),
             |d AS (SELECT doc_id, fi,
             |        CAST(8 + (doc_id + fi) % 3 AS INT) AS w,
             |        CAST(8 + (doc_id + 2 * fi) % 4 AS INT) AS h,
             |        131 * doc_id + fi AS seed
             |      FROM f)
             |SELECT doc_id,
             |  CAST(fi AS BIGINT) AS frame_idx,
             |  CAST(w AS BIGINT) AS px_w, CAST(h AS BIGINT) AS px_h,
             |  CAST(list_sum([((i % w) * 7 + (i // w) * 13 + seed) % 256
             |                 FOR i IN range(0, w * h)]) AS BIGINT) AS px_sum
             |FROM d ORDER BY doc_id, frame_idx""".stripMargin),
      doc = "multimodal/frame sampling over a real PNG-frame container (demux + sampled decode)"),

    // M3: batched decode → feature extraction over REAL PNG payloads.
    // Stage 1 synthesizes a deterministic grayscale PNG per doc — the
    // testdata tables carry no media, so payload generation rides inside
    // the query; on a real corpus this stage IS the stored binary column
    // (everything downstream of the (id, bytes) pair is payload-
    // agnostic). Stage 2 is the operator proper: binary column → batched
    // javax.imageio decode (ONE reusable ImageReader per 64-row batch,
    // graft.functions.PngCodec.decodeBatch — codec setup cost per batch,
    // not per row) → fixed-width features. The image's closed-form pixel
    // function makes every decoded feature SQL-recomputable, so the
    // DuckDB gate checks the whole encode→decode→feature pipeline: a
    // decoder bug, raster-order mix-up, or encode/decode asymmetry all
    // surface as hash mismatches.
    QueryDef(
      "m3_decode_features",
      (s, d) => {
        import s.implicits._
        pngPayloads(s, d).as[(Long, Array[Byte])]
          .mapPartitions(_.grouped(64).flatMap { batch =>
            graft.functions.PngCodec.decodeBatch(batch) { (id, w, h, px) =>
              var sum = 0L
              var i = 0
              while (i < px.length) { sum += px(i); i += 1 }
              (id, w.toLong, h.toLong, sum, px(0).toLong)
            }
          })
          .toDF("doc_id", "px_w", "px_h", "px_sum", "px_first")
          .orderBy(col("doc_id"))
      },
      // the oracle re-derives the decoded pixels from the closed form
      // (pixel(x,y) = (7x + 13y + doc_id) mod 256 at w = 8 + id%5,
      // h = 8 + id%7) — DuckDB can't decode PNG, but it doesn't need to
      Some("""WITH g AS (SELECT doc_id, CAST(8 + doc_id % 5 AS INT) AS w,
             |                         CAST(8 + doc_id % 7 AS INT) AS h
             |            FROM documents)
             |SELECT doc_id, CAST(w AS BIGINT) AS px_w, CAST(h AS BIGINT) AS px_h,
             |  CAST(list_sum([((i % w) * 7 + (i // w) * 13 + doc_id) % 256
             |                 FOR i IN range(0, w * h)]) AS BIGINT) AS px_sum,
             |  CAST(doc_id % 256 AS BIGINT) AS px_first
             |FROM g ORDER BY doc_id""".stripMargin),
      doc = "multimodal/batched decode + features over real PNGs (javax.imageio)"),

    // M4: resize — the brief's fourth multimodal verb, as a REAL 4×4
    // box-filter thumbnail over decoded PNG pixels (what every image
    // downsample is): bucket (bx,by) covers x ∈ [bx·w/4, (bx+1)·w/4) ×
    // the analogous y span and emits its floor-average. Same synthesize →
    // batched-decode shape as m3 (PngCodec.decodeBatch, one reader per
    // batch); the closed-form pixels keep the whole decode→resample
    // pipeline oracle-checked. Thumbnail is emitted array_join'd
    // row-major (the g8 convention for the driver's column-hash gate).
    QueryDef(
      "m4_resize_thumbnail",
      (s, d) => {
        import s.implicits._
        pngPayloads(s, d).as[(Long, Array[Byte])]
          .mapPartitions(_.grouped(64).flatMap { batch =>
            graft.functions.PngCodec.decodeBatch(batch) { (id, w, h, px) =>
              (id, w.toLong, h.toLong,
                graft.functions.PngCodec.boxThumb(w, h, px).mkString(","))
            }
          })
          .toDF("doc_id", "px_w", "px_h", "thumb")
          .orderBy(col("doc_id"))
      },
      // nested comprehension: outer b = thumbnail bucket, inner i = pixel
      // index, floor-averaged over the bucket's exact box. Buckets are
      // never empty here (w, h ≥ 8 ≥ 4); the codec's degenerate-bucket
      // -1 branch is pinned by MultimodalSpec instead.
      Some("""WITH g AS (SELECT doc_id, CAST(8 + doc_id % 5 AS INT) AS w,
             |                         CAST(8 + doc_id % 7 AS INT) AS h
             |            FROM documents)
             |SELECT doc_id, CAST(w AS BIGINT) AS px_w, CAST(h AS BIGINT) AS px_h,
             |  array_to_string([
             |     CAST(list_sum([((i % w) * 7 + (i // w) * 13 + doc_id) % 256
             |                    FOR i IN range(0, w * h)
             |                    IF (i % w) >= ((b % 4) * w) // 4
             |                     AND (i % w) < (((b % 4) + 1) * w) // 4
             |                     AND (i // w) >= ((b // 4) * h) // 4
             |                     AND (i // w) < (((b // 4) + 1) * h) // 4])
             |        // (((((b % 4) + 1) * w) // 4 - ((b % 4) * w) // 4)
             |           * ((((b // 4) + 1) * h) // 4 - ((b // 4) * h) // 4)) AS BIGINT)
             |     FOR b IN range(0, 16)], ',') AS thumb
             |FROM g ORDER BY doc_id""".stripMargin),
      doc = "multimodal/resize: 4×4 box-filter over real decoded PNG pixels"),

    // M5: audio decode → feature extraction over REAL WAV payloads — the
    // PNG story (m3/m4) replayed on the second modality: deterministic
    // 8-bit unsigned mono PCM synthesized per doc, decoded by a
    // registry-free RIFF chunk walk (WavCodec.decode — plain byte parse,
    // no shared provider state, so the decode stage parallelizes across
    // partitions like PNG), reduced to integer-only signal features
    // (amplitude sum, energy about the 128 midpoint, strict midpoint
    // crossings). The closed-form samples keep the whole
    // container→decoder→feature pipeline DuckDB-oracle-checked — a header
    // mix-up, signed/unsigned confusion, or sample-order bug all surface
    // as hash mismatches. WAV PCM is uncompressed (~1.06 bytes/sample),
    // so unlike the PNG family there is no Deflate cost to amortize; the
    // whole per-row cost is the O(n) chunk walk + the feature fold.
    QueryDef(
      "m5_audio_features",
      (s, d) => {
        import s.implicits._
        wavPayloads(s, d).as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, bytes) =>
            val (rate, samples) = graft.functions.WavCodec.decode(bytes)
            val (ampSum, energy, crossings) = graft.functions.WavCodec.features(samples)
            (id, samples.length.toLong, rate.toLong, ampSum, energy, crossings)
          })
          .toDF("doc_id", "n_samples", "sample_rate", "amp_sum", "energy",
            "midpoint_crossings")
          .orderBy(col("doc_id"))
      },
      // the oracle re-derives the decoded samples from the closed form
      // (sample(i) = (13i + doc_id) mod 256 over n = 256 + id%64 samples
      // at 8 kHz) — DuckDB can't parse RIFF, but it doesn't need to
      Some("""WITH g AS (SELECT doc_id, CAST(256 + doc_id % 64 AS INT) AS n
             |            FROM documents)
             |SELECT doc_id,
             |  CAST(n AS BIGINT) AS n_samples,
             |  CAST(8000 AS BIGINT) AS sample_rate,
             |  CAST(list_sum([(13 * i + doc_id) % 256
             |                 FOR i IN range(0, n)]) AS BIGINT) AS amp_sum,
             |  CAST(list_sum([((13 * i + doc_id) % 256 - 128)
             |                 * ((13 * i + doc_id) % 256 - 128)
             |                 FOR i IN range(0, n)]) AS BIGINT) AS energy,
             |  CAST(len([i FOR i IN range(1, n)
             |            IF ((13 * (i - 1) + doc_id) % 256 - 128)
             |             * ((13 * i + doc_id) % 256 - 128) < 0]) AS BIGINT)
             |    AS midpoint_crossings
             |FROM g ORDER BY doc_id""".stripMargin),
      doc = "multimodal/audio: decode + signal features over real WAV PCM (javax.sound)"),

    // X6: the LLM training-data pipeline END TO END as one declarative
    // plan — the composite the d/t-families exist for: quality gate (t2's
    // exact arithmetic) → language gate (t1's argmax) → exact dedup keep-
    // min (d1's digest groupBy) → minhash near-dup removal (d2's
    // signature → band join → verified pairs, drop every id2) → per-lang
    // corpus stats. Every shuffle is keyed (digest / band key / lang);
    // the survivor frame and its signature frame are SharedFrame'd (the
    // signature feeds four consumers inside nearDupPairs, the survivors
    // feed the signature pass and the final anti-join). Catalyst sees ONE
    // plan, so the quality/lang projections fuse into the first scan —
    // at 100 TB the pipeline reads the corpus once, shuffles digests and
    // band keys only, and aggregates a per-lang rollup.
    QueryDef(
      "x6_corpus_pipeline",
      (s, d) => {
        graft.functions.GraftExtensions.registerInto(s)
        val gated = corpusGated(s, d)
        // d1's exact dedup as ONE digest-keyed window (row_number over
        // the normalized-text hash, ordered by doc_id, keep rank 1 ==
        // the min-doc_id row): one shuffle, one pass over gated —
        // replacing the r6 groupBy + join-back shape that shuffled twice
        // and consumed gated twice. Near-unique digests mean the window
        // partitions are tiny (no skew surface).
        val deduped = SharedFrame(gated
          .withColumn("h", md5(norm(col("text"))))
          .withColumn("__keep", row_number().over(
            Window.partitionBy(col("h")).orderBy(col("doc_id"))))
          .filter(col("__keep") === 1)
          .drop("h", "__keep"), "x6_dd", d)
        // d2's near-dup removal on the survivors: banded candidates,
        // verified Jaccard >= 0.5, drop every pair's larger id
        val sig = SharedFrame(minhashSignatures(
          deduped.select(col("doc_id"), col("text"))), "x6_sig", d)
        val dropIds = nearDupPairs(sig, sig, 0.5)
          .select(col("id2").as("doc_id")).distinct()
        // the per-lang rollup carries the FUNNEL sizes, not just the
        // final stats: the synthetic corpus is homogeneous English, so a
        // one-row result would be a weak gate — emitting every stage's
        // survivor count makes any stage error shift a column
        val gStats = gated.groupBy(col("pred_lang"))
          .agg(count(lit(1)).as("n_gated"))
        val dStats = deduped.groupBy(col("pred_lang"))
          .agg(count(lit(1)).as("n_after_exact"))
        deduped.join(dropIds, Seq("doc_id"), "left_anti")
          .groupBy(col("pred_lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_toks").cast("long")).as("n_tokens"),
            (sum(floor(col("quality") * lit(10.0) + lit(0.5)).cast("long"))
              .cast("double") / lit(10.0) / count(lit(1))).as("q_mean"))
          .join(gStats, Seq("pred_lang"))
          .join(dStats, Seq("pred_lang"))
          .select(col("pred_lang"), col("n_gated"), col("n_after_exact"),
            col("n_docs"), col("n_tokens"), col("q_mean"))
          .orderBy(col("pred_lang"))
      },
      // the full funnel re-derived: t2's quality CTE, t1's argmax, d1's
      // digest keep-min, then d2's complete minhash re-derivation (mod-p
      // permutations, band keys, candidates, string-intersect Jaccard)
      // over the SURVIVORS, and the same exact-decimal rollup
      Some("""WITH t AS (
             |  SELECT doc_id, text,
             |    len(list_filter(str_split(text, ' '), x -> x <> '')) AS n_toks,
             |    len(list_intersect(
             |      list_distinct(list_filter(str_split(text, ' '), x -> x <> '')),
             |      ['the','a','of','and','is','table','row'])) AS stop
             |  FROM documents),
             |q AS (
             |  SELECT doc_id, text, n_toks,
             |    CASE WHEN n_toks >= 5 THEN 1.0 ELSE 0.0 END * 0.4 +
             |    CASE WHEN (CASE WHEN n_toks > 0
             |               THEN CAST(length(text) - (n_toks - 1) AS DOUBLE) / n_toks
             |               ELSE 0.0 END) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END * 0.3 +
             |    CASE WHEN stop > 0 THEN 1.0 ELSE 0.0 END * 0.3 AS quality
             |  FROM t),
             |sc AS (
             |  SELECT doc_id, text, n_toks, quality,
             |    len(list_intersect(list_distinct(str_split(lower(text), ' ')),
             |        ['der','die','und','ist','von'])) AS s_de,
             |    len(list_intersect(list_distinct(str_split(lower(text), ' ')),
             |        ['the','a','of','and','is'])) AS s_en,
             |    len(list_intersect(list_distinct(str_split(lower(text), ' ')),
             |        ['el','los','y','de','es'])) AS s_es,
             |    len(list_intersect(list_distinct(str_split(lower(text), ' ')),
             |        ['le','la','et','de','est'])) AS s_fr
             |  FROM q WHERE quality >= 0.7),
             |gated AS (
             |  SELECT doc_id, text, n_toks, quality,
             |    CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'unknown'
             |         WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
             |         WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
             |         WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
             |         ELSE 'fr' END AS pred_lang
             |  FROM sc
             |  WHERE greatest(s_de, s_en, s_es, s_fr) > 0),
             |dd AS (
             |  SELECT g.* FROM gated g
             |  JOIN (SELECT md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')) AS h,
             |               min(doc_id) AS doc_id
             |        FROM gated GROUP BY 1) k USING (doc_id)),
             |toksm AS (
             |  SELECT doc_id,
             |         list_filter(string_split(lower(text), ' '), x -> x != '') AS tk
             |  FROM dd),
             |sh AS (
             |  SELECT doc_id,
             |         CASE WHEN len(tk) < 2 THEN tk
             |              ELSE list_distinct([tk[i] || ' ' || tk[i+1] FOR i IN range(1, len(tk))])
             |         END AS s
             |  FROM toksm),
             |hashes AS (
             |  SELECT doc_id, s,
             |         [list_reduce([unicode(c)::BIGINT FOR c IN string_split(g, '')],
             |                      (a, b) -> (a * 31 + b) % 1000000007) FOR g IN s] AS hs
             |  FROM sh),
             |sigs AS (
             |  SELECT doc_id, s,
             |         [list_min([((2654435761 + 40503 * i) % 1000000007 *
             |                     (h % 1000000007) % 1000000007
             |                     + (2246822519 + 9973 * i)) % 1000000007 FOR h IN hs])
             |          FOR i IN range(0, 32)] AS sig
             |  FROM hashes),
             |bands AS (
             |  SELECT doc_id, s,
             |         [list_reduce([b] || [sig[i] FOR i IN range(4*b + 1, 4*b + 5)],
             |                      (a, x) -> (a * 1315423911 + x) % 1000000007)
             |          FOR b IN range(0, 8)] AS bk
             |  FROM sigs),
             |exploded AS (
             |  SELECT doc_id, unnest(bk) AS k FROM bands),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
             |  FROM exploded a JOIN exploded b ON a.k = b.k AND a.doc_id < b.doc_id),
             |verified AS (
             |  SELECT id1, id2,
             |         len(list_intersect(x.s, y.s))::DOUBLE /
             |           (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) AS jaccard
             |  FROM cand JOIN bands x ON cand.id1 = x.doc_id
             |            JOIN bands y ON cand.id2 = y.doc_id),
             |dropped AS (
             |  SELECT DISTINCT id2 AS doc_id FROM verified WHERE jaccard >= 0.5),
             |gstats AS (
             |  SELECT pred_lang, count(*) AS n_gated FROM gated GROUP BY pred_lang),
             |dstats AS (
             |  SELECT pred_lang, count(*) AS n_after_exact FROM dd GROUP BY pred_lang),
             |fin AS (
             |  SELECT pred_lang,
             |    count(*) AS n_docs,
             |    CAST(sum(n_toks) AS BIGINT) AS n_tokens,
             |    CAST(sum(CAST(floor(quality * 10.0 + 0.5) AS BIGINT)) AS DOUBLE)
             |      / 10.0 / count(*) AS q_mean
             |  FROM dd WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
             |  GROUP BY pred_lang)
             |SELECT pred_lang, n_gated, n_after_exact, n_docs, n_tokens, q_mean
             |FROM fin JOIN gstats USING (pred_lang) JOIN dstats USING (pred_lang)
             |ORDER BY pred_lang""".stripMargin),
      doc = "pipeline composite: quality gate -> lang gate -> exact dedup -> minhash near-dup removal -> per-lang stats (the brief's training-data pipeline end to end)"),

    // X6b: the FULL funnel — x6 plus the two stages it left out: t5's
    // repetition gate (Gopher-style: drop docs whose top bigram holds
    // > 8% of bigram positions or whose repeated trigrams cover > 2% of
    // trigram positions, applied only where >= 20 gram positions make
    // the statistic meaningful — integer-exact threshold arithmetic,
    // tb·25 > 2·nb / dt·50 > nt, no FP compare crosses the oracle
    // boundary) and
    // d9b's span-level dedup over the near-dup SURVIVORS (cross-document
    // duplicated 6-gram coverage merged into maximal spans; the rollup
    // reports how many tokens span-dedup would remove — the Lee et al.
    // edit a pipeline applies AFTER document-level dedup). Funnel:
    // quality -> lang -> repetition -> exact dedup -> minhash near-dup
    // -> span dedup -> per-lang rollup carrying every stage's survivor
    // count. Shuffles stay keyed (doc hash / digest / band key / lang);
    // gated/deduped/signature/survivor frames are SharedFrame'd for
    // their multiple consumers.
    QueryDef(
      "x6b_corpus_pipeline_full",
      (s, d) => {
        graft.functions.GraftExtensions.registerInto(s)
        val gated = corpusGated(s, d)
        // t5's repetition metrics over the gated docs (every gated doc
        // has >= 5 tokens, so bigram/trigram counts are non-empty and
        // the inner joins below are row-preserving)
        val withTs = gated.withColumn("ts",
          expr("filter(split(lower(text), ' '), x -> x != '')"))
        def counts(n: Int) = withTs
          .select(col("doc_id"), explode(expr(s"hashed_ngrams(ts, $n)")).as("h"))
          .groupBy(col("doc_id"), col("h"))
          .agg(count(lit(1)).as("c"))
        val bg = counts(2).groupBy(col("doc_id"))
          .agg(max(col("c")).as("tb"), sum(col("c")).as("nb"))
        val tg = counts(3).groupBy(col("doc_id"))
          .agg(sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("dt"),
            sum(col("c")).as("nt"))
        // the thresholds only apply where the statistic is meaningful
        // (>= 20 gram positions): a 10-token doc's UNIQUE top bigram is
        // already 1/9 > 8%, so without the length qualifier the gate
        // rejects every short document
        // SharedFrame'd: repKept feeds the dedup window AND rStats, and
        // its upstream is the expensive part of the whole composite —
        // two exploded n-gram aggregations over every gated doc — which
        // would otherwise recompute per consumer
        val repKept = SharedFrame(withTs
          .join(bg, Seq("doc_id"))
          .join(tg, Seq("doc_id"))
          .filter(!((col("nb") >= 20 && col("tb") * 25 > col("nb") * 2) ||
            (col("nt") >= 20 && col("dt") * 50 > col("nt"))))
          .drop("tb", "nb", "dt", "nt"), "x6b_rep", d)
        // d1's exact dedup keep-min over the repetition survivors —
        // x6's one-shuffle window form (rank 1 per digest == min doc_id)
        val deduped = SharedFrame(repKept
          .withColumn("hm", md5(norm(col("text"))))
          .withColumn("__keep", row_number().over(
            Window.partitionBy(col("hm")).orderBy(col("doc_id"))))
          .filter(col("__keep") === 1)
          .drop("hm", "__keep"), "x6b_dd", d)
        // d2's near-dup removal on the survivors
        val sig = SharedFrame(minhashSignatures(
          deduped.select(col("doc_id"), col("text"))), "x6b_sig", d)
        val dropIds = nearDupPairs(sig, sig, 0.5)
          .select(col("id2").as("doc_id")).distinct()
        val surv = SharedFrame(
          deduped.join(dropIds, Seq("doc_id"), "left_anti"), "x6b_surv", d)
        // d9b's span stage over the survivors: duplicated 6-gram
        // positions -> gaps-and-islands merge -> per-doc covered tokens
        val n = 6
        val gramStream = surv
          .select(col("doc_id"),
            posexplode(expr(s"hashed_ngrams(ts, $n)")).as(Seq("pos0", "h")))
          .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("h"))
        val dupH = gramStream.groupBy(col("h"))
          .agg(countDistinct(col("doc_id")).as("nd"))
          .filter(col("nd") > 1).select(col("h"))
        val cover = islandSpans(
            gramStream.join(dupH, Seq("h")).select(col("doc_id"), col("pos")), n)
          .groupBy(col("doc_id"))
          .agg(sum(col("n_tokens")).as("cov"))
        val gStats = gated.groupBy(col("pred_lang")).agg(count(lit(1)).as("n_gated"))
        val rStats = repKept.groupBy(col("pred_lang")).agg(count(lit(1)).as("n_after_rep"))
        val dStats = deduped.groupBy(col("pred_lang")).agg(count(lit(1)).as("n_after_exact"))
        surv.join(cover, Seq("doc_id"), "left")
          .withColumn("cov", coalesce(col("cov"), lit(0L)))
          .groupBy(col("pred_lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_toks").cast("long")).as("n_tokens"),
            sum(col("cov")).as("span_tokens"))
          .join(gStats, Seq("pred_lang"))
          .join(rStats, Seq("pred_lang"))
          .join(dStats, Seq("pred_lang"))
          .select(col("pred_lang"), col("n_gated"), col("n_after_rep"),
            col("n_after_exact"), col("n_docs"), col("n_tokens"),
            col("span_tokens"),
            (col("n_tokens") - col("span_tokens")).as("n_tokens_clean"))
          .orderBy(col("pred_lang"))
      },
      // x6's oracle extended with the t5 repetition CTEs (bagg/tagg/rep)
      // and the d9b span CTEs over the survivors (pos6..cover); the
      // minhash re-derivation is x6's, re-rooted at the rep survivors
      Some("""WITH t AS (
             |  SELECT doc_id, text,
             |    len(list_filter(str_split(text, ' '), x -> x <> '')) AS n_toks,
             |    len(list_intersect(
             |      list_distinct(list_filter(str_split(text, ' '), x -> x <> '')),
             |      ['the','a','of','and','is','table','row'])) AS stop
             |  FROM documents),
             |q AS (
             |  SELECT doc_id, text, n_toks,
             |    CASE WHEN n_toks >= 5 THEN 1.0 ELSE 0.0 END * 0.4 +
             |    CASE WHEN (CASE WHEN n_toks > 0
             |               THEN CAST(length(text) - (n_toks - 1) AS DOUBLE) / n_toks
             |               ELSE 0.0 END) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END * 0.3 +
             |    CASE WHEN stop > 0 THEN 1.0 ELSE 0.0 END * 0.3 AS quality
             |  FROM t),
             |sc AS (
             |  SELECT doc_id, text, n_toks, quality,
             |    len(list_intersect(list_distinct(str_split(lower(text), ' ')),
             |        ['der','die','und','ist','von'])) AS s_de,
             |    len(list_intersect(list_distinct(str_split(lower(text), ' ')),
             |        ['the','a','of','and','is'])) AS s_en,
             |    len(list_intersect(list_distinct(str_split(lower(text), ' ')),
             |        ['el','los','y','de','es'])) AS s_es,
             |    len(list_intersect(list_distinct(str_split(lower(text), ' ')),
             |        ['le','la','et','de','est'])) AS s_fr
             |  FROM q WHERE quality >= 0.7),
             |gated AS (
             |  SELECT doc_id, text, n_toks, quality,
             |    CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'unknown'
             |         WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
             |         WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
             |         WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
             |         ELSE 'fr' END AS pred_lang
             |  FROM sc
             |  WHERE greatest(s_de, s_en, s_es, s_fr) > 0),
             |tk AS (
             |  SELECT doc_id, pred_lang, n_toks, text,
             |         list_filter(str_split(lower(text), ' '), x -> x <> '') AS ts
             |  FROM gated),
             |bagg AS (
             |  SELECT doc_id, CAST(max(c) AS BIGINT) AS tb, CAST(sum(c) AS BIGINT) AS nb
             |  FROM (SELECT doc_id, md5(array_to_string(ts[i : i + 1], ' ')) AS h, count(*) AS c
             |        FROM (SELECT doc_id, ts, unnest(range(1, greatest(len(ts), 1))) AS i FROM tk)
             |        GROUP BY doc_id, h)
             |  GROUP BY doc_id),
             |tagg AS (
             |  SELECT doc_id,
             |    CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dt,
             |    CAST(sum(c) AS BIGINT) AS nt
             |  FROM (SELECT doc_id, md5(array_to_string(ts[i : i + 2], ' ')) AS h, count(*) AS c
             |        FROM (SELECT doc_id, ts, unnest(range(1, greatest(len(ts) - 1, 1))) AS i FROM tk)
             |        GROUP BY doc_id, h)
             |  GROUP BY doc_id),
             |rep AS (
             |  SELECT tk.* FROM tk JOIN bagg USING (doc_id) JOIN tagg USING (doc_id)
             |  WHERE NOT (nb >= 20 AND tb * 25 > 2 * nb)
             |    AND NOT (nt >= 20 AND dt * 50 > nt)),
             |dd AS (
             |  SELECT r.* FROM rep r
             |  JOIN (SELECT md5(regexp_replace(trim(lower(text)), ' +', ' ', 'g')) AS hh,
             |               min(doc_id) AS doc_id
             |        FROM rep GROUP BY 1) k USING (doc_id)),
             |sh AS (
             |  SELECT doc_id,
             |         CASE WHEN len(ts) < 2 THEN ts
             |              ELSE list_distinct([ts[i] || ' ' || ts[i+1] FOR i IN range(1, len(ts))])
             |         END AS s
             |  FROM dd),
             |hashes AS (
             |  SELECT doc_id, s,
             |         [list_reduce([unicode(c)::BIGINT FOR c IN string_split(g, '')],
             |                      (a, b) -> (a * 31 + b) % 1000000007) FOR g IN s] AS hs
             |  FROM sh),
             |sigs AS (
             |  SELECT doc_id, s,
             |         [list_min([((2654435761 + 40503 * i) % 1000000007 *
             |                     (h % 1000000007) % 1000000007
             |                     + (2246822519 + 9973 * i)) % 1000000007 FOR h IN hs])
             |          FOR i IN range(0, 32)] AS sig
             |  FROM hashes),
             |bands AS (
             |  SELECT doc_id, s,
             |         [list_reduce([b] || [sig[i] FOR i IN range(4*b + 1, 4*b + 5)],
             |                      (a, x) -> (a * 1315423911 + x) % 1000000007)
             |          FOR b IN range(0, 8)] AS bk
             |  FROM sigs),
             |exploded AS (
             |  SELECT doc_id, unnest(bk) AS k FROM bands),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
             |  FROM exploded a JOIN exploded b ON a.k = b.k AND a.doc_id < b.doc_id),
             |verified AS (
             |  SELECT id1, id2,
             |         len(list_intersect(x.s, y.s))::DOUBLE /
             |           (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) AS jaccard
             |  FROM cand JOIN bands x ON cand.id1 = x.doc_id
             |            JOIN bands y ON cand.id2 = y.doc_id),
             |dropped AS (
             |  SELECT DISTINCT id2 AS doc_id FROM verified WHERE jaccard >= 0.5),
             |surv AS (
             |  SELECT * FROM dd WHERE doc_id NOT IN (SELECT doc_id FROM dropped)),
             |pos6 AS (
             |  SELECT doc_id, ts, unnest(range(1, greatest(len(ts) - 4, 1))) AS i FROM surv),
             |grams6 AS (
             |  SELECT doc_id, i, md5(array_to_string(ts[i : i + 5], ' ')) AS h FROM pos6),
             |dup6 AS (
             |  SELECT h FROM grams6 GROUP BY h HAVING count(DISTINCT doc_id) > 1),
             |dp AS (
             |  SELECT doc_id, i AS p FROM grams6 JOIN dup6 USING (h)),
             |isl AS (
             |  SELECT doc_id, p,
             |    CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL THEN 1
             |         WHEN p > lag(p) OVER (PARTITION BY doc_id ORDER BY p) + 6 THEN 1
             |         ELSE 0 END AS new_island
             |  FROM dp),
             |grp AS (
             |  SELECT doc_id, p,
             |    sum(new_island) OVER (PARTITION BY doc_id ORDER BY p
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
             |  FROM isl),
             |spans AS (
             |  SELECT doc_id, min(p) AS s0, max(p) + 5 AS s1 FROM grp GROUP BY doc_id, island),
             |cover AS (
             |  SELECT doc_id, CAST(sum(s1 - s0 + 1) AS BIGINT) AS cov FROM spans GROUP BY doc_id),
             |gstats AS (
             |  SELECT pred_lang, count(*) AS n_gated FROM gated GROUP BY pred_lang),
             |rstats AS (
             |  SELECT pred_lang, count(*) AS n_after_rep FROM rep GROUP BY pred_lang),
             |dstats AS (
             |  SELECT pred_lang, count(*) AS n_after_exact FROM dd GROUP BY pred_lang),
             |fin AS (
             |  SELECT pred_lang, count(*) AS n_docs,
             |    CAST(sum(n_toks) AS BIGINT) AS n_tokens,
             |    CAST(sum(coalesce(cov, 0)) AS BIGINT) AS span_tokens
             |  FROM surv LEFT JOIN cover USING (doc_id)
             |  GROUP BY pred_lang)
             |SELECT pred_lang, n_gated, n_after_rep, n_after_exact, n_docs, n_tokens,
             |  span_tokens, n_tokens - span_tokens AS n_tokens_clean
             |FROM fin JOIN gstats USING (pred_lang) JOIN rstats USING (pred_lang)
             |         JOIN dstats USING (pred_lang)
             |ORDER BY pred_lang""".stripMargin),
      doc = "pipeline composite, full funnel: quality -> lang -> repetition -> exact dedup -> minhash near-dup -> span dedup -> per-lang stats"),

    // X7: MULTIMODAL curation — the m-family's real decode composed into
    // the relational funnel: text quality + language gates (x6's shared
    // gated frame) joined with per-doc image features from a genuine
    // javax.imageio decode of the stored PNG column (pngPayloads, the
    // m3/m4 shared frame), then cross-modality curation rules — discard
    // tiny images (min dimension >= 9) and out-of-range mean brightness
    // — and a per-lang rollup of both modalities' statistics. The
    // brightness ratio is ONE IEEE division in both engines (identical
    // bits); everything else is integer-exact. The closed-form pixels
    // keep the whole text-gate -> decode -> filter -> rollup pipeline
    // DuckDB-hash-checked — the m-family's first appearance inside an
    // oracled composite. At 100 TB this is the curation shape that
    // matters: one scan of the corpus, one scan of the media column,
    // a doc_id-keyed join, and a tiny per-lang aggregate.
    QueryDef(
      "x7_multimodal_corpus",
      (s, d) => {
        import s.implicits._
        graft.functions.GraftExtensions.registerInto(s)
        val gated = corpusGated(s, d)
        val img = pngPayloads(s, d).as[(Long, Array[Byte])]
          .mapPartitions(_.grouped(64).flatMap { batch =>
            graft.functions.PngCodec.decodeBatch(batch) { (id, w, h, px) =>
              var sum = 0L
              var i = 0
              while (i < px.length) { sum += px(i); i += 1 }
              (id, w.toLong, h.toLong, sum)
            }
          }).toDF("doc_id", "px_w", "px_h", "px_sum")
        gated.join(img, Seq("doc_id"))
          .filter(col("px_w") >= 9 && col("px_h") >= 9)
          .withColumn("brightness",
            col("px_sum").cast("double") / (col("px_w") * col("px_h")))
          .filter(col("brightness") >= 120.0 && col("brightness") <= 136.0)
          .groupBy(col("pred_lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_toks").cast("long")).as("n_tokens"),
            sum(col("px_w") * col("px_h")).as("n_px"),
            sum(col("px_sum")).as("px_sum_total"),
            max(col("px_w")).as("max_w"),
            max(col("px_h")).as("max_h"))
          .withColumn("mean_brightness",
            col("px_sum_total").cast("double") / col("n_px"))
          .select(col("pred_lang"), col("n_docs"), col("n_tokens"),
            col("n_px"), col("px_sum_total"), col("max_w"), col("max_h"),
            col("mean_brightness"))
          .orderBy(col("pred_lang"))
      },
      // the image side re-derived from the closed forms (m3's oracle
      // arithmetic); the text side is x6's gate CTEs
      Some("""WITH t AS (
             |  SELECT doc_id, text,
             |    len(list_filter(str_split(text, ' '), x -> x <> '')) AS n_toks,
             |    len(list_intersect(
             |      list_distinct(list_filter(str_split(text, ' '), x -> x <> '')),
             |      ['the','a','of','and','is','table','row'])) AS stop
             |  FROM documents),
             |q AS (
             |  SELECT doc_id, text, n_toks,
             |    CASE WHEN n_toks >= 5 THEN 1.0 ELSE 0.0 END * 0.4 +
             |    CASE WHEN (CASE WHEN n_toks > 0
             |               THEN CAST(length(text) - (n_toks - 1) AS DOUBLE) / n_toks
             |               ELSE 0.0 END) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END * 0.3 +
             |    CASE WHEN stop > 0 THEN 1.0 ELSE 0.0 END * 0.3 AS quality
             |  FROM t),
             |sc AS (
             |  SELECT doc_id, n_toks, quality,
             |    len(list_intersect(list_distinct(str_split(lower(text), ' ')),
             |        ['der','die','und','ist','von'])) AS s_de,
             |    len(list_intersect(list_distinct(str_split(lower(text), ' ')),
             |        ['the','a','of','and','is'])) AS s_en,
             |    len(list_intersect(list_distinct(str_split(lower(text), ' ')),
             |        ['el','los','y','de','es'])) AS s_es,
             |    len(list_intersect(list_distinct(str_split(lower(text), ' ')),
             |        ['le','la','et','de','est'])) AS s_fr
             |  FROM q WHERE quality >= 0.7),
             |gated AS (
             |  SELECT doc_id, n_toks,
             |    CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'unknown'
             |         WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
             |         WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
             |         WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
             |         ELSE 'fr' END AS pred_lang
             |  FROM sc
             |  WHERE greatest(s_de, s_en, s_es, s_fr) > 0),
             |g0 AS (
             |  SELECT doc_id, CAST(8 + doc_id % 5 AS INT) AS w,
             |                 CAST(8 + doc_id % 7 AS INT) AS h
             |  FROM documents),
             |img AS (
             |  SELECT doc_id, CAST(w AS BIGINT) AS px_w, CAST(h AS BIGINT) AS px_h,
             |    CAST(list_sum([((i % w) * 7 + (i // w) * 13 + doc_id) % 256
             |                   FOR i IN range(0, w * h)]) AS BIGINT) AS px_sum
             |  FROM g0),
             |f AS (
             |  SELECT pred_lang, n_toks, px_w, px_h, px_sum
             |  FROM gated JOIN img USING (doc_id)
             |  WHERE px_w >= 9 AND px_h >= 9
             |    AND CAST(px_sum AS DOUBLE) / (px_w * px_h) BETWEEN 120.0 AND 136.0)
             |SELECT pred_lang,
             |  count(*) AS n_docs,
             |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
             |  CAST(sum(px_w * px_h) AS BIGINT) AS n_px,
             |  CAST(sum(px_sum) AS BIGINT) AS px_sum_total,
             |  max(px_w) AS max_w, max(px_h) AS max_h,
             |  CAST(sum(px_sum) AS DOUBLE) / sum(px_w * px_h) AS mean_brightness
             |FROM f GROUP BY pred_lang ORDER BY pred_lang""".stripMargin),
      doc = "pipeline composite, multimodal: text quality/lang gates joined with real decoded image features, cross-modality curation filter, per-lang rollup"),

    // D10: benchmark decontamination — the eval-overlap gate every
    // production pretraining pipeline runs before training (GPT-3
    // appendix C, Gopher/MassiveText §A2, Llama 2: flag or drop training
    // documents sharing long n-grams with the evaluation suite). The
    // "benchmark" here is the deterministic doc_id % 10 == 7 slice
    // standing in for the real eval set; n = 6 rides above the
    // incidental-overlap floor for the same reason as d9 (production
    // pipelines use 8–13-gram windows, same machinery). Scale shape:
    // grams are digested BEFORE any shuffle (hashed_ngrams, 8 bytes on
    // the wire), the train side is (doc, digest)-distinct so an in-doc
    // repeat costs one row, and the probe is a LEFT SEMI join — no row
    // multiplication however many eval documents share a gram. In
    // production the eval digest set is bounded by the benchmark SUITE
    // (a broadcastable dimension); here it scales with the corpus (10%
    // of it), so the plan deliberately stays an unhinted shuffle join
    // and lets AQE downgrade to broadcast when the digest side really
    // is small.
    QueryDef(
      "d10_decontaminate",
      (s, d) => {
        graft.functions.GraftExtensions.registerInto(s)
        val n = 6
        val toks = filter(split(lower(col("text")), " "), x => x =!= "")
        val base = T.documents(s, d).select(col("doc_id"), toks.as("ts"))
        // d9's single-derivation shape: the gram stream exists ONCE and
        // one digest-keyed shuffle (the window) answers "does any eval
        // doc hold this gram" — measured 4x faster at sf0.1 than the
        // first-cut eval-distinct + semi-join plan, which derived the
        // gram fan-out twice and shuffled three times
        val hits = base
          .select(col("doc_id"), explode(expr(s"hashed_ngrams(ts, $n)")).as("h"))
          .dropDuplicates("doc_id", "h")
          .withColumn("ev",
            max(when(col("doc_id") % 10 === 7, 1).otherwise(0))
              .over(Window.partitionBy(col("h"))))
          .filter(col("doc_id") % 10 =!= 7 && col("ev") === 1)
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("ch"))
        base.filter(col("doc_id") % 10 =!= 7)
          .select(col("doc_id"),
            greatest(size(col("ts")) - (n - 1), lit(0)).cast("long").as("n_grams"))
          .join(hits, Seq("doc_id"), "left")
          .withColumn("n_contaminated_grams", coalesce(col("ch"), lit(0L)))
          .select(col("doc_id"), col("n_grams"), col("n_contaminated_grams"),
            when(col("n_grams") > 0,
              col("n_contaminated_grams").cast("double") / col("n_grams"))
              .otherwise(0.0).as("contaminated_frac"),
            (col("n_contaminated_grams") > 0).cast("int").as("is_contaminated"))
          .orderBy(col("doc_id"))
      },
      // d9's gram convention: the oracle groups by gram TEXT (md5) where
      // Spark moves xxhash64 digests — distinct counts and semi-join
      // membership are equal modulo 64-bit collisions
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(str_split(lower(text), ' '), x -> x <> '') AS ts
             |  FROM documents),
             |pos AS (
             |  SELECT doc_id, ts, unnest(range(1, greatest(len(ts) - 4, 1))) AS i FROM toks),
             |grams AS (
             |  SELECT doc_id, md5(array_to_string(ts[i : i + 5], ' ')) AS h FROM pos),
             |ev AS (SELECT DISTINCT h FROM grams WHERE doc_id % 10 = 7),
             |tr AS (SELECT DISTINCT doc_id, h FROM grams WHERE doc_id % 10 != 7),
             |hits AS (
             |  SELECT doc_id, count(*) AS ch FROM tr JOIN ev USING (h) GROUP BY doc_id)
             |SELECT t.doc_id,
             |  CAST(greatest(len(ts) - 5, 0) AS BIGINT) AS n_grams,
             |  coalesce(ch, 0) AS n_contaminated_grams,
             |  CASE WHEN len(ts) - 5 > 0
             |       THEN CAST(coalesce(ch, 0) AS DOUBLE) / (len(ts) - 5)
             |       ELSE 0.0 END AS contaminated_frac,
             |  CAST(coalesce(ch, 0) > 0 AS INT) AS is_contaminated
             |FROM toks t LEFT JOIN hits USING (doc_id)
             |WHERE t.doc_id % 10 != 7 ORDER BY doc_id""".stripMargin),
      doc = "pipeline/decontamination: per-train-doc eval n-gram overlap stats (GPT-3 App. C / Gopher A2 gate); brief's dedup family, eval-facing"),

    // T6: deterministic stratified downsampling to a uniform language
    // mix — the data-mixing step that turns a filtered corpus into a
    // training MIX with chosen group proportions (here: every lang down
    // to the smallest lang's count, the degenerate "balance the mix"
    // target; weighted targets are the same arithmetic with a per-group
    // quota row). Sampling is BERNOULLI by a portable per-doc hash, not
    // rank-based: a rank quota needs a per-group global sort (one fat
    // task per hot group — exactly the W-family skew stall), while the
    // hash gate is a pure map-side filter whose only shuffle is the
    // tiny per-group count. The keep test h·cnt < quota·P is EXACT
    // integer cross-multiplication — no double rounding crosses the
    // oracle boundary (bound: cnt < 9.2e9 per group before the int64
    // product overflows; beyond that precompute quota·P/cnt per group
    // on the counts frame). Deterministic: membership is a pure
    // function of doc_id and the group counts, stable across runs,
    // partitionings, and engines.
    QueryDef(
      "t6_stratified_sample",
      (s, d) => {
        val P = 1000000007L
        val docs = T.documents(s, d).select(col("doc_id"), col("lang"))
        val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
        val quota = counts.agg(min(col("cnt")).as("quota"))
        docs
          .withColumn("sample_hash",
            ((col("doc_id") % P) * 2654435761L + 2246822519L) % P)
          .join(broadcast(counts), Seq("lang"))
          .crossJoin(broadcast(quota))
          .filter(col("sample_hash") * col("cnt") < col("quota") * P)
          .select(col("doc_id"), col("lang"), col("sample_hash"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
             |q AS (SELECT min(cnt) AS quota FROM c),
             |h AS (SELECT doc_id, lang,
             |        ((doc_id % 1000000007) * 2654435761 + 2246822519) % 1000000007
             |          AS sample_hash
             |      FROM documents)
             |SELECT doc_id, lang, sample_hash
             |FROM h JOIN c USING (lang) CROSS JOIN q
             |WHERE sample_hash * cnt < quota * 1000000007
             |ORDER BY doc_id""".stripMargin),
      doc = "pipeline/data mixing: deterministic hash-Bernoulli stratified downsample to a uniform per-lang mix; brief's training-data pipeline"),

    // X8: training-set assembly — the funnel's LAST mile: the gated
    // corpus (x6's quality + language gates) is decontaminated against
    // the eval slice (d10's semi-join gate, doc-level drop), rebalanced
    // to a uniform predicted-language mix (t6's hash-Bernoulli sampler,
    // quota = smallest clean pred_lang count), then dealt into 8
    // deterministic shards by the same portable hash — the
    // write-your-training-shards step, reported as per-shard doc/lang/
    // token stats carrying the funnel scalars (train-gated and clean
    // counts) so any stage error shifts a column. Scale: the only
    // corpus-wide shuffles are keyed on gram digest (decontamination)
    // and shard_id (8-way rollup); counts/quota/funnel scalars are
    // domain-bounded frames (≤ 4 langs, 1 row) under explicit
    // broadcast. sf0.01's gated corpus is all-en, so the sampler keeps
    // every clean doc there (quota = the one lang's count) — the
    // multi-lang path where sampling actually drops docs is pinned in
    // MixDecontamSpec's planted corpus, x6's precedent for stages the
    // homogeneous testdata can't move.
    QueryDef(
      "x8_training_mix",
      (s, d) => {
        graft.functions.GraftExtensions.registerInto(s)
        val P = 1000000007L
        val n = 6
        val gated = corpusGated(s, d)
        val evalGrams = T.documents(s, d)
          .filter(col("doc_id") % 10 === 7)
          .select(explode(expr(
            s"hashed_ngrams(filter(split(lower(text), ' '), x -> x != ''), $n)")).as("h"))
          .distinct()
        val trainGrams = gated.filter(col("doc_id") % 10 =!= 7)
          .select(col("doc_id"), explode(expr(
            s"hashed_ngrams(filter(split(lower(text), ' '), x -> x != ''), $n)")).as("h"))
          .dropDuplicates("doc_id", "h")
        val contaminated = trainGrams.join(evalGrams, Seq("h"), "left_semi")
          .select(col("doc_id")).distinct()
        // clean feeds three consumers (counts, sampler, n_clean scalar)
        val clean = SharedFrame(
          gated.filter(col("doc_id") % 10 =!= 7)
            .join(contaminated, Seq("doc_id"), "left_anti")
            .select(col("doc_id"), col("n_toks"), col("pred_lang")), "x8_clean", d)
        val counts = clean.groupBy(col("pred_lang")).agg(count(lit(1)).as("cnt"))
        val quota = counts.agg(min(col("cnt")).as("quota"))
        val nGated = gated.filter(col("doc_id") % 10 =!= 7)
          .agg(count(lit(1)).as("n_train_gated"))
        val nClean = clean.agg(count(lit(1)).as("n_clean"))
        clean
          .withColumn("h", ((col("doc_id") % P) * 2654435761L + 2246822519L) % P)
          .join(broadcast(counts), Seq("pred_lang"))
          .crossJoin(broadcast(quota))
          .filter(col("h") * col("cnt") < col("quota") * P)
          .withColumn("shard_id", col("h") % 8)
          .groupBy(col("shard_id"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("pred_lang")).as("n_langs"),
            sum(col("n_toks").cast("long")).as("n_tokens"))
          .crossJoin(broadcast(nGated))
          .crossJoin(broadcast(nClean))
          .select(col("shard_id"), col("n_docs"), col("n_langs"),
            col("n_tokens"), col("n_train_gated"), col("n_clean"))
          .orderBy(col("shard_id"))
      },
      // x6's gate CTEs + d10's decontamination + t6's sampler arithmetic,
      // re-rooted at the gated train slice
      Some("""WITH t AS (
             |  SELECT doc_id, text,
             |    len(list_filter(str_split(text, ' '), x -> x <> '')) AS n_toks,
             |    len(list_intersect(
             |      list_distinct(list_filter(str_split(text, ' '), x -> x <> '')),
             |      ['the','a','of','and','is','table','row'])) AS stop
             |  FROM documents),
             |q AS (
             |  SELECT doc_id, text, n_toks,
             |    CASE WHEN n_toks >= 5 THEN 1.0 ELSE 0.0 END * 0.4 +
             |    CASE WHEN (CASE WHEN n_toks > 0
             |               THEN CAST(length(text) - (n_toks - 1) AS DOUBLE) / n_toks
             |               ELSE 0.0 END) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END * 0.3 +
             |    CASE WHEN stop > 0 THEN 1.0 ELSE 0.0 END * 0.3 AS quality
             |  FROM t),
             |sc AS (
             |  SELECT doc_id, text, n_toks,
             |    len(list_intersect(list_distinct(str_split(lower(text), ' ')),
             |        ['der','die','und','ist','von'])) AS s_de,
             |    len(list_intersect(list_distinct(str_split(lower(text), ' ')),
             |        ['the','a','of','and','is'])) AS s_en,
             |    len(list_intersect(list_distinct(str_split(lower(text), ' ')),
             |        ['el','los','y','de','es'])) AS s_es,
             |    len(list_intersect(list_distinct(str_split(lower(text), ' ')),
             |        ['le','la','et','de','est'])) AS s_fr
             |  FROM q WHERE quality >= 0.7),
             |gated AS (
             |  SELECT doc_id, text, n_toks,
             |    CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'unknown'
             |         WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
             |         WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
             |         WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
             |         ELSE 'fr' END AS pred_lang
             |  FROM sc WHERE greatest(s_de, s_en, s_es, s_fr) > 0),
             |evtoks AS (
             |  SELECT doc_id, list_filter(str_split(lower(text), ' '), x -> x <> '') AS ts
             |  FROM documents WHERE doc_id % 10 = 7),
             |ev AS (
             |  SELECT DISTINCT md5(array_to_string(ts[i : i + 5], ' ')) AS h
             |  FROM (SELECT doc_id, ts, unnest(range(1, greatest(len(ts) - 4, 1))) AS i
             |        FROM evtoks)),
             |trtoks AS (
             |  SELECT doc_id, list_filter(str_split(lower(text), ' '), x -> x <> '') AS ts
             |  FROM gated WHERE doc_id % 10 != 7),
             |tg AS (
             |  SELECT DISTINCT doc_id, md5(array_to_string(ts[i : i + 5], ' ')) AS h
             |  FROM (SELECT doc_id, ts, unnest(range(1, greatest(len(ts) - 4, 1))) AS i
             |        FROM trtoks)),
             |cont AS (SELECT DISTINCT doc_id FROM tg JOIN ev USING (h)),
             |clean AS (
             |  SELECT doc_id, n_toks, pred_lang FROM gated
             |  WHERE doc_id % 10 != 7 AND doc_id NOT IN (SELECT doc_id FROM cont)),
             |c AS (SELECT pred_lang, count(*) AS cnt FROM clean GROUP BY pred_lang),
             |qq AS (SELECT min(cnt) AS quota FROM c),
             |kept AS (
             |  SELECT clean.*,
             |         ((doc_id % 1000000007) * 2654435761 + 2246822519) % 1000000007 AS h
             |  FROM clean JOIN c USING (pred_lang) CROSS JOIN qq
             |  WHERE ((doc_id % 1000000007) * 2654435761 + 2246822519) % 1000000007 * cnt
             |        < quota * 1000000007),
             |sh AS (
             |  SELECT h % 8 AS shard_id, count(*) AS n_docs,
             |         count(DISTINCT pred_lang) AS n_langs,
             |         CAST(sum(n_toks) AS BIGINT) AS n_tokens
             |  FROM kept GROUP BY 1),
             |scal AS (
             |  SELECT (SELECT count(*) FROM gated WHERE doc_id % 10 != 7) AS n_train_gated,
             |         (SELECT count(*) FROM clean) AS n_clean)
             |SELECT shard_id, n_docs, n_langs, n_tokens, n_train_gated, n_clean
             |FROM sh CROSS JOIN scal ORDER BY shard_id""".stripMargin),
      doc = "pipeline composite: training-set assembly — gates -> decontaminate vs eval slice -> uniform-mix downsample -> deterministic 8-way sharding with funnel-carrying per-shard stats"),

    // D11: cross-source duplication matrix — for every source pair, how
    // many distinct 6-grams they share and the containment coefficient
    // shared / min(|A|, |B|) (the cross-dump overlap analysis run on
    // multi-crawl corpora before choosing mixing weights; RefinedWeb /
    // Dolma publish exactly this matrix across CommonCrawl snapshots).
    // Scale shape: the gram stream is digested then (source, digest)-
    // deduped BEFORE the pair join, so each source contributes one row
    // per distinct gram; the self-join is keyed on the digest and its
    // fan-out per digest is bounded by the SOURCE domain (k sources →
    // ≤ k²/2 pairs per digest), never by corpus size. Per-source totals
    // are a k-row frame under explicit broadcast.
    QueryDef(
      "d11_source_overlap",
      (s, d) => {
        graft.functions.GraftExtensions.registerInto(s)
        val n = 6
        val toks = filter(split(lower(col("text")), " "), x => x =!= "")
        // two consumers (totals + both join sides) — materialize once
        val sg = SharedFrame(
          T.documents(s, d).select(col("source"), toks.as("ts"))
            .select(col("source"), explode(expr(s"hashed_ngrams(ts, $n)")).as("h"))
            .dropDuplicates("source", "h"), "d11_sg", d)
        val tot = sg.groupBy(col("source")).agg(count(lit(1)).as("n"))
        sg.select(col("source").as("s1"), col("h"))
          .join(sg.select(col("source").as("s2"), col("h").as("h2")),
            col("h") === col("h2") && col("s1") < col("s2"))
          .groupBy(col("s1"), col("s2"))
          .agg(count(lit(1)).as("shared_grams"))
          .join(broadcast(tot.select(col("source").as("s1"), col("n").as("n1"))), Seq("s1"))
          .join(broadcast(tot.select(col("source").as("s2"), col("n").as("n2"))), Seq("s2"))
          .select(col("s1"), col("s2"), col("shared_grams"), col("n1"), col("n2"),
            (col("shared_grams").cast("double") / least(col("n1"), col("n2")))
              .as("containment"))
          .orderBy(col("s1"), col("s2"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, source,
             |         list_filter(str_split(lower(text), ' '), x -> x <> '') AS ts
             |  FROM documents),
             |pos AS (
             |  SELECT doc_id, source, ts, unnest(range(1, greatest(len(ts) - 4, 1))) AS i
             |  FROM toks),
             |grams AS (
             |  SELECT DISTINCT source, md5(array_to_string(ts[i : i + 5], ' ')) AS h
             |  FROM pos),
             |tot AS (SELECT source, count(*) AS n FROM grams GROUP BY source),
             |pairs AS (
             |  SELECT a.source AS s1, b.source AS s2, count(*) AS shared_grams
             |  FROM grams a JOIN grams b ON a.h = b.h AND a.source < b.source
             |  GROUP BY 1, 2)
             |SELECT s1, s2, shared_grams, t1.n AS n1, t2.n AS n2,
             |  CAST(shared_grams AS DOUBLE) / least(t1.n, t2.n) AS containment
             |FROM pairs JOIN tot t1 ON s1 = t1.source JOIN tot t2 ON s2 = t2.source
             |ORDER BY s1, s2""".stripMargin),
      doc = "pipeline/corpus analytics: cross-source shared-gram matrix with containment coefficients (the cross-dump overlap study); brief's dedup family, corpus-level"),

    // T7: PII scrubbing — redact email addresses and long digit runs
    // (the C4/RefinedWeb-style pre-training privacy pass), reporting the
    // scrubbed text plus per-category match counts. Pure map-side: one
    // scan, two codegen'd regex passes, no shuffle at all (the orderBy
    // is presentation). The patterns stay inside the Java-regex ∩ RE2
    // subset (character classes + bounded quantifiers, no backrefs or
    // lookarounds) so both engines produce identical matches. The
    // sf-corpus contains no PII, so the oracle pins the IDENTITY path
    // (text passes through unredacted, zero counts); redaction itself
    // is pinned by MixDecontamSpec's planted emails/numbers — x6's
    // precedent for stages the testdata can't move.
    QueryDef(
      "t7_pii_scrub",
      (s, d) => {
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val num = "[0-9]{3,}"
        T.documents(s, d).select(col("doc_id"),
          regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"), num, "<NUM>")
            .as("scrubbed"),
          size(regexp_extract_all(col("text"), lit(email), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("text"), lit(num), lit(0))).as("n_numbers"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  regexp_replace(regexp_replace(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '[0-9]{3,}', '<NUM>', 'g') AS scrubbed,
             |  len(regexp_extract_all(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
             |  len(regexp_extract_all(text, '[0-9]{3,}')) AS n_numbers
             |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "pipeline/text: PII redaction (emails, long digit runs) with per-category counts; the C4-style privacy pass"),

    // D12: per-label embedding cluster quality — centroid cohesion stats
    // for a labeled embedding set (the curation read on clustered
    // training embeddings: a label whose members barely point at their
    // own centroid is noise or a mixed cluster). The centroid is the
    // un-normalized element-wise SUM vector — cosine to the sum equals
    // cosine to the mean, so no division touches the integer stage.
    // Scale shape: vectors quantize to int64 (d8's grid), the
    // element-wise sum is a (label, position)-keyed partial aggregation
    // (never a whole-vector single task), the centroid frame broadcasts
    // back, and per-member cosines quantize to 1e-6 fixed point BEFORE
    // the mean so no order-dependent double summation crosses the oracle
    // boundary (operators.Exact's rule). The broadcast hint is legal
    // because `label` here is a CLASS vocabulary (10 values) — for
    // open-ended label sets (e.g. cluster ids from d8) drop the hint and
    // let the label-keyed shuffle join carry it at any cardinality.
    QueryDef(
      "d12_embedding_centroids",
      (s, d) => {
        val q = T.embeddings(s, d).select(col("vec_id"), col("label"),
          expr("transform(embedding, x -> CAST(floor(x * 1000 + 0.5) AS BIGINT))")
            .as("qv"))
        val cvec = q.select(col("label"), posexplode(col("qv")).as(Seq("p", "v")))
          .groupBy(col("label"), col("p"))
          .agg(sum(col("v")).as("sv"))
          .groupBy(col("label"))
          .agg(expr("transform(array_sort(collect_list(struct(p, sv))), x -> x.sv)")
            .as("sv"))
        q.join(broadcast(cvec), Seq("label"))
          .withColumn("dot",
            expr("aggregate(zip_with(qv, sv, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
          .withColumn("nn",
            expr("aggregate(zip_with(qv, qv, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
          .withColumn("cc",
            expr("aggregate(zip_with(sv, sv, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
          .filter(col("nn") > 0 && col("cc") > 0)
          .withColumn("cq",
            floor(col("dot").cast("double") /
              sqrt(col("nn").cast("double") * col("cc").cast("double")) *
              lit(1000000) + lit(0.5)).cast("long"))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n_vecs"),
            (sum(col("cq")).cast("double") / lit(1000000) / count(lit(1)))
              .as("mean_cos_to_centroid"),
            (min(col("cq")).cast("double") / lit(1000000)).as("min_cos"),
            (max(col("cq")).cast("double") / lit(1000000)).as("max_cos"))
          .orderBy(col("label"))
      },
      Some("""WITH q AS (
             |  SELECT vec_id, label,
             |    [floor((embedding[i] * 1000)::DOUBLE + 0.5)::BIGINT
             |     FOR i IN range(1, len(embedding) + 1)] AS qv
             |  FROM embeddings),
             |px AS (
             |  SELECT vec_id, label, unnest(qv) AS v,
             |         unnest(range(1, len(qv) + 1)) AS p
             |  FROM q),
             |cent AS (
             |  SELECT label, p, CAST(sum(v) AS BIGINT) AS sv FROM px GROUP BY label, p),
             |cvec AS (
             |  SELECT label, list(sv ORDER BY p) AS sv FROM cent GROUP BY label),
             |m AS (
             |  SELECT q.label, q.vec_id,
             |    list_reduce([q.qv[i] * c.sv[i] FOR i IN range(1, len(q.qv) + 1)],
             |                (a, b) -> a + b) AS dot,
             |    list_reduce([q.qv[i] * q.qv[i] FOR i IN range(1, len(q.qv) + 1)],
             |                (a, b) -> a + b) AS nn,
             |    list_reduce([c.sv[i] * c.sv[i] FOR i IN range(1, len(c.sv) + 1)],
             |                (a, b) -> a + b) AS cc
             |  FROM q JOIN cvec c USING (label)),
             |qc AS (
             |  SELECT label,
             |    floor(dot::DOUBLE / sqrt(nn::DOUBLE * cc::DOUBLE) * 1000000 + 0.5)::BIGINT
             |      AS cq
             |  FROM m WHERE nn > 0 AND cc > 0)
             |SELECT label, count(*) AS n_vecs,
             |  CAST(sum(cq) AS DOUBLE) / 1000000 / count(*) AS mean_cos_to_centroid,
             |  CAST(min(cq) AS DOUBLE) / 1000000 AS min_cos,
             |  CAST(max(cq) AS DOUBLE) / 1000000 AS max_cos
             |FROM qc GROUP BY label ORDER BY label""".stripMargin),
      doc = "pipeline/embedding analytics: per-label centroid cohesion (quantized-exact mean/min/max cosine to centroid); curation read on clustered embeddings"),

    // T8: sliding-window document chunking — the context-window split
    // every RAG / long-doc-embedding pipeline runs (window 64 tokens,
    // stride 48 => 16-token overlap): chunk k covers token span
    // [k*48, min(k*48 + 64, n)); the chunk count 1 + ceil((n-64)/48)
    // stops as soon as a window reaches the end, so no trailing chunk is
    // fully contained in its predecessor. Pure map-side fan-out — one
    // scan, zero shuffles (the orderBy is presentation); the ceil is
    // (greatest(n-64, 0) + 47) div 48 on non-negative ints, so floor
    // division agrees across engines and no double crosses the oracle.
    QueryDef(
      "t8_chunk_spans",
      (s, d) =>
        T.documents(s, d)
          .select(col("doc_id"),
            size(filter(split(col("text"), " "), x => x =!= "")).as("n"))
          .filter(col("n") > 0)
          .withColumn("ci",
            explode(sequence(lit(0L),
              expr("(greatest(n - 64, 0) + 47) div 48"))))
          .select(col("doc_id"), col("ci").as("chunk_idx"),
            (col("ci") * 48).as("start_tok"),
            least(col("ci") * 48 + 64, col("n")).as("end_tok"),
            (least(col("ci") * 48 + 64, col("n")) - col("ci") * 48)
              .as("n_chunk_toks"))
          .orderBy(col("doc_id"), col("chunk_idx")),
      Some("""WITH t AS (
             |  SELECT doc_id, len(list_filter(str_split(text, ' '), x -> x <> '')) AS n
             |  FROM documents),
             |k AS (
             |  SELECT doc_id, n,
             |         unnest(range(0, ((greatest(n - 64, 0) + 47) // 48) + 1)) AS ci
             |  FROM t WHERE n > 0)
             |SELECT doc_id, ci AS chunk_idx, ci * 48 AS start_tok,
             |  least(ci * 48 + 64, n) AS end_tok,
             |  least(ci * 48 + 64, n) - ci * 48 AS n_chunk_toks
             |FROM k ORDER BY doc_id, chunk_idx""".stripMargin),
      doc = "pipeline/text: sliding-window chunk spans (64-token window, 48 stride) for context-length splitting"),

    // T9: deterministic sequence packing — the concat-then-split layout
    // GPT-style pretraining uses to fill fixed-length sequences: docs are
    // hash-dealt into 16 shards (t6/x8's portable hash), concatenated in
    // doc_id order within each shard, and every doc reports the token
    // offset where it lands plus the 256-token pack its first token falls
    // in. The running sum is a per-shard sequential window — at a fixed
    // shard count that is 16 long tasks at 100 TB, the documented
    // W-family stall; production raises the shard count (packing is
    // shard-local, so more shards = more parallelism, same layout law)
    // or routes the prefix sum through Skew.globalRowNumber's two-phase
    // chunked pattern, which generalizes verbatim from counts to sums.
    QueryDef(
      "t9_sequence_pack",
      (s, d) => {
        val P = 1000000007L
        val w = Window.partitionBy(col("shard_id")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T.documents(s, d)
          .select(col("doc_id"),
            (((col("doc_id") % P) * 2654435761L + 2246822519L) % P % 16)
              .as("shard_id"),
            size(filter(split(col("text"), " "), x => x =!= "")).as("n"))
          .filter(col("n") > 0)
          .withColumn("cum", sum(col("n")).over(w))
          .select(col("doc_id"), col("shard_id"),
            (col("cum") - col("n")).as("tok_offset"),
            expr("(cum - n) div 256").as("pack_id"),
            col("n").cast("long").as("n_toks"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    ((doc_id % 1000000007) * 2654435761 + 2246822519) % 1000000007 % 16
             |      AS shard_id,
             |    len(list_filter(str_split(text, ' '), x -> x <> '')) AS n
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, shard_id, n,
             |    sum(n) OVER (PARTITION BY shard_id ORDER BY doc_id
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM t WHERE n > 0)
             |SELECT doc_id, shard_id, CAST(cum - n AS BIGINT) AS tok_offset,
             |  CAST((cum - n) // 256 AS BIGINT) AS pack_id, CAST(n AS BIGINT) AS n_toks
             |FROM c ORDER BY doc_id""".stripMargin),
      doc = "pipeline/text: deterministic shard-local sequence packing (concat in doc_id order, 256-token packs) with per-doc offsets"),

    // T10: temperature-based multilingual mixing — resample the corpus
    // toward q_l ∝ n_l^α (the XLM-R/mBERT exponential-smoothing mix;
    // public literature), here at α = 0.5 so the weight is sqrt(n_l):
    // IEEE sqrt is CORRECTLY ROUNDED on every engine, so — unlike a
    // pow(x, 0.3) whose last ulp is libm's business — the quantized
    // weight floor(sqrt(n)·1e6 + 0.5) is bit-identical in Spark and
    // DuckDB and no FP crosses the oracle boundary (the p10 quantized-
    // transcendental precedent). Targets and per-doc copy counts are
    // exact int64 arithmetic: target_l = N·w_l div W, every doc gets
    // target div n_l copies, and the remainder is dealt by the t6
    // portable hash (h mod n_l < target mod n_l) — head langs
    // downsample (copies may be 0), tail langs upsample (copies ≥ 2),
    // all map-side after a ≤ lang-domain broadcast. The long
    // cross-multiply n·w_l is exact while N·sqrt(N)·1e6 < 2^63 (~2e8
    // docs); beyond that the t9 rule applies: lift the two scalars to
    // decimal(38,0). Explode is sequence(1, copies) — pure fan-out,
    // zero shuffles beyond the lang-count aggregate.
    QueryDef(
      "t10_temperature_mix",
      (s, d) => {
        val P = 1000000007L
        val docs = T.documents(s, d).select(col("doc_id"), col("lang"))
        val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
        val weights = counts.withColumn("wq",
          floor(sqrt(col("cnt").cast("double")) * lit(1e6) + lit(0.5))
            .cast("long"))
        val tot = weights.agg(sum(col("cnt")).as("n"), sum(col("wq")).as("wsum"))
        val targets = weights.crossJoin(broadcast(tot))
          .withColumn("target", expr("n * wq div wsum"))
          .select(col("lang"), col("cnt"), col("target"))
        docs
          .withColumn("h", ((col("doc_id") % P) * 2654435761L + 2246822519L) % P)
          .join(broadcast(targets), Seq("lang"))
          .withColumn("copies", expr("target div cnt") +
            when(expr("h % cnt") < expr("target % cnt"), 1L).otherwise(0L))
          .filter(col("copies") >= 1)
          .select(col("doc_id"), col("lang"),
            explode(sequence(lit(1L), col("copies"))).as("copy_idx"))
          .orderBy(col("doc_id"), col("copy_idx"))
      },
      Some("""WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
             |w AS (SELECT lang, cnt,
             |        CAST(floor(sqrt(CAST(cnt AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
             |          AS wq
             |      FROM c),
             |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
             |               CAST(sum(wq) AS BIGINT) AS wsum FROM w),
             |t AS (SELECT lang, cnt, (n * wq) // wsum AS target
             |      FROM w CROSS JOIN tot),
             |cp AS (
             |  SELECT d.doc_id, d.lang,
             |    target // cnt +
             |      CASE WHEN ((d.doc_id % 1000000007) * 2654435761 + 2246822519)
             |                  % 1000000007 % cnt < target % cnt
             |           THEN 1 ELSE 0 END AS copies
             |  FROM documents d JOIN t USING (lang))
             |SELECT doc_id, lang,
             |  CAST(UNNEST(generate_series(1, copies)) AS BIGINT) AS copy_idx
             |FROM cp WHERE copies >= 1
             |ORDER BY doc_id, copy_idx""".stripMargin),
      doc = "pipeline/data mixing: deterministic temperature resampling toward n_l^0.5 (exponential smoothing, XLM-R-style) with exact integer copy dealing"),

    // T11: unigram-LM surprisal scoring — the CCNet-family quality
    // signal (rank docs by how surprising their tokens are under a
    // corpus LM; head/middle/tail buckets drive keep/drop/re-weight
    // decisions). A float ln() here would be the one transcendental the
    // oracle can't pin (p10 dodges that by shipping its codon logs as
    // PRECOMPUTED quantized literals — impossible for data-dependent
    // counts), so the surprisal is the exact integer BIT LENGTH of
    // T div cnt (x3's conv(·,10,2) trick; DuckDB: length(bin(·))) —
    // floor(log2) resolution, bit-identical on every engine, and the
    // only division is the final sum/n both engines do once in double.
    // Scale: one token-keyed shuffle for the vocab, one for the join
    // back (heavy-hitter tokens like 'the' are 1-row build-side keys —
    // AQE's skew split or Skew.saltedJoin's two-level shape absorb
    // them), one doc-keyed aggregate. No FP crosses the oracle.
    QueryDef(
      "t11_unigram_surprisal",
      (s, d) => {
        val toks = T.documents(s, d)
          .select(col("doc_id"),
            explode(filter(split(lower(col("text")), " "), x => x =!= ""))
              .as("tok"))
        val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        val tot = vocab.agg(sum(col("cnt")).as("t_total"))
        toks.join(vocab, Seq("tok"))
          .crossJoin(broadcast(tot))
          .withColumn("bits",
            length(conv(expr("t_total div cnt"), 10, 2)).cast("long"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_toks"), sum(col("bits")).as("bits_sum"))
          .withColumn("mean_bits",
            col("bits_sum").cast("double") / col("n_toks"))
          .withColumn("band",
            when(col("mean_bits") < 8, "head")
              .when(col("mean_bits") < 12, "middle").otherwise("tail"))
          .select(col("doc_id"), col("n_toks"), col("bits_sum"),
            col("mean_bits"), col("band"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    unnest(list_filter(str_split(lower(text), ' '), x -> x <> '')) AS tok
             |  FROM documents),
             |v AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
             |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t_total FROM v),
             |b AS (SELECT doc_id, length(bin(t_total // cnt)) AS bits
             |      FROM toks JOIN v USING (tok) CROSS JOIN tot)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
             |  CAST(sum(bits) AS BIGINT) AS bits_sum,
             |  CAST(sum(bits) AS DOUBLE) / count(*) AS mean_bits,
             |  CASE WHEN CAST(sum(bits) AS DOUBLE) / count(*) < 8 THEN 'head'
             |       WHEN CAST(sum(bits) AS DOUBLE) / count(*) < 12 THEN 'middle'
             |       ELSE 'tail' END AS band
             |FROM b GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      doc = "pipeline/text: unigram-LM surprisal quality scoring (CCNet-style head/middle/tail banding) via exact integer bit-length surprisal"),

    // T11b: t11's banding with QUANTILE-calibrated thresholds — the
    // production form of CCNet banding. The r10 500k rehearsal measured
    // what fixed cuts do off their home corpus: 100% of documents landed
    // in the tail band (absolute bit cuts don't transfer across
    // tokenizers or vocabulary shapes), so the three-way split was a
    // no-op. Real curricula band by corpus quantile; this row makes that
    // rule an oracled operator. Exactness across the oracle boundary
    // (approx_percentile's sketch could never hash-match): the per-doc
    // surprisal quantizes to integer milli-bits mb = bits_sum·1000 div
    // n_toks (pure int64 — the double mean never crosses the boundary),
    // and the tercile thresholds are the smallest mb with 3·cum ≥ n
    // (resp. ≥ 2n) on the cumulative histogram over the mb DOMAIN —
    // a deterministic rule both engines compute identically. Scale
    // shape: t11's token shuffles + ONE domain-bounded histogram
    // (bit-lengths ≤ 64 ⇒ mb ≤ 64000 distinct values) whose cumulative
    // window runs single-partition over that tiny frame (t13's
    // bounded-domain precedent) and broadcasts back as a 1-row
    // threshold scalar — no global sort of the doc grain anywhere.
    // Ties sit entirely in whichever band their mb falls (band sizes
    // are ~n/3, not exactly n/3 — the honest quantile semantics).
    QueryDef(
      "t11b_quantile_bands",
      (s, d) => {
        val W = org.apache.spark.sql.expressions.Window
        val toks = T.documents(s, d)
          .select(col("doc_id"),
            explode(filter(split(lower(col("text")), " "), x => x =!= ""))
              .as("tok"))
        val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        val tot = vocab.agg(sum(col("cnt")).as("t_total"))
        // SharedFrame: the per-doc frame feeds BOTH the threshold
        // derivation and the final band assignment — without it the plan
        // runs the corpus token shuffle twice (caught by ExplainAudit:
        // two full Scan→explode→join→agg subtrees in the physical plan)
        val per = SharedFrame(
          toks.join(vocab, Seq("tok"))
            .crossJoin(broadcast(tot))
            .withColumn("bits",
              length(conv(expr("t_total div cnt"), 10, 2)).cast("long"))
            .groupBy(col("doc_id"))
            .agg(count(lit(1)).as("n_toks"), sum(col("bits")).as("bits_sum"))
            .withColumn("mb_milli", expr("bits_sum * 1000 div n_toks")),
          "t11b_per", d)
        val hist = per.groupBy(col("mb_milli")).agg(count(lit(1)).as("c"))
        val thr = hist
          .withColumn("cum", sum(col("c")).over(W.orderBy(col("mb_milli"))))
          .crossJoin(broadcast(hist.agg(sum(col("c")).as("n"))))
          .agg(
            min(when(col("cum") * 3 >= col("n"), col("mb_milli"))).as("lo"),
            min(when(col("cum") * 3 >= col("n") * 2, col("mb_milli"))).as("hi"))
        per.crossJoin(broadcast(thr))
          .withColumn("band",
            when(col("mb_milli") <= col("lo"), "head")
              .when(col("mb_milli") <= col("hi"), "middle")
              .otherwise("tail"))
          .select(col("doc_id"), col("n_toks"), col("bits_sum"),
            col("mb_milli"), col("band"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    unnest(list_filter(str_split(lower(text), ' '), x -> x <> '')) AS tok
             |  FROM documents),
             |v AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
             |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t_total FROM v),
             |per AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
             |    CAST(sum(length(bin(t_total // cnt))) AS BIGINT) AS bits_sum
             |  FROM toks JOIN v USING (tok) CROSS JOIN tot
             |  GROUP BY doc_id),
             |pm AS (SELECT *, bits_sum * 1000 // n_toks AS mb_milli FROM per),
             |hist AS (SELECT mb_milli, CAST(count(*) AS BIGINT) AS c
             |         FROM pm GROUP BY mb_milli),
             |cum AS (SELECT mb_milli,
             |          CAST(sum(c) OVER (ORDER BY mb_milli) AS BIGINT) AS cum
             |        FROM hist),
             |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM hist),
             |thr AS (
             |  SELECT min(CASE WHEN cum * 3 >= n THEN mb_milli END) AS lo,
             |         min(CASE WHEN cum * 3 >= 2 * n THEN mb_milli END) AS hi
             |  FROM cum CROSS JOIN nn)
             |SELECT doc_id, n_toks, bits_sum, CAST(mb_milli AS BIGINT) AS mb_milli,
             |  CASE WHEN mb_milli <= lo THEN 'head'
             |       WHEN mb_milli <= hi THEN 'middle' ELSE 'tail' END AS band
             |FROM pm CROSS JOIN thr ORDER BY doc_id""".stripMargin),
      doc = "pipeline/data mixing: quantile-calibrated surprisal banding — tercile thresholds from a milli-bit domain histogram (deterministic integer rule, no approx sketch), CCNet banding that transfers across corpus shapes. CAVEAT: 'tercile' is nominal — a mass atom (many docs sharing one mb value, common on templated corpora) sits entirely in one band, so achieved fractions can be far from 1/3 each (the r11 500k rehearsal read 43/55/2%); t11c_band_fractions reports the achieved split"),

    // T11b-companion: the ACHIEVED band fractions — quantile banding
    // under mass atoms is honest but surprising (inclusive bands put
    // every doc on an atom's mb value in ONE band; the 500k rehearsal's
    // "terciles" split 43/55/2% because ~43% of docs share a single
    // mb = 13000 atom), so the split t11b actually produced must be a
    // first-class, oracled readout rather than a rehearsal-analysis
    // footnote (r11 verdict #3). Exact integers over the SAME histogram
    // + threshold frames t11b already computes (SharedFrame'd, so a
    // session running both pays the token shuffles once): per band,
    // the doc count and the exact ppm fraction n_docs·1e6 div n_total.
    // A curator reads this BEFORE trusting the bands as mix weights.
    QueryDef(
      "t11c_band_fractions",
      (s, d) => {
        val W = org.apache.spark.sql.expressions.Window
        val toks = T.documents(s, d)
          .select(col("doc_id"),
            explode(filter(split(lower(col("text")), " "), x => x =!= ""))
              .as("tok"))
        val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        val tot = vocab.agg(sum(col("cnt")).as("t_total"))
        val per = SharedFrame(
          toks.join(vocab, Seq("tok"))
            .crossJoin(broadcast(tot))
            .withColumn("bits",
              length(conv(expr("t_total div cnt"), 10, 2)).cast("long"))
            .groupBy(col("doc_id"))
            .agg(count(lit(1)).as("n_toks"), sum(col("bits")).as("bits_sum"))
            .withColumn("mb_milli", expr("bits_sum * 1000 div n_toks")),
          "t11b_per", d)
        val hist = per.groupBy(col("mb_milli")).agg(count(lit(1)).as("c"))
        val thr = hist
          .withColumn("cum", sum(col("c")).over(W.orderBy(col("mb_milli"))))
          .crossJoin(broadcast(hist.agg(sum(col("c")).as("n"))))
          .agg(
            min(when(col("cum") * 3 >= col("n"), col("mb_milli"))).as("lo"),
            min(when(col("cum") * 3 >= col("n") * 2, col("mb_milli"))).as("hi"))
        per.crossJoin(broadcast(thr))
          .withColumn("band",
            when(col("mb_milli") <= col("lo"), "head")
              .when(col("mb_milli") <= col("hi"), "middle")
              .otherwise("tail"))
          .groupBy(col("band")).agg(count(lit(1)).as("n_docs"))
          .crossJoin(broadcast(per.agg(count(lit(1)).as("n_total"))))
          .withColumn("frac_ppm", expr("n_docs * 1000000 div n_total"))
          .select(col("band"), col("n_docs"), col("frac_ppm"))
          .orderBy(col("band"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    unnest(list_filter(str_split(lower(text), ' '), x -> x <> '')) AS tok
             |  FROM documents),
             |v AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
             |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t_total FROM v),
             |per AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
             |    CAST(sum(length(bin(t_total // cnt))) AS BIGINT) AS bits_sum
             |  FROM toks JOIN v USING (tok) CROSS JOIN tot
             |  GROUP BY doc_id),
             |pm AS (SELECT *, bits_sum * 1000 // n_toks AS mb_milli FROM per),
             |hist AS (SELECT mb_milli, CAST(count(*) AS BIGINT) AS c
             |         FROM pm GROUP BY mb_milli),
             |cum AS (SELECT mb_milli,
             |          CAST(sum(c) OVER (ORDER BY mb_milli) AS BIGINT) AS cum
             |        FROM hist),
             |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM hist),
             |thr AS (
             |  SELECT min(CASE WHEN cum * 3 >= n THEN mb_milli END) AS lo,
             |         min(CASE WHEN cum * 3 >= 2 * n THEN mb_milli END) AS hi
             |  FROM cum CROSS JOIN nn),
             |bands AS (
             |  SELECT CASE WHEN mb_milli <= lo THEN 'head'
             |              WHEN mb_milli <= hi THEN 'middle'
             |              ELSE 'tail' END AS band
             |  FROM pm CROSS JOIN thr)
             |SELECT band, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(count(*) * 1000000 // n AS BIGINT) AS frac_ppm
             |FROM bands CROSS JOIN nn
             |GROUP BY band, n ORDER BY band""".stripMargin),
      doc = "pipeline/data mixing: achieved band fractions for t11b's quantile banding — per-band doc counts and exact ppm shares over the same histogram/threshold frames; the mass-atom reality check a curator reads before using the bands as mix weights"),

    // X9: curriculum assembly — the t11/t10 capstone composite: x6's
    // quality + language gates → t11's surprisal banding computed on the
    // gated TRAIN slice (vocab from the data being curated, the CCNet
    // shape) with the tail band dropped → d10's decontamination gate
    // (run AFTER banding: grams are only derived for docs that can
    // still ship) → t10's temperature mix on predicted language
    // (copies, not keep/drop — tail langs upsample) → deterministic
    // 8-way sharding where a doc's copies spread over shards via
    // (h + copy_idx) mod 8, reported as per-shard stats carrying every
    // stage's survivor count. Scale: corpus-wide shuffles are keyed on
    // token (vocab + join-back), gram digest, and shard_id; every
    // scalar/domain frame (token total, weight totals, funnel counts,
    // lang targets) broadcasts. The gated frame is the same
    // SharedFrame x6/x6b/x8 read; banded and clean feed 3 consumers
    // each and are SharedFrame'd too.
    QueryDef(
      "x9_curriculum_mix",
      (s, d) => {
        graft.functions.GraftExtensions.registerInto(s)
        val P = 1000000007L
        val n = 6
        val gated = corpusGated(s, d)
        val train = gated.filter(col("doc_id") % 10 =!= 7)

        // t11's bit-length surprisal, vocab = the gated train slice
        val toks = train.select(col("doc_id"),
          explode(filter(split(lower(col("text")), " "), x => x =!= ""))
            .as("tok"))
        val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        val vtot = vocab.agg(sum(col("cnt")).as("t_total"))
        val bits = toks.join(vocab, Seq("tok"))
          .crossJoin(broadcast(vtot))
          .withColumn("b",
            length(conv(expr("t_total div cnt"), 10, 2)).cast("long"))
          .groupBy(col("doc_id"))
          .agg((sum(col("b")).cast("double") / count(lit(1))).as("mean_bits"))
        val banded = SharedFrame(
          train.join(bits, Seq("doc_id")).filter(col("mean_bits") < 12)
            .select(col("doc_id"), col("text"), col("n_toks"),
              col("pred_lang")), "x9_banded", d)

        // d10's gate over the banded survivors
        val evalGrams = T.documents(s, d)
          .filter(col("doc_id") % 10 === 7)
          .select(explode(expr(
            s"hashed_ngrams(filter(split(lower(text), ' '), x -> x != ''), $n)")).as("h"))
          .distinct()
        val trainGrams = banded
          .select(col("doc_id"), explode(expr(
            s"hashed_ngrams(filter(split(lower(text), ' '), x -> x != ''), $n)")).as("h"))
          .dropDuplicates("doc_id", "h")
        val contaminated = trainGrams.join(evalGrams, Seq("h"), "left_semi")
          .select(col("doc_id")).distinct()
        val clean = SharedFrame(
          banded.join(contaminated, Seq("doc_id"), "left_anti")
            .select(col("doc_id"), col("n_toks"), col("pred_lang")),
          "x9_clean", d)

        // t10's temperature dealing on pred_lang
        val counts = clean.groupBy(col("pred_lang")).agg(count(lit(1)).as("cnt"))
        val weights = counts.withColumn("wq",
          floor(sqrt(col("cnt").cast("double")) * lit(1e6) + lit(0.5))
            .cast("long"))
        val wtot = weights.agg(sum(col("cnt")).as("nn"), sum(col("wq")).as("wsum"))
        val targets = weights.crossJoin(broadcast(wtot))
          .withColumn("target", expr("nn * wq div wsum"))
          .select(col("pred_lang"), col("cnt"), col("target"))

        val nGated = train.agg(count(lit(1)).as("n_train_gated"))
        val nBand = banded.agg(count(lit(1)).as("n_banded"))
        val nClean = clean.agg(count(lit(1)).as("n_clean"))
        clean
          .withColumn("h", ((col("doc_id") % P) * 2654435761L + 2246822519L) % P)
          .join(broadcast(targets), Seq("pred_lang"))
          .withColumn("copies", expr("target div cnt") +
            when(expr("h % cnt") < expr("target % cnt"), 1L).otherwise(0L))
          .filter(col("copies") >= 1)
          .withColumn("copy_idx", explode(sequence(lit(1L), col("copies"))))
          .withColumn("shard_id", (col("h") + col("copy_idx")) % 8)
          .groupBy(col("shard_id"))
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col("doc_id")).as("n_src_docs"),
            sum(col("n_toks").cast("long")).as("n_tokens"))
          .crossJoin(broadcast(nGated))
          .crossJoin(broadcast(nBand))
          .crossJoin(broadcast(nClean))
          .select(col("shard_id"), col("n_rows"), col("n_src_docs"),
            col("n_tokens"), col("n_train_gated"), col("n_banded"),
            col("n_clean"))
          .orderBy(col("shard_id"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, text,
             |    len(list_filter(str_split(text, ' '), x -> x <> '')) AS n_toks,
             |    len(list_intersect(
             |      list_distinct(list_filter(str_split(text, ' '), x -> x <> '')),
             |      ['the','a','of','and','is','table','row'])) AS stop
             |  FROM documents),
             |q AS (
             |  SELECT doc_id, text, n_toks,
             |    CASE WHEN n_toks >= 5 THEN 1.0 ELSE 0.0 END * 0.4 +
             |    CASE WHEN (CASE WHEN n_toks > 0
             |               THEN CAST(length(text) - (n_toks - 1) AS DOUBLE) / n_toks
             |               ELSE 0.0 END) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END * 0.3 +
             |    CASE WHEN stop > 0 THEN 1.0 ELSE 0.0 END * 0.3 AS quality
             |  FROM t),
             |sc AS (
             |  SELECT doc_id, text, n_toks,
             |    len(list_intersect(list_distinct(str_split(lower(text), ' ')),
             |        ['der','die','und','ist','von'])) AS s_de,
             |    len(list_intersect(list_distinct(str_split(lower(text), ' ')),
             |        ['the','a','of','and','is'])) AS s_en,
             |    len(list_intersect(list_distinct(str_split(lower(text), ' ')),
             |        ['el','los','y','de','es'])) AS s_es,
             |    len(list_intersect(list_distinct(str_split(lower(text), ' ')),
             |        ['le','la','et','de','est'])) AS s_fr
             |  FROM q WHERE quality >= 0.7),
             |gated AS (
             |  SELECT doc_id, text, n_toks,
             |    CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'unknown'
             |         WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
             |         WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
             |         WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
             |         ELSE 'fr' END AS pred_lang
             |  FROM sc WHERE greatest(s_de, s_en, s_es, s_fr) > 0),
             |tr AS (SELECT * FROM gated WHERE doc_id % 10 != 7),
             |ttoks AS (
             |  SELECT doc_id,
             |    unnest(list_filter(str_split(lower(text), ' '), x -> x <> '')) AS tok
             |  FROM tr),
             |v AS (SELECT tok, count(*) AS cnt FROM ttoks GROUP BY tok),
             |vt AS (SELECT CAST(sum(cnt) AS BIGINT) AS t_total FROM v),
             |db AS (
             |  SELECT doc_id,
             |    CAST(sum(length(bin(t_total // cnt))) AS DOUBLE) / count(*) AS mean_bits
             |  FROM ttoks JOIN v USING (tok) CROSS JOIN vt GROUP BY doc_id),
             |banded AS (
             |  SELECT tr.* FROM tr JOIN db USING (doc_id) WHERE mean_bits < 12),
             |evtoks AS (
             |  SELECT doc_id, list_filter(str_split(lower(text), ' '), x -> x <> '') AS ts
             |  FROM documents WHERE doc_id % 10 = 7),
             |ev AS (
             |  SELECT DISTINCT md5(array_to_string(ts[i : i + 5], ' ')) AS h
             |  FROM (SELECT doc_id, ts, unnest(range(1, greatest(len(ts) - 4, 1))) AS i
             |        FROM evtoks)),
             |btoks AS (
             |  SELECT doc_id, list_filter(str_split(lower(text), ' '), x -> x <> '') AS ts
             |  FROM banded),
             |tg AS (
             |  SELECT DISTINCT doc_id, md5(array_to_string(ts[i : i + 5], ' ')) AS h
             |  FROM (SELECT doc_id, ts, unnest(range(1, greatest(len(ts) - 4, 1))) AS i
             |        FROM btoks)),
             |cont AS (SELECT DISTINCT doc_id FROM tg JOIN ev USING (h)),
             |clean AS (
             |  SELECT doc_id, n_toks, pred_lang FROM banded
             |  WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
             |c AS (SELECT pred_lang, count(*) AS cnt FROM clean GROUP BY pred_lang),
             |w AS (SELECT pred_lang, cnt,
             |        CAST(floor(sqrt(CAST(cnt AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS wq
             |      FROM c),
             |wt AS (SELECT CAST(sum(cnt) AS BIGINT) AS nn,
             |              CAST(sum(wq) AS BIGINT) AS wsum FROM w),
             |tgt AS (SELECT pred_lang, cnt, (nn * wq) // wsum AS target
             |        FROM w CROSS JOIN wt),
             |cp AS (
             |  SELECT cl.doc_id, cl.pred_lang, cl.n_toks,
             |    ((cl.doc_id % 1000000007) * 2654435761 + 2246822519) % 1000000007 AS h,
             |    target // cnt +
             |      CASE WHEN ((cl.doc_id % 1000000007) * 2654435761 + 2246822519)
             |                  % 1000000007 % cnt < target % cnt
             |           THEN 1 ELSE 0 END AS copies
             |  FROM clean cl JOIN tgt USING (pred_lang)),
             |ex AS (
             |  SELECT doc_id, pred_lang, n_toks, h,
             |    CAST(UNNEST(generate_series(1, copies)) AS BIGINT) AS copy_idx
             |  FROM cp WHERE copies >= 1),
             |sh AS (
             |  SELECT (h + copy_idx) % 8 AS shard_id, count(*) AS n_rows,
             |    count(DISTINCT doc_id) AS n_src_docs,
             |    CAST(sum(n_toks) AS BIGINT) AS n_tokens
             |  FROM ex GROUP BY 1),
             |scal AS (
             |  SELECT (SELECT count(*) FROM tr) AS n_train_gated,
             |         (SELECT count(*) FROM banded) AS n_banded,
             |         (SELECT count(*) FROM clean) AS n_clean)
             |SELECT shard_id, n_rows, n_src_docs, n_tokens,
             |  n_train_gated, n_banded, n_clean
             |FROM sh CROSS JOIN scal ORDER BY shard_id""".stripMargin),
      doc = "pipeline composite: curriculum assembly — gates -> surprisal banding (t11, tail dropped) -> decontaminate -> temperature mix (t10, copies) -> 8-way sharding with funnel-carrying stats"),

    // D13: SemDeDup — semantic deduplication over embeddings (Abbas et
    // al. 2023, arXiv:2303.09540, public literature): coarse-cluster the
    // corpus, then WITHIN each cluster drop every member that has a
    // semantic duplicate (pair cosine >= tau) of higher keep-priority.
    // The paper's keep rule: within a duplicate pair, keep the member
    // with LOWER cosine to the cluster centroid (retain the extremes =
    // diversity); tie-broken by vec_id. Cluster machinery is d7's:
    // deterministic stride-sampled centroids (production retrains
    // offline) and the identical nearest-centroid assignment, so the two
    // queries share the `d7_base` quantized frame via SharedFrame.
    // Scale shape: the within-cluster pair scan IS SemDeDup's semantics
    // — the paper runs it per k-means cluster precisely to bound the
    // quadratic at (N/K)² per cluster, and K grows with the corpus (the
    // same footer-stride cap as d7 keeps K ≈ min(N/50, 4096) here). The
    // only corpus-wide shuffles key on vec_id (assignment groupBy) and
    // list_id (the member self-join); centroids broadcast. Exactness:
    // quantized BIGINT dots, identical-double cosines for the tau
    // compare (d6's rule), and the keep-priority compares on the
    // 1e-6-fixed-pointed centroid cosine (d12's rule) so no FP
    // inequality crosses the oracle boundary. tau = 0.3 is calibrated
    // to this synthetic corpus (max within-cluster pair cosine 0.48);
    // the paper sweeps 0.5–0.95 on real embeddings.
    QueryDef(
      "d13_semdedup",
      (s, d) => {
        val q = expr("transform(embedding, x -> CAST(floor(x * 1000 + 0.5) AS BIGINT))")
        val base = SharedFrame(
          T.embeddings(s, d).select(col("vec_id"), q.as("q"))
            .withColumn("nn",
              expr("aggregate(zip_with(q, q, (a, b) -> a * b), 0L, (acc, x) -> acc + x)")),
          "d7_base", d)
        val stride = math.max(50L,
          T.footerRowCount(s, d, "embeddings") / 4096L)
        semDedup(base, stride, 0.3, "d13_members", d)
          .select(col("vec_id"), col("list_id"),
            (col("cqc").cast("double") / lit(1000000)).as("cos_centroid"))
          .orderBy(col("vec_id"))
      },
      // Full re-derivation: d7's centroid/assignment CTEs (stride is the
      // literal 50 — footerRowCount/4096 < 50 at every test SF), the
      // pair scan, the paper's keep rule on the quantized centroid
      // cosine, and the survivor anti-join.
      Some("""WITH base AS (
             |  SELECT vec_id,
             |         [floor((embedding[i] * 1000)::DOUBLE + 0.5)::BIGINT
             |          FOR i IN range(1, len(embedding) + 1)] AS q
             |  FROM embeddings),
             |withnn AS (
             |  SELECT vec_id, q,
             |         list_reduce([q[i] * q[i] FOR i IN range(1, len(q) + 1)],
             |                     (a, b) -> a + b) AS nn
             |  FROM base),
             |cents AS (
             |  SELECT vec_id AS cid, q AS cq, nn AS cn FROM withnn WHERE vec_id % 50 = 0),
             |simsc AS (
             |  SELECT v.vec_id, v.q, v.nn, c.cid,
             |         list_reduce([v.q[i] * c.cq[i] FOR i IN range(1, len(v.q) + 1)],
             |                     (a, b) -> a + b)::DOUBLE
             |           / sqrt(v.nn::DOUBLE * c.cn::DOUBLE) AS sim
             |  FROM withnn v CROSS JOIN cents c),
             |assigned AS (
             |  SELECT vec_id, cid AS list_id,
             |         floor(sim * 1000000 + 0.5)::BIGINT AS cqc
             |  FROM (
             |    SELECT vec_id, cid, sim,
             |           row_number() OVER (PARTITION BY vec_id
             |                              ORDER BY sim DESC, cid ASC) AS rn
             |    FROM simsc) WHERE rn = 1),
             |m AS (
             |  SELECT a.vec_id, a.list_id, a.cqc, w.q, w.nn
             |  FROM assigned a JOIN withnn w USING (vec_id)),
             |dropped AS (
             |  SELECT DISTINCT m1.vec_id
             |  FROM m m1 JOIN m m2
             |    ON m1.list_id = m2.list_id AND m1.vec_id != m2.vec_id
             |   AND list_reduce([m1.q[i] * m2.q[i] FOR i IN range(1, len(m1.q) + 1)],
             |                   (a, b) -> a + b)::DOUBLE
             |         / sqrt(m1.nn::DOUBLE * m2.nn::DOUBLE) >= 0.3
             |   AND (m2.cqc < m1.cqc OR (m2.cqc = m1.cqc AND m2.vec_id < m1.vec_id)))
             |SELECT vec_id, list_id, cqc::DOUBLE / 1000000 AS cos_centroid
             |FROM m WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
             |ORDER BY vec_id""".stripMargin),
      doc = "pipeline/dedup: SemDeDup semantic deduplication (cluster -> within-cluster cosine prune, keep-farthest-from-centroid); the embedding-space member of the dedup family"),

    // T12: the Gopher rule table (Rae et al. 2021, §A1.1, public
    // literature) — the per-rule diagnostic every curation run reads
    // before picking thresholds: word count bounds, mean word length in
    // [3, 10], symbol-to-word ratio (hash / ellipsis), bullet-start and
    // ellipsis-end line fractions, alphabetic-word fraction, and
    // stopword presence, each as its own flag plus the conjunction. t2
    // folds a 3-rule subset into one score; this is the full table with
    // per-rule accounting (what x6's gate would consume at production
    // fidelity). One scan, zero shuffles; every ratio test is an exact
    // integer cross-multiply (10·sym ≤ words, 5·alpha ≥ 4·words, ...)
    // so no double crosses the oracle boundary. Words are space-split
    // (the house tokenization); lines split on \n. The stopword rule is
    // Gopher's 8-word list at threshold 1 — the sf vocabulary carries
    // only 'the'; SemDedupGopherSpec trips every rule (bullets,
    // ellipses, symbols, one-char words) on planted multi-line text.
    QueryDef(
      "t12_gopher_rules",
      (s, d) =>
        gopherFlags(T.documents(s, d))
          .select(col("doc_id"), col("n_words"), col("r_words"),
            col("r_meanlen"), col("r_symbol"), col("r_bullet"),
            col("r_ellipsis"), col("r_alpha"), col("r_stop"), col("pass"))
          .orderBy(col("doc_id")),
      Some("""WITH t AS (
             |  SELECT doc_id, text,
             |    list_filter(str_split(text, ' '), x -> x <> '') AS toks,
             |    str_split(text, chr(10)) AS lines
             |  FROM documents),
             |m AS (
             |  SELECT doc_id,
             |    len(toks) AS n_words,
             |    len(lines) AS n_lines,
             |    CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0)
             |         AS BIGINT) AS wchars,
             |    len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]')))
             |      AS alpha_words,
             |    (length(text) - length(replace(text, '#', ''))) +
             |      (length(text) - length(replace(text, '...', ''))) // 3 AS n_sym,
             |    len(list_filter(lines, l -> l[1:2] = '- ' OR l[1:2] = '* '))
             |      AS bullet_lines,
             |    len(list_filter(lines, l -> l[-3:] = '...')) AS ellipsis_lines,
             |    len(list_intersect(list_distinct(toks),
             |        ['the','be','to','of','and','that','have','with'])) AS n_stop
             |  FROM t),
             |f AS (
             |  SELECT doc_id, n_words,
             |    CASE WHEN n_words BETWEEN 20 AND 100000 THEN 1 ELSE 0 END AS r_words,
             |    CASE WHEN n_words > 0 AND wchars >= n_words * 3
             |              AND wchars <= n_words * 10 THEN 1 ELSE 0 END AS r_meanlen,
             |    CASE WHEN n_sym * 10 <= n_words THEN 1 ELSE 0 END AS r_symbol,
             |    CASE WHEN bullet_lines * 10 <= n_lines * 9 THEN 1 ELSE 0 END AS r_bullet,
             |    CASE WHEN ellipsis_lines * 10 <= n_lines * 3 THEN 1 ELSE 0 END
             |      AS r_ellipsis,
             |    CASE WHEN alpha_words * 5 >= n_words * 4 THEN 1 ELSE 0 END AS r_alpha,
             |    CASE WHEN n_stop >= 1 THEN 1 ELSE 0 END AS r_stop
             |  FROM m)
             |SELECT doc_id, n_words, r_words, r_meanlen, r_symbol, r_bullet,
             |  r_ellipsis, r_alpha, r_stop,
             |  r_words * r_meanlen * r_symbol * r_bullet * r_ellipsis * r_alpha * r_stop
             |    AS pass
             |FROM f ORDER BY doc_id""".stripMargin),
      doc = "pipeline/text: full Gopher quality-rule table with per-rule flags (word count, mean word length, symbol/bullet/ellipsis ratios, alpha fraction, stopwords) + the conjunction"),

    // T13: vocabulary coverage curve — the tokenizer-sizing read every
    // BPE/vocab decision consumes: what fraction of all token
    // OCCURRENCES the top-k vocabulary entries cover, at k = 10/25/100
    // (the sf vocabulary holds 31 types, so the curve saturates at 100
    // — the shape the real decision reads). One token-keyed shuffle for
    // the type counts; the ranking window runs over the VOCABULARY, not
    // the corpus — the c1/c2 vocab-domain single-partition precedent
    // (types ≪ occurrences at every scale; a 1e8-type vocab at 100 TB
    // would swap the window for the two-phase global rank,
    // Skew.globalRowNumber's pattern, counts → sums verbatim). The
    // coverage doubles are single exact long/long divisions, and the
    // rank tiebreak (cnt DESC, tok ASC) is total, so both engines rank
    // identically.
    QueryDef(
      "t13_vocab_coverage",
      (s, d) => {
        val vocab = T.documents(s, d)
          .select(explode(filter(split(lower(col("text")), " "), x => x =!= ""))
            .as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        val ranked = vocab.withColumn("rk",
          row_number().over(Window.orderBy(col("cnt").desc, col("tok"))))
        ranked
          .agg(
            sum(when(col("rk") <= 10, col("cnt"))).as("c10"),
            sum(when(col("rk") <= 25, col("cnt"))).as("c25"),
            sum(when(col("rk") <= 100, col("cnt"))).as("c100"),
            sum(col("cnt")).as("total"),
            count(lit(1)).as("v_size"))
          .select(
            expr("stack(3, 10, c10, 25, c25, 100, c100) as (k, covered)"),
            col("total"), col("v_size"))
          .withColumn("coverage",
            col("covered").cast("double") / col("total"))
          .select(col("k"), col("covered"), col("total"), col("v_size"),
            col("coverage"))
          .orderBy(col("k"))
      },
      Some("""WITH t AS (
             |  SELECT unnest(list_filter(str_split(lower(text), ' '), x -> x <> ''))
             |    AS tok
             |  FROM documents),
             |v AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
             |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok ASC) AS rk
             |      FROM v),
             |a AS (
             |  SELECT CAST(sum(CASE WHEN rk <= 10 THEN cnt END) AS BIGINT) AS c10,
             |         CAST(sum(CASE WHEN rk <= 25 THEN cnt END) AS BIGINT) AS c25,
             |         CAST(sum(CASE WHEN rk <= 100 THEN cnt END) AS BIGINT) AS c100,
             |         CAST(sum(cnt) AS BIGINT) AS total,
             |         count(*) AS v_size
             |  FROM r)
             |SELECT k, covered, total, v_size, covered::DOUBLE / total AS coverage
             |FROM (
             |  SELECT 10 AS k, c10 AS covered, total, v_size FROM a
             |  UNION ALL SELECT 25, c25, total, v_size FROM a
             |  UNION ALL SELECT 100, c100, total, v_size FROM a)
             |ORDER BY k""".stripMargin),
      doc = "pipeline/text: top-k vocabulary coverage curve (token-occurrence share of the k most frequent types) for tokenizer/vocab sizing"),

    // X10: embedding-side curation capstone — the composite the
    // embedding family exists for, mirroring what x6 does for text:
    // SemDeDup prune (d13, sharing its `d7_base`/`d13_members` caches)
    // → per-label cohesion RE-MEASURED on the survivors with d12's
    // exact arithmetic (centroid = elementwise survivor sum; member
    // cosines fixed-pointed at 1e-6 BEFORE the mean), carrying
    // n_before/n_kept per label so the rollup reads as a funnel. The
    // curation question it answers: what did semantic pruning do to
    // each label's cluster tightness? Scale shape: semDedup's
    // vec_id/list_id shuffles plus label-keyed aggregates; the label
    // centroid frame and per-label counts broadcast (label-domain,
    // d12's hint precedent).
    QueryDef(
      "x10_embedding_curation",
      (s, d) => {
        graft.functions.GraftExtensions.registerInto(s)
        val q = expr("transform(embedding, x -> CAST(floor(x * 1000 + 0.5) AS BIGINT))")
        val base = SharedFrame(
          T.embeddings(s, d).select(col("vec_id"), q.as("q"))
            .withColumn("nn",
              expr("aggregate(zip_with(q, q, (a, b) -> a * b), 0L, (acc, x) -> acc + x)")),
          "d7_base", d)
        val stride = math.max(50L,
          T.footerRowCount(s, d, "embeddings") / 4096L)
        val surv = semDedup(base, stride, 0.3, "d13_members", d)
        val labeled = T.embeddings(s, d).select(col("vec_id"), col("label"))
        val nBefore = labeled.groupBy(col("label"))
          .agg(count(lit(1)).as("n_before"))
        val kept = surv.select(col("vec_id"))
          .join(labeled, "vec_id")
          .join(base, "vec_id")
        val cvec = kept.select(col("label"), posexplode(col("q")).as(Seq("p", "v")))
          .groupBy(col("label"), col("p"))
          .agg(sum(col("v")).as("sv"))
          .groupBy(col("label"))
          .agg(expr("transform(array_sort(collect_list(struct(p, sv))), x -> x.sv)")
            .as("sv"))
        kept.join(broadcast(cvec), Seq("label"))
          .withColumn("dot", expr("long_dot(q, sv)"))
          .withColumn("cc", expr("long_dot(sv, sv)"))
          .filter(col("nn") > 0 && col("cc") > 0)
          .withColumn("cq",
            floor(col("dot").cast("double") /
              sqrt(col("nn").cast("double") * col("cc").cast("double")) *
              lit(1000000) + lit(0.5)).cast("long"))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n_kept"),
            (sum(col("cq")).cast("double") / lit(1000000) / count(lit(1)))
              .as("mean_cos_kept"),
            (min(col("cq")).cast("double") / lit(1000000)).as("min_cos_kept"))
          .join(broadcast(nBefore), Seq("label"))
          .select(col("label"), col("n_before"), col("n_kept"),
            col("mean_cos_kept"), col("min_cos_kept"))
          .orderBy(col("label"))
      },
      // d13's full prune re-derivation + d12's cohesion arithmetic
      // re-rooted at the survivors
      Some("""WITH base AS (
             |  SELECT vec_id,
             |         [floor((embedding[i] * 1000)::DOUBLE + 0.5)::BIGINT
             |          FOR i IN range(1, len(embedding) + 1)] AS q
             |  FROM embeddings),
             |withnn AS (
             |  SELECT vec_id, q,
             |         list_reduce([q[i] * q[i] FOR i IN range(1, len(q) + 1)],
             |                     (a, b) -> a + b) AS nn
             |  FROM base),
             |cents AS (
             |  SELECT vec_id AS cid, q AS cq, nn AS cn FROM withnn WHERE vec_id % 50 = 0),
             |simsc AS (
             |  SELECT v.vec_id, v.q, v.nn, c.cid,
             |         list_reduce([v.q[i] * c.cq[i] FOR i IN range(1, len(v.q) + 1)],
             |                     (a, b) -> a + b)::DOUBLE
             |           / sqrt(v.nn::DOUBLE * c.cn::DOUBLE) AS sim
             |  FROM withnn v CROSS JOIN cents c),
             |assigned AS (
             |  SELECT vec_id, cid AS list_id,
             |         floor(sim * 1000000 + 0.5)::BIGINT AS cqc
             |  FROM (
             |    SELECT vec_id, cid, sim,
             |           row_number() OVER (PARTITION BY vec_id
             |                              ORDER BY sim DESC, cid ASC) AS rn
             |    FROM simsc) WHERE rn = 1),
             |m AS (
             |  SELECT a.vec_id, a.list_id, a.cqc, w.q, w.nn
             |  FROM assigned a JOIN withnn w USING (vec_id)),
             |dropped AS (
             |  SELECT DISTINCT m1.vec_id
             |  FROM m m1 JOIN m m2
             |    ON m1.list_id = m2.list_id AND m1.vec_id != m2.vec_id
             |   AND list_reduce([m1.q[i] * m2.q[i] FOR i IN range(1, len(m1.q) + 1)],
             |                   (a, b) -> a + b)::DOUBLE
             |         / sqrt(m1.nn::DOUBLE * m2.nn::DOUBLE) >= 0.3
             |   AND (m2.cqc < m1.cqc OR (m2.cqc = m1.cqc AND m2.vec_id < m1.vec_id))),
             |surv AS (
             |  SELECT vec_id, q, nn FROM m
             |  WHERE vec_id NOT IN (SELECT vec_id FROM dropped)),
             |kept AS (
             |  SELECT s.vec_id, e.label, s.q, s.nn
             |  FROM surv s JOIN embeddings e USING (vec_id)),
             |nb AS (SELECT label, count(*) AS n_before FROM embeddings GROUP BY label),
             |px AS (
             |  SELECT vec_id, label, unnest(q) AS v,
             |         unnest(range(1, len(q) + 1)) AS p
             |  FROM kept),
             |cent AS (
             |  SELECT label, p, CAST(sum(v) AS BIGINT) AS sv FROM px GROUP BY label, p),
             |cvec AS (
             |  SELECT label, list(sv ORDER BY p) AS sv FROM cent GROUP BY label),
             |mm AS (
             |  SELECT k.label, k.vec_id,
             |    list_reduce([k.q[i] * c.sv[i] FOR i IN range(1, len(k.q) + 1)],
             |                (a, b) -> a + b) AS dot,
             |    k.nn AS nn,
             |    list_reduce([c.sv[i] * c.sv[i] FOR i IN range(1, len(c.sv) + 1)],
             |                (a, b) -> a + b) AS cc
             |  FROM kept k JOIN cvec c USING (label)),
             |qc AS (
             |  SELECT label,
             |    floor(dot::DOUBLE / sqrt(nn::DOUBLE * cc::DOUBLE) * 1000000 + 0.5)::BIGINT
             |      AS cq
             |  FROM mm WHERE nn > 0 AND cc > 0),
             |agg AS (
             |  SELECT label, count(*) AS n_kept,
             |    CAST(sum(cq) AS DOUBLE) / 1000000 / count(*) AS mean_cos_kept,
             |    CAST(min(cq) AS DOUBLE) / 1000000 AS min_cos_kept
             |  FROM qc GROUP BY label)
             |SELECT label, n_before, n_kept, mean_cos_kept, min_cos_kept
             |FROM agg JOIN nb USING (label)
             |ORDER BY label""".stripMargin),
      doc = "pipeline composite: embedding curation funnel — SemDeDup prune then per-label cohesion re-measured on the survivors (n_before/n_kept funnel counts, quantized-exact mean/min cosine)"),

    // T14: hashed linear quality classifier — the fastText-style model
    // filter every modern curation stack applies at scale (CCNet's
    // wiki-vs-crawl classifier, DCLM-Baseline's fastText filter,
    // FineWeb-Edu's educational scorer; all public literature). The
    // trained model ships as PARAMETERS, not code, so the engine-side
    // operator is: hash each token into a bounded feature space, look up
    // the feature's weight, sum, threshold. Here the weight table is a
    // deterministic stand-in (a Knuth-multiplicative map of the feature
    // id onto [-1001, 1001]) — the plumbing, hashing, and exact
    // arithmetic are the operator; swapping in real fastText weights is
    // a broadcast lookup-table change. Scale shape: the weight lies in
    // CLOSED FORM over the feature id, so the whole classifier is ONE
    // map-side projection — zero shuffles, zero joins, whole-stage
    // codegen over builtin higher-order functions; a billion documents
    // classify embarrassingly parallel. Exactness: feature id = first 8
    // hex chars of md5(token) (portable across engines), all weight
    // arithmetic int64; the per-token score double is a single exact
    // long/long division.
    QueryDef(
      "t14_quality_classifier",
      (s, d) =>
        classifierScore(T.documents(s, d))
          .select(col("doc_id"), col("n_toks"), col("logit"), col("score"),
            col("keep_flag"))
          .orderBy(col("doc_id")),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         list_filter(str_split(lower(text), ' '), x -> x <> '') AS ts
             |  FROM documents),
             |l AS (
             |  SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_toks,
             |    list_reduce(
             |      list_prepend(CAST(0 AS BIGINT), list_transform(ts, t ->
             |        ((CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) % 4096)
             |           * 2654435761 + 40503) % 2003 - 1001)),
             |      (a, b) -> a + b) AS logit
             |  FROM t)
             |SELECT doc_id, n_toks, logit,
             |  CASE WHEN n_toks > 0 THEN logit::DOUBLE / n_toks ELSE 0.0 END
             |    AS score,
             |  CASE WHEN logit >= 0 THEN 1 ELSE 0 END AS keep_flag
             |FROM l ORDER BY doc_id""".stripMargin),
      doc = "pipeline/text: hashed linear quality classifier (fastText/DCLM/FineWeb-Edu shape) — md5-bucketed token features, int64 weight lookup in closed form, map-side logit + threshold, zero shuffles"),

    // D14: DSIR data selection (Xie et al. 2023, arXiv:2302.03169,
    // public literature) — importance resampling selects raw-corpus
    // documents whose hashed-feature distribution looks like a TARGET
    // domain: weight(x) = log p_target(x) - log p_raw(x) under two
    // bag-of-ngrams unigram LMs. Target here = the `src0` slice (the
    // stand-in for "formal text"/wikipedia in the paper); candidates =
    // everything else. Exactness: per-token log-probabilities use t11's
    // integer BIT LENGTH surprisal (bits(T div cnt), DuckDB
    // length(bin(·))) with Laplace (+1, +V) smoothing so unseen-in-
    // target tokens stay finite — the score is a pure int64 sum of
    // (bits_raw - bits_target) over token positions, no transcendental
    // ever crosses the oracle boundary. Scale shape: ONE token-keyed
    // shuffle derives BOTH LMs (conditional sums over the same vocab
    // agg), one join back (heavy-hitter tokens are AQE/salting
    // territory, t11's note), one doc-keyed aggregate; the top-k select
    // is Spark's TakeOrderedAndProject — per-partition heaps, never a
    // global sort.
    QueryDef(
      "d14_dsir_select",
      (s, d) => {
        val toks = T.documents(s, d)
          .select(col("doc_id"), col("source"),
            explode(filter(split(lower(col("text")), " "), x => x =!= ""))
              .as("tok"))
        val vocab = toks.groupBy(col("tok")).agg(
          sum(when(col("source") === "src0", 1L).otherwise(0L)).as("cnt_t"),
          sum(when(col("source") =!= "src0", 1L).otherwise(0L)).as("cnt_r"))
        val tot = vocab.agg(sum(col("cnt_t")).as("tt"),
          sum(col("cnt_r")).as("tr"), count(lit(1)).as("v"))
        val delta = vocab.crossJoin(broadcast(tot))
          .withColumn("bits_t",
            length(conv(expr("(tt + v) div (cnt_t + 1)"), 10, 2)).cast("long"))
          .withColumn("bits_r",
            length(conv(expr("(tr + v) div (cnt_r + 1)"), 10, 2)).cast("long"))
          .select(col("tok"), (col("bits_r") - col("bits_t")).as("delta"))
        toks.filter(col("source") =!= "src0")
          .join(delta, Seq("tok"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_toks"), sum(col("delta")).as("score"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(100)
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, source,
             |    unnest(list_filter(str_split(lower(text), ' '), x -> x <> ''))
             |      AS tok
             |  FROM documents),
             |v AS (
             |  SELECT tok,
             |    CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT)
             |      AS cnt_t,
             |    CAST(sum(CASE WHEN source != 'src0' THEN 1 ELSE 0 END) AS BIGINT)
             |      AS cnt_r
             |  FROM toks GROUP BY tok),
             |tot AS (
             |  SELECT CAST(sum(cnt_t) AS BIGINT) AS tt,
             |         CAST(sum(cnt_r) AS BIGINT) AS tr,
             |         CAST(count(*) AS BIGINT) AS v
             |  FROM v),
             |delta AS (
             |  SELECT tok,
             |    CAST(length(bin((tr + v) // (cnt_r + 1))) AS BIGINT)
             |      - CAST(length(bin((tt + v) // (cnt_t + 1))) AS BIGINT)
             |      AS delta
             |  FROM v CROSS JOIN tot)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
             |       CAST(sum(delta) AS BIGINT) AS score
             |FROM toks JOIN delta USING (tok)
             |WHERE source != 'src0'
             |GROUP BY doc_id
             |ORDER BY score DESC, doc_id ASC
             |LIMIT 100""".stripMargin),
      doc = "pipeline/dedup-select: DSIR importance selection — bit-length unigram LM ratio between a target domain (src0) and the raw corpus, Laplace-smoothed exact int64 scores, top-k via per-partition heaps"),

    // X11: RAG indexing + retrieval as ONE declarative plan — the
    // composite a retrieval corpus build runs end-to-end: t8's
    // sliding-window chunking (64/48) → deterministic hashed
    // bag-of-words chunk embeddings (16 exact-int64 dims; a real
    // pipeline swaps in a model encoder at ingest and STORES the
    // vectors — the embedding here is the portable stand-in, md5
    // feature ids + closed-form projection weights, the corpus
    // rehearsal's trick made oracle-expressible) → d7's IVF machinery
    // (deterministic stride-sampled centroids, nearest-list
    // assignment, nprobe=1 probe) → exact-cosine top-3 per query.
    // Queries = the head chunk of each eval-slice doc (doc_id%10==7,
    // d10's held-out convention). Scale shape: chunking + embedding
    // are pure map-side fan-out (zero shuffles, whole-stage codegen
    // higher-order functions — the md5 runs ONCE per token, the 16
    // dims reuse the feature id); assignment is O(N·K) with K CAPPED
    // via the d7 footer-stride rule and centroids broadcast;
    // candidates flow through a list-keyed shuffle join bounded by
    // N/K per list; the per-query top-3 window sees one list's
    // candidates only. Exactness: every dot is BIGINT (coords ≤
    // 64·1001, dots ≤ 6.6e10 ≪ 2^63), cosines are identical doubles
    // (d6's rule), ranks break ties on (cos DESC, doc, chunk).
    QueryDef(
      "x11_rag_retrieval",
      (s, d) => {
        graft.functions.GraftExtensions.registerInto(s)
        // chunk + embed: one scan, zero shuffles. Feature id = md5
        // 32-bit prefix folded to < 1e6+3 so every weight product stays
        // < 2^63 in BOTH engines (DuckDB errors on overflow, Spark
        // wraps — keeping the domain small sidesteps the divergence).
        val chunked = T.documents(s, d)
          .select(col("doc_id"),
            filter(split(lower(col("text")), " "), x => x =!= "").as("ts"))
          .withColumn("n", size(col("ts")).cast("long"))
          .filter(col("n") > 0)
          .withColumn("chunk_idx",
            explode(sequence(lit(0L),
              expr("(greatest(n - 64, 0) + 47) div 48"))))
          .withColumn("ctoks", expr("slice(ts, chunk_idx * 48 + 1, 64)"))
          .withColumn("fids", expr(
            "transform(ctoks, t -> CAST(conv(substr(md5(t), 1, 8), 16, 10) AS BIGINT) % 1000003L)"))
          .withColumn("q", expr(
            """transform(sequence(0, 15), j ->
              |  aggregate(fids, 0L, (acc, f) ->
              |    acc + (f * 2654435761L + j * 97003999L) % 2003L - 1001L))""".stripMargin))
          .withColumn("nn", expr("long_dot(q, q)"))
          .filter(col("nn") > 0)
          .select(col("doc_id"), col("chunk_idx"), col("q"), col("nn"))
        val base = SharedFrame(chunked, "x11_chunks", d)
        val corpus = base.filter(col("doc_id") % 10 =!= 7)
        val queries = base.filter(col("doc_id") % 10 === 7 && col("chunk_idx") === 0)
          .select(col("doc_id").as("qdoc"), col("q").as("qq"), col("nn").as("qn"))
        // K capped exactly like d7: the stride widens beyond the test
        // SFs (footer/2048 < 25 there, so the oracle's literal 25 holds)
        val stride = math.max(25L, T.footerRowCount(s, d, "documents") / 2048L)
        val cents = corpus
          .filter((col("doc_id") * 31 + col("chunk_idx")) % stride === 0)
          .select(col("doc_id").as("c_doc"), col("chunk_idx").as("c_chunk"),
            col("q").as("cq"), col("nn").as("cn"))
        // the N x K assignment is the query's hot loop: long_dot (the
        // codegen kernel, identical BIGINT arithmetic to the builtin
        // fold -- d13's proof) instead of the interpreted HOF chain
        val simToCent =
          expr("long_dot(q, cq)")
            .cast("double") / sqrt(col("nn").cast("double") * col("cn").cast("double"))
        val assigned = corpus.join(broadcast(cents))
          .withColumn("sim", simToCent)
          .groupBy(col("doc_id"), col("chunk_idx"))
          .agg(max_by(struct(col("c_doc"), col("c_chunk")),
            struct(col("sim"), -col("c_doc"), -col("c_chunk"))).as("lst"))
          .select(col("doc_id"), col("chunk_idx"),
            col("lst.c_doc").as("l_doc"), col("lst.c_chunk").as("l_chunk"))
        val listed = base.join(assigned, Seq("doc_id", "chunk_idx"))
        val qSimToCent =
          expr("long_dot(qq, cq)")
            .cast("double") / sqrt(col("qn").cast("double") * col("cn").cast("double"))
        val probes = queries.join(broadcast(cents))
          .withColumn("sim", qSimToCent)
          .groupBy(col("qdoc"))
          .agg(max_by(struct(col("c_doc"), col("c_chunk")),
            struct(col("sim"), -col("c_doc"), -col("c_chunk"))).as("lst"),
            first(col("qq")).as("qq"), first(col("qn")).as("qn"))
          .select(col("qdoc"), col("qq"), col("qn"),
            col("lst.c_doc").as("l_doc"), col("lst.c_chunk").as("l_chunk"))
        probes.join(listed, Seq("l_doc", "l_chunk"))
          .withColumn("dot", expr("long_dot(q, qq)"))
          .withColumn("cos",
            col("dot").cast("double") /
              sqrt(col("qn").cast("double") * col("nn").cast("double")))
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("qdoc"))
              .orderBy(col("cos").desc, col("doc_id"), col("chunk_idx"))))
          .filter(col("rk") <= 3)
          .select(col("qdoc"), col("rk").cast("int").as("rk"),
            col("doc_id").as("r_doc"), col("chunk_idx").as("r_chunk"),
            col("cos"))
          .orderBy(col("qdoc"), col("rk"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         list_filter(str_split(lower(text), ' '), x -> x <> '') AS ts
             |  FROM documents),
             |ch AS (
             |  SELECT doc_id, ci AS chunk_idx,
             |         ts[ci * 48 + 1 : ci * 48 + 64] AS ctoks
             |  FROM (SELECT doc_id, ts, CAST(len(ts) AS BIGINT) AS n,
             |               unnest(range(0, ((greatest(n - 64, 0) + 47) // 48) + 1))
             |                 AS ci
             |        FROM t WHERE len(ts) > 0)),
             |emb AS (
             |  SELECT doc_id, chunk_idx,
             |    [list_reduce(list_prepend(CAST(0 AS BIGINT),
             |       list_transform(ctoks, tk ->
             |         ((CAST('0x' || substr(md5(tk), 1, 8) AS BIGINT) % 1000003)
             |            * 2654435761 + j * 97003999) % 2003 - 1001)),
             |       (a, b) -> a + b)
             |     FOR j IN range(0, 16)] AS q
             |  FROM ch),
             |base AS (
             |  SELECT * FROM (
             |    SELECT doc_id, chunk_idx, q,
             |      list_reduce([q[i] * q[i] FOR i IN range(1, len(q) + 1)],
             |                  (a, b) -> a + b) AS nn
             |    FROM emb) WHERE nn > 0),
             |corpus AS (SELECT * FROM base WHERE doc_id % 10 != 7),
             |queries AS (
             |  SELECT doc_id AS qdoc, q AS qq, nn AS qn
             |  FROM base WHERE doc_id % 10 = 7 AND chunk_idx = 0),
             |cents AS (
             |  SELECT doc_id AS c_doc, chunk_idx AS c_chunk, q AS cq, nn AS cn
             |  FROM corpus WHERE (doc_id * 31 + chunk_idx) % 25 = 0),
             |asim AS (
             |  SELECT v.doc_id, v.chunk_idx, c.c_doc, c.c_chunk,
             |    list_reduce([v.q[i] * c.cq[i] FOR i IN range(1, len(v.q) + 1)],
             |                (a, b) -> a + b)::DOUBLE
             |      / sqrt(v.nn::DOUBLE * c.cn::DOUBLE) AS sim
             |  FROM corpus v CROSS JOIN cents c),
             |assigned AS (
             |  SELECT doc_id, chunk_idx, c_doc AS l_doc, c_chunk AS l_chunk FROM (
             |    SELECT *, row_number() OVER (PARTITION BY doc_id, chunk_idx
             |      ORDER BY sim DESC, c_doc ASC, c_chunk ASC) AS rn
             |    FROM asim) WHERE rn = 1),
             |listed AS (
             |  SELECT b.doc_id, b.chunk_idx, b.q, b.nn, a.l_doc, a.l_chunk
             |  FROM base b JOIN assigned a USING (doc_id, chunk_idx)),
             |qsim AS (
             |  SELECT p.qdoc, p.qq, p.qn, c.c_doc, c.c_chunk,
             |    list_reduce([p.qq[i] * c.cq[i] FOR i IN range(1, len(p.qq) + 1)],
             |                (a, b) -> a + b)::DOUBLE
             |      / sqrt(p.qn::DOUBLE * c.cn::DOUBLE) AS sim
             |  FROM queries p CROSS JOIN cents c),
             |probes AS (
             |  SELECT qdoc, qq, qn, c_doc AS l_doc, c_chunk AS l_chunk FROM (
             |    SELECT *, row_number() OVER (PARTITION BY qdoc
             |      ORDER BY sim DESC, c_doc ASC, c_chunk ASC) AS rn
             |    FROM qsim) WHERE rn = 1),
             |scored AS (
             |  SELECT p.qdoc, l.doc_id AS r_doc, l.chunk_idx AS r_chunk,
             |    list_reduce([l.q[i] * p.qq[i] FOR i IN range(1, len(l.q) + 1)],
             |                (a, b) -> a + b)::DOUBLE
             |      / sqrt(p.qn::DOUBLE * l.nn::DOUBLE) AS cos
             |  FROM probes p
             |  JOIN listed l ON l.l_doc = p.l_doc AND l.l_chunk = p.l_chunk)
             |SELECT qdoc, rk::INT AS rk, r_doc, r_chunk, cos FROM (
             |  SELECT *, row_number() OVER (PARTITION BY qdoc
             |    ORDER BY cos DESC, r_doc ASC, r_chunk ASC) AS rk
             |  FROM scored) WHERE rk <= 3
             |ORDER BY qdoc, rk""".stripMargin),
      doc = "pipeline composite: RAG retrieval — sliding-window chunking, hashed bag-of-words chunk embeddings, IVF centroid assignment (d7's machinery), exact-cosine top-3 per eval-slice query"),

    // D15: BM25 top-k — the lexical-retrieval baseline every RAG/hybrid
    // stack runs next to its dense index (Robertson & Zaragoza 2009,
    // public literature; k1 = 1.2, b = 0.75). Exactness across the
    // oracle boundary: IDF uses t11's integer BIT-LENGTH surprisal
    // (bits(N div df) — floor-log2 resolution, monotone in rarity, zero
    // transcendentals), and the per-term contribution is the exact
    // rational idf·tf·(k1+1)/D rewritten over the common denominator
    //   D = tf + k1(1-b) + k1·b·dl·Nd/L
    //     = (20·L·tf + 6·L + 18·dl·Nd) / (20·L)
    // so contribution = idf·tf·44·L / (20·L·tf + 6·L + 18·dl·Nd) — ONE
    // int64/int64 double division per (term, doc), fixed-pointed at 1e-6
    // BEFORE the per-doc sum (d12's rule: never aggregate raw doubles).
    // Magnitudes: numerators stay < 2^63 up to L ≈ 1e14 corpus tokens;
    // beyond that the same rational moves to grouped decimals. Scale
    // shape (r15): tf and dl are MAP-SIDE per-document facts (sorted-run
    // counting over each doc's own token array — see bm25Scores), so
    // the only term-keyed shuffle left in the index build is the df
    // aggregate; the 1-row (L, Nd) scalar broadcasts, query terms join
    // the postings term-keyed (stop-word-grade hot terms are the
    // documented skew spot — production prunes postings via
    // WAND/block-max; the df-cap conf is that rule here, applied to the
    // term dimension BEFORE the join), and the per-query top-5 is
    // bm25Top5's shared bounded-heap head — on a bounded query side its
    // combiner route keeps the whole score matrix off the shuffle.
    QueryDef(
      "d15_bm25_topk",
      (s, d) =>
        bm25Top5(s, d, None)
          .select(col("qdoc"), col("rk"),
            col("doc_id").as("r_doc"),
            (col("score_q").cast("double") / lit(1000000)).as("bm25"))
          .orderBy(col("qdoc"), col("rk")),
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    unnest(list_filter(str_split(lower(text), ' '), x -> x <> ''))
             |      AS term
             |  FROM documents),
             |train AS (SELECT * FROM toks WHERE doc_id % 10 != 7),
             |tf AS (
             |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             |  FROM train GROUP BY doc_id, term),
             |dl AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
             |  FROM train GROUP BY doc_id),
             |df AS (
             |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
             |tot AS (
             |  SELECT CAST(sum(dl) AS BIGINT) AS big_l,
             |         CAST(count(*) AS BIGINT) AS nd
             |  FROM dl),
             |qterms AS (
             |  SELECT DISTINCT doc_id AS qdoc, term FROM toks WHERE doc_id % 10 = 7),
             |post AS (
             |  SELECT tf.term, tf.doc_id,
             |    CAST(floor(
             |      CAST(CAST(length(bin(nd // df)) AS BIGINT)
             |             * tf * 44 * big_l AS DOUBLE)
             |        / (20 * big_l * tf + 6 * big_l + 18 * dl * nd)
             |      * 1000000 + 0.5) AS BIGINT) AS contrib
             |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term)
             |  CROSS JOIN tot),
             |sc AS (
             |  SELECT q.qdoc, p.doc_id, CAST(sum(p.contrib) AS BIGINT) AS score_q
             |  FROM qterms q JOIN post p USING (term)
             |  GROUP BY q.qdoc, p.doc_id)
             |SELECT qdoc, rk::INT AS rk, doc_id AS r_doc,
             |       score_q::DOUBLE / 1000000 AS bm25
             |FROM (
             |  SELECT *, row_number() OVER (PARTITION BY qdoc
             |    ORDER BY score_q DESC, doc_id ASC) AS rk
             |  FROM sc) WHERE rk <= 5
             |ORDER BY qdoc, rk""".stripMargin),
      doc = "pipeline/retrieval: BM25 top-5 per eval-slice query — bit-length IDF, exact-rational term contributions fixed-pointed before the sum, term-keyed postings join"),

    // D15b: d15 under the hot-term pruning rule, AS AN ORACLE ROW — the
    // RetrievalSpec stability law pins the planted behavior, but this
    // row makes the pruning arithmetic itself hash-checked on real
    // data: postings for terms with df > 0.5·Nd ("appears in over half
    // the corpus" — a sane stop-word rule) are dropped with the same
    // integer-exact cutoff the conf uses (df·1e6 ≤ 500000·Nd), and
    // DuckDB applies the identical inequality, so a boundary-term
    // off-by-one in either engine mismatches. Documents matching ONLY
    // pruned terms drop out of the candidate set — the documented
    // stop-word-only behavior, now oracle-pinned too. At 100 TB this
    // row IS the production shape of d15: the candidate generator's
    // fan-out is Σ qf·df, and the hottest terms carry most of it while
    // discriminating least (idf → bit_length(1)).
    QueryDef(
      "d15b_bm25_pruned",
      (s, d) =>
        bm25Top5(s, d, Some(500000L))
          .select(col("qdoc"), col("rk"),
            col("doc_id").as("r_doc"),
            (col("score_q").cast("double") / lit(1000000)).as("bm25"))
          .orderBy(col("qdoc"), col("rk")),
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    unnest(list_filter(str_split(lower(text), ' '), x -> x <> ''))
             |      AS term
             |  FROM documents),
             |train AS (SELECT * FROM toks WHERE doc_id % 10 != 7),
             |tf AS (
             |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             |  FROM train GROUP BY doc_id, term),
             |dl AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
             |  FROM train GROUP BY doc_id),
             |df AS (
             |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
             |tot AS (
             |  SELECT CAST(sum(dl) AS BIGINT) AS big_l,
             |         CAST(count(*) AS BIGINT) AS nd
             |  FROM dl),
             |qterms AS (
             |  SELECT DISTINCT doc_id AS qdoc, term FROM toks WHERE doc_id % 10 = 7),
             |post AS (
             |  SELECT tf.term, tf.doc_id,
             |    CAST(floor(
             |      CAST(CAST(length(bin(nd // df)) AS BIGINT)
             |             * tf * 44 * big_l AS DOUBLE)
             |        / (20 * big_l * tf + 6 * big_l + 18 * dl * nd)
             |      * 1000000 + 0.5) AS BIGINT) AS contrib
             |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term)
             |  CROSS JOIN tot
             |  WHERE df * 1000000 <= 500000 * nd),
             |sc AS (
             |  SELECT q.qdoc, p.doc_id, CAST(sum(p.contrib) AS BIGINT) AS score_q
             |  FROM qterms q JOIN post p USING (term)
             |  GROUP BY q.qdoc, p.doc_id)
             |SELECT qdoc, rk::INT AS rk, doc_id AS r_doc,
             |       score_q::DOUBLE / 1000000 AS bm25
             |FROM (
             |  SELECT *, row_number() OVER (PARTITION BY qdoc
             |    ORDER BY score_q DESC, doc_id ASC) AS rk
             |  FROM sc) WHERE rk <= 5
             |ORDER BY qdoc, rk""".stripMargin),
      doc = "pipeline/retrieval: d15 under integer-exact hot-term pruning (df > Nd/2 dropped) — the production stop-word posture, oracle-pinned incl. the stop-word-only drop-out behavior"),

    // X12: hybrid retrieval — reciprocal-rank fusion of the lexical
    // (d15 BM25) and dense (hashed doc embedding) rankings, the modern
    // RAG default (Cormack et al. 2009's RRF; every production hybrid
    // search ships this shape). RRF is EXACT here: contribution
    // 1000000 div (60 + rank) is pure integer division (k = 60, the
    // paper's constant), so the fused score is an int64 sum — no
    // float-ordering hazard crosses the oracle boundary. Scale shape:
    // the lexical leg rides d15's SharedFrame'd postings scores; the
    // dense leg broadcasts the BOUNDED query side against the corpus
    // embeddings (d5's brute-force posture — swap in x11's IVF when the
    // query side grows); the full-outer fusion join keys on
    // (qdoc, doc) — both sides are top-5-bounded, ≤ 10 rows per query.
    QueryDef(
      "x12_hybrid_retrieval",
      (s, d) => hybridRetrieval(s, d, None),
      Some(hybridOracleSql(None)),
      doc = "pipeline composite: hybrid retrieval — reciprocal-rank fusion (k=60, integer-exact) of BM25 top-5 (d15's shared postings scores) and dense-cosine top-5 (doc-level hashed embeddings, bounded broadcast query side)"),

    // X12b: x12 with the lexical leg on d15b's PRUNED postings — the
    // production shape of hybrid retrieval at 100 TB. x12's BM25 leg is
    // the suite's steepest honest scaling line (slope 7.3 at 10x: the
    // candidate fan-out is sum of qf*df, and the hottest terms carry
    // most of it while discriminating least); the 500k-doc rehearsal
    // measured the pruned postings leg at 15.8 s vs 50.2 s unpruned
    // (-77% candidates). The df > Nd/2 cutoff is the same integer-exact
    // inequality d15b pins (df*1e6 <= 500000*nd on BOTH engines), so the
    // fused ranking is hash-checked end-to-end, including documents
    // whose lexical evidence was stop-word-only (they keep their dense
    // rank, lex_rk reads 0 - fusion semantics under pruning, now
    // oracle-pinned). x12 keeps the CONF-DEFAULT (unpruned unless the
    // session sets graft.bm25.maxDfFrac — d15's documented conf, which
    // changes results wherever it applies) semantics as the exactness
    // anchor - the d15/d15b precedent applied to the composite.
    QueryDef(
      "x12b_hybrid_pruned",
      (s, d) => hybridRetrieval(s, d, Some(500000L)),
      Some(hybridOracleSql(Some(500000L))),
      doc = "pipeline composite: hybrid retrieval on d15b's df-capped postings (df > Nd/2 pruned, integer-exact cutoff) - RRF fusion of pruned-BM25 top-5 and dense-cosine top-5; the production posture of x12"),

    // X12c: hybrid retrieval with the IVF dense leg — the last measured
    // super-linear line in the suite wired as a dispatchable strategy
    // instead of a hand-assembled rewrite (r11 verdict #1). x12's 30×
    // crossover (scaling_x12_out.json) showed the exact dense leg —
    // whose BOTH sides scale with the corpus — dominating growth
    // (127.2 s, vs 109.4 s pruned) while x15's IVF shape read 57.0 s on
    // the identical corpus; x12c is that swap INSIDE hybridRetrieval:
    // d15b's pruned postings (x12b's lexical leg, unchanged) fused with
    // d7's inverted-file dense leg (stride-sampled centroids, 2-probe,
    // exact cosine within the probed lists). Oracle-exact like d7: the
    // centroids are deterministic, assignment/probe tiebreaks are
    // (sim DESC, cid ASC) on identical doubles from exact int64 dots,
    // so DuckDB re-derives the whole index. Recall is bounded (misses
    // outside probed lists), which RRF absorbs by design — a doc's
    // missing dense evidence reads dense_rk = 0, exactly like x12b's
    // stop-word-only docs on the lexical side.
    QueryDef(
      "x12c_hybrid_ivf",
      (s, d) => hybridRetrieval(s, d, Some(500000L), denseLeg = "ivf"),
      Some(hybridOracleSql(Some(500000L), denseLeg = "ivf")),
      doc = "pipeline composite: hybrid retrieval with d7's IVF dense leg (deterministic stride centroids, 2-probe, exact cosine inside lists) over d15b's pruned postings - the measured scale path for x12's dense growth term, as a strategy parameter"),

    // X12d: the retrieval family's decision RULE as an executable
    // dispatch (r12 wrote it as prose in COVERAGE.md; the d4
    // jaccardPairsAuto precedent applied to retrieval): pick the dense
    // leg from the two numbers the rule already uses — the corpus
    // footer count and the definitional query-side fraction — and run
    // x12b's production posture (pruned lexical leg) with it. Zero
    // Spark jobs at plan build (footer metadata only); on every test
    // corpus the product sits far under the boundary so the route
    // deterministically resolves to the exact leg and the oracle is
    // x12b's, which is exactly the property the oracle row pins (a
    // mis-route to IVF would hash-mismatch wherever recall drops);
    // RetrievalSpec pins the other side of the boundary by conf.
    QueryDef(
      "x12d_hybrid_auto",
      (s, d) => hybridRetrieval(s, d, Some(500000L),
        denseLeg = denseLegAuto(s, d)),
      Some(hybridOracleSql(Some(500000L))),
      doc = "pipeline composite: hybrid retrieval with the dense leg chosen by COVERAGE.md's measured decision rule (exact at/below graft.x12.maxExactDensePairs ~ |queries|x|corpus| pairs; IVF above; IVF-PQ once corpus vector bytes exceed graft.x12.maxIvfVectorBytes) from parquet-footer cardinalities - zero plan-build jobs, deterministic per snapshot+conf"),

    // X12e: the decision rule's THIRD leg as an oracled row (r14 —
    // COVERAGE.md's "when vectors no longer fit, move the dense leg to
    // x15's IVF-PQ machinery", now executable): x12b's pruned lexical
    // leg fused with x15's IVF-PQ dense leg — d7's 2-probe candidate
    // generation unchanged, candidates scored by d16's asymmetric
    // distance over 4×4-dim PQ codes instead of exact cosine. The whole
    // index (coarse centroids, lists, probes, subspace codebooks, codes,
    // per-query ADC tables) is re-derived in DuckDB, so the oracle pins
    // every tiebreak in the twice-approximate leg exactly (assignment
    // (sim DESC, cid ASC); encoding (dist ASC, pcid ASC); ranking
    // (ADC ASC, doc_id ASC)) — the recall contract is structural:
    // misses (outside probed lists OR ADC-reordered) read dense_rk = 0
    // in the fusion, x12b's stop-word precedent on the dense side.
    // ORACLE COVERAGE LIMIT (r15, enforced by OracleWindows/Verify):
    // the SQL's stride literals only match the footer rules below
    // 13,056 documents (PQ codebook stride) / 208,896 (coarse stride)
    // — past either boundary the Spark plan stays correct but the
    // oracle text stops covering it, and Verify fails the row loudly
    // instead of hash-mismatching.
    QueryDef(
      "x12e_hybrid_ivfpq",
      (s, d) => hybridRetrieval(s, d, Some(500000L), denseLeg = "pq"),
      Some(hybridOracleSql(Some(500000L), denseLeg = "pq")),
      doc = "pipeline composite: hybrid retrieval with the IVF-PQ dense leg (d7's 2-probe lists + d16's int64 ADC over 4-subspace PQ codes) over d15b's pruned postings - the RAM-residency leg denseLegAuto routes to past graft.x12.maxIvfVectorBytes; the full index re-derived in DuckDB"),

    // D16: product-quantization ANN with asymmetric-distance scoring
    // (Jégou et al. 2011, public literature) — the MEMORY side of the
    // ANN family: d6 buckets (hyperplane LSH), d7 prunes candidates
    // (IVF), PQ COMPRESSES the vectors themselves. The 32-dim vector
    // splits into m = 4 subspaces of 8 dims; each subvector is encoded
    // as the id of its nearest subspace centroid (codebooks =
    // deterministic stride-sampled subvectors, d7's sampling applied
    // per subspace; production trains k-means offline), so the stored
    // corpus is 4 small ints per vector — 32x smaller than the floats,
    // THE enabler for RAM-resident billion-vector search. Queries score
    // candidates by ADC: distance(query, vector) ≈ Σ_b
    // dist(query_sub_b, codebook_b[code_b]) — the per-query lookup
    // table is m×K integers, broadcast. Exactness: EVERYTHING is int64
    // (quantized coords, squared L2 distances, ADC sums) — no doubles
    // cross the oracle boundary at all, the family's strongest
    // exactness case. Scale shape: encoding is O(N·K) with broadcast
    // codebooks; the ADC join fans codes × bounded queries and the
    // per-query top-5 window sees candidates only (d5's bounded-query
    // posture; compose with d7's lists for the IVF+PQ production
    // pairing).
    QueryDef(
      "d16_pq_adc",
      (s, d) => {
        val base = SharedFrame(
          T.embeddings(s, d).select(col("vec_id"),
            expr("transform(embedding, x -> CAST(floor(x * 1000 + 0.5) AS BIGINT))")
              .as("q"))
            .withColumn("nn",
              expr("aggregate(zip_with(q, q, (a, b) -> a * b), 0L, (acc, x) -> acc + x)")),
          "d7_base", d)
        // PQ codebook cap (r14, the x12e rule applied family-wide):
        // ≤ 256 codewords per subspace — 8-bit-code geometry (Jégou et
        // al.'s k*) — because the encode join is O(N·K) per subspace
        // and a footer-scaled K is a scale term, not accuracy (an
        // 8-bit code cannot address more than 256 entries anyway).
        // Below 12,800 vectors (footer/256 < 50) this floors at the
        // same stride 50 the DuckDB oracle hardcodes, so every test-SF
        // result is unchanged.
        val pqStride = math.max(50L,
          T.footerRowCount(s, d, "embeddings") / 256L)
        // subspace explode: (vec_id, b, s) with s = dims [b*8+1, b*8+8]
        val subs = base.select(col("vec_id"),
          posexplode(expr(
            "transform(sequence(0, 3), b -> slice(q, b * 8 + 1, 8))"))
            .as(Seq("b", "s")))
        val cents = subs.filter(col("vec_id") % pqStride === 0)
          .select(col("b"), col("vec_id").as("cid"), col("s").as("cs"))
        val sqDist =
          expr("aggregate(zip_with(s, cs, (a, c) -> (a - c) * (a - c)), 0L, (acc, x) -> acc + x)")
        // encode: nearest subspace centroid per (vector, subspace)
        val codes = subs.filter(col("vec_id") >= 10)
          .join(broadcast(cents), Seq("b"))
          .withColumn("dist", sqDist)
          .groupBy(col("vec_id"), col("b"))
          .agg(min_by(col("cid"), struct(col("dist"), col("cid"))).as("cid"))
        // per-query ADC lookup table: distance to every codebook entry
        val adc = subs.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("b"), col("s"))
          .join(broadcast(cents), Seq("b"))
          .withColumn("qdist", sqDist)
          .select(col("qid"), col("b"), col("cid"), col("qdist"))
        codes.join(broadcast(adc), Seq("b", "cid"))
          .groupBy(col("qid"), col("vec_id"))
          .agg(sum(col("qdist")).as("adist"))
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
              .orderBy(col("adist"), col("vec_id"))))
          .filter(col("rk") <= 5)
          .select(col("qid"), col("rk").cast("int").as("rk"),
            col("vec_id").as("eid"), col("adist"))
          .orderBy(col("qid"), col("rk"))
      },
      Some("""WITH base AS (
             |  SELECT vec_id,
             |         [floor((embedding[i] * 1000)::DOUBLE + 0.5)::BIGINT
             |          FOR i IN range(1, len(embedding) + 1)] AS q
             |  FROM embeddings),
             |subs AS (
             |  SELECT vec_id, b, q[b * 8 + 1 : b * 8 + 8] AS s
             |  FROM base, (SELECT unnest(range(0, 4)) AS b)),
             |cents AS (
             |  SELECT b, vec_id AS cid, s AS cs FROM subs WHERE vec_id % 50 = 0),
             |enc AS (
             |  SELECT vec_id, b, cid FROM (
             |    SELECT v.vec_id, v.b, c.cid,
             |      row_number() OVER (PARTITION BY v.vec_id, v.b ORDER BY
             |        list_reduce([(v.s[i] - c.cs[i]) * (v.s[i] - c.cs[i])
             |                     FOR i IN range(1, len(v.s) + 1)],
             |                    (a, x) -> a + x) ASC, c.cid ASC) AS rn
             |    FROM subs v JOIN cents c USING (b)
             |    WHERE v.vec_id >= 10) WHERE rn = 1),
             |adc AS (
             |  SELECT v.vec_id AS qid, v.b, c.cid,
             |    list_reduce([(v.s[i] - c.cs[i]) * (v.s[i] - c.cs[i])
             |                 FOR i IN range(1, len(v.s) + 1)],
             |                (a, x) -> a + x) AS qdist
             |  FROM subs v JOIN cents c USING (b)
             |  WHERE v.vec_id < 10),
             |scored AS (
             |  SELECT a.qid, e.vec_id, CAST(sum(a.qdist) AS BIGINT) AS adist
             |  FROM enc e JOIN adc a ON a.b = e.b AND a.cid = e.cid
             |  GROUP BY a.qid, e.vec_id)
             |SELECT qid, rk::INT AS rk, vec_id AS eid, adist FROM (
             |  SELECT *, row_number() OVER (PARTITION BY qid
             |    ORDER BY adist ASC, vec_id ASC) AS rk
             |  FROM scored) WHERE rk <= 5
             |ORDER BY qid, rk""".stripMargin),
      doc = "similarity/ann: product quantization + asymmetric-distance top-5 — 4x8-dim subspace codebooks (stride-sampled), int64-only encoding and ADC sums, broadcast per-query lookup tables"),

    // T15: corpus-wide line-level deduplication WITH document
    // reconstruction — C4's "deduplicate by line across the corpus"
    // step (Raffel et al. 2020 §2.2, public literature): every line
    // keeps exactly its FIRST occurrence ((doc_id, line_idx) order);
    // later occurrences are cut out of their documents, and each doc's
    // text is rebuilt from its surviving lines in original order (docs
    // that lose every line drop out). This is the family's only
    // RECONSTRUCTION-shaped op — d9 detects duplicated spans, t15
    // removes them and re-materializes the corpus. Scale shape: one
    // digest-keyed shuffle (8-byte md5-prefix digests ride the shuffle,
    // never line text — d9's discipline, the digest joins the text back
    // only inside the per-doc rebuild which is doc-keyed), one
    // doc-keyed collect for the rebuild. The boilerplate line every
    // crawl shares is a HOT digest — d9b's documented skew spot
    // (saltable; the keep-first window is a count-like aggregate).
    // The sf corpus is single-line, so exact-duplicate documents
    // collide on their one line and the LATER doc drops entirely —
    // the oracle exercises the drop path on real data; multi-line
    // reconstruction order is the planted spec's job (t7's precedent).
    QueryDef(
      "t15_line_dedup",
      (s, d) => {
        val W = org.apache.spark.sql.expressions.Window
        val lines = T.documents(s, d)
          .select(col("doc_id"), posexplode(split(col("text"), "\n"))
            .as(Seq("idx", "line")))
          .filter(col("line") =!= "")
        val kept = lines
          .withColumn("h", substring(md5(col("line")), 1, 16))
          .withColumn("rn", row_number().over(
            W.partitionBy(col("h")).orderBy(col("doc_id"), col("idx"))))
          .filter(col("rn") === 1)
        val rebuilt = kept
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_kept"),
            expr("array_join(transform(array_sort(collect_list(struct(idx, line))), x -> x.line), '\n')")
              .as("text_clean"))
        lines.groupBy(col("doc_id")).agg(count(lit(1)).as("n_lines"))
          .join(rebuilt, Seq("doc_id"), "inner")
          .select(col("doc_id"), col("n_lines"), col("n_kept"),
            col("text_clean"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH ls AS (
             |  SELECT doc_id, i - 1 AS idx, l[i] AS line
             |  FROM (SELECT doc_id, str_split(text, chr(10)) AS l,
             |               unnest(range(1, len(str_split(text, chr(10))) + 1))
             |                 AS i
             |        FROM documents)
             |  WHERE l[i] <> ''),
             |kept AS (
             |  SELECT doc_id, idx, line FROM (
             |    SELECT doc_id, idx, line,
             |      row_number() OVER (PARTITION BY substr(md5(line), 1, 16)
             |        ORDER BY doc_id, idx) AS rn
             |    FROM ls) WHERE rn = 1),
             |rb AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             |         string_agg(line, chr(10) ORDER BY idx) AS text_clean
             |  FROM kept GROUP BY doc_id),
             |nl AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines
             |  FROM ls GROUP BY doc_id)
             |SELECT doc_id, n_lines, n_kept, text_clean
             |FROM nl JOIN rb USING (doc_id)
             |ORDER BY doc_id""".stripMargin),
      doc = "pipeline/text: C4-style corpus-wide line dedup with document reconstruction — keep-first by (doc, idx), digest-keyed shuffle, order-preserving rebuild, all-lines-lost docs dropped"),

    // X13: gate-agreement matrix — the read a curator does before
    // STACKING filters: the three quality-gate families (t2's weighted
    // heuristic at the x6 threshold, t12's Gopher rule table, t14's
    // hashed linear classifier) evaluated per document in ONE pass,
    // rolled up into the 2^3 agreement cells with doc and token counts.
    // The off-diagonal cells are the decision data: docs the heuristic
    // keeps but the model drops (and vice versa) are exactly what a
    // threshold-tuning session inspects, and the cell sizes say whether
    // adding a gate to the stack removes anything the others don't.
    // Scale shape: all three gates are stateless per-row projections
    // (classifierScore/gopherFlags chain as withColumns), so the whole
    // matrix is ONE scan + an 8-group aggregate — zero joins, zero
    // wide shuffles, whole-stage codegen end to end.
    QueryDef(
      "x13_gate_agreement",
      (s, d) => {
        val toks = filter(split(col("text"), " "), x => x =!= "")
        val nToks = size(toks)
        val nChars = length(col("text"))
        val stop = size(array_intersect(array_distinct(toks),
          array(Seq("the", "a", "of", "and", "is", "table", "row").map(lit): _*)))
        val meanLen = when(nToks > 0,
          (nChars - (nToks - 1)).cast("double") / nToks).otherwise(0.0)
        val stopR = when(nToks > 0, stop.cast("double") / nToks).otherwise(0.0)
        val quality = when(nToks >= 5, 1.0).otherwise(0.0) * 0.4 +
          when(meanLen.between(3.0, 10.0), 1.0).otherwise(0.0) * 0.3 +
          when(stopR > 0, 1.0).otherwise(0.0) * 0.3
        gopherFlags(classifierScore(T.documents(s, d)))
          .withColumn("f_heur", when(quality >= 0.7, 1).otherwise(0))
          .select(col("doc_id"), col("n_toks"), col("f_heur"),
            col("pass").as("f_rules"), col("keep_flag").as("f_model"))
          .groupBy(col("f_heur"), col("f_rules"), col("f_model"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
          .orderBy(col("f_heur"), col("f_rules"), col("f_model"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, text,
             |    list_filter(str_split(text, ' '), x -> x <> '') AS toks,
             |    str_split(text, chr(10)) AS lines
             |  FROM documents),
             |heur AS (
             |  SELECT doc_id,
             |    CASE WHEN
             |      CASE WHEN len(toks) >= 5 THEN 1.0 ELSE 0.0 END * 0.4 +
             |      CASE WHEN (CASE WHEN len(toks) > 0
             |                 THEN CAST(length(text) - (len(toks) - 1) AS DOUBLE)
             |                        / len(toks)
             |                 ELSE 0.0 END) BETWEEN 3.0 AND 10.0
             |           THEN 1.0 ELSE 0.0 END * 0.3 +
             |      CASE WHEN len(list_intersect(list_distinct(toks),
             |             ['the','a','of','and','is','table','row'])) > 0
             |           THEN 1.0 ELSE 0.0 END * 0.3 >= 0.7
             |    THEN 1 ELSE 0 END AS f_heur
             |  FROM t),
             |gm AS (
             |  SELECT doc_id,
             |    len(toks) AS n_words,
             |    len(lines) AS n_lines,
             |    CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0)
             |         AS BIGINT) AS wchars,
             |    len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]')))
             |      AS alpha_words,
             |    (length(text) - length(replace(text, '#', ''))) +
             |      (length(text) - length(replace(text, '...', ''))) // 3 AS n_sym,
             |    len(list_filter(lines, l -> l[1:2] = '- ' OR l[1:2] = '* '))
             |      AS bullet_lines,
             |    len(list_filter(lines, l -> l[-3:] = '...')) AS ellipsis_lines,
             |    len(list_intersect(list_distinct(toks),
             |        ['the','be','to','of','and','that','have','with'])) AS n_stop
             |  FROM t),
             |rules AS (
             |  SELECT doc_id,
             |    (CASE WHEN n_words BETWEEN 20 AND 100000 THEN 1 ELSE 0 END) *
             |    (CASE WHEN n_words > 0 AND wchars >= n_words * 3
             |               AND wchars <= n_words * 10 THEN 1 ELSE 0 END) *
             |    (CASE WHEN n_sym * 10 <= n_words THEN 1 ELSE 0 END) *
             |    (CASE WHEN bullet_lines * 10 <= n_lines * 9 THEN 1 ELSE 0 END) *
             |    (CASE WHEN ellipsis_lines * 10 <= n_lines * 3 THEN 1 ELSE 0 END) *
             |    (CASE WHEN alpha_words * 5 >= n_words * 4 THEN 1 ELSE 0 END) *
             |    (CASE WHEN n_stop >= 1 THEN 1 ELSE 0 END) AS f_rules
             |  FROM gm),
             |model AS (
             |  SELECT doc_id, CAST(len(lts) AS BIGINT) AS n_toks,
             |    CASE WHEN list_reduce(
             |      list_prepend(CAST(0 AS BIGINT), list_transform(lts, tk ->
             |        ((CAST('0x' || substr(md5(tk), 1, 8) AS BIGINT) % 4096)
             |           * 2654435761 + 40503) % 2003 - 1001)),
             |      (a, b) -> a + b) >= 0 THEN 1 ELSE 0 END AS f_model
             |  FROM (SELECT doc_id,
             |          list_filter(str_split(lower(text), ' '), x -> x <> '')
             |            AS lts
             |        FROM documents))
             |SELECT f_heur, f_rules, f_model,
             |       CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(n_toks) AS BIGINT) AS n_tokens
             |FROM heur JOIN rules USING (doc_id) JOIN model USING (doc_id)
             |GROUP BY f_heur, f_rules, f_model
             |ORDER BY f_heur, f_rules, f_model""".stripMargin),
      doc = "pipeline composite: quality-gate agreement matrix — heuristic (t2), rule-table (t12), and model (t14) gates in ONE scan, rolled into the 2^3 cells with doc/token counts; the filter-stacking decision read"),

    // D17: HyperLogLog cardinality sketch — per-language distinct-token
    // estimation (Flajolet et al. 2007), the OLAP engine's canonical
    // approximate-distinct operator (Spark's own approx_count_distinct is
    // the same sketch; re-derived here so the oracle can pin every
    // register). m = 64 registers; token → 60-bit md5 hash → bucket
    // j = h mod 64, rank ρ = leading-zero count of the remaining 54 bits
    // + 1; register = max ρ per bucket. The harmonic mean is kept EXACT:
    // Σ 2^(54−M_j) as an int64 (2^54 scale: 64 empty buckets sum to
    // 1.15e18 < 2^63; ranks above 54 — probability 2^-55 — floor to 0),
    // so the only double is the final α·m²·2^54/S both engines evaluate
    // from identical integers. The exact countDistinct rides along as
    // the oracle-visible accuracy proof — it is precisely the
    // (lang, tok)-shuffling aggregate the sketch REPLACES at scale: the
    // register aggregate is map-side combinable (≤ 64 rows per language
    // per partition cross the wire, independent of corpus size), the
    // classic sketch-mergeability argument. Raw estimator only — HLL's
    // linear-counting small-range correction needs ln(), the
    // transcendental the oracle can't pin (t11's reasoning; the m=64
    // raw estimate is the interesting branch at corpus scale anyway).
    QueryDef(
      "d17_hll_cardinality",
      (s, d) => {
        val toks = T.documents(s, d)
          .select(col("lang"),
            explode(filter(split(lower(col("text")), " "), x => x =!= ""))
              .as("tok"))
        val hashed = toks
          .withColumn("h",
            expr("CAST(conv(substr(md5(tok), 1, 15), 16, 10) AS BIGINT)"))
          .withColumn("j", Hll.jExpr())
          .withColumn("rho", Hll.rhoExpr())
        val regs = hashed.groupBy(col("lang"), col("j"))
          .agg(max(col("rho")).as("reg"))
        val exact = toks.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_tokens"),
            countDistinct(col("tok")).as("n_distinct_exact"))
        val grid = exact.select(col("lang"))
          .crossJoin(broadcast(s.range(0, 64).toDF("j")))
        val agg = grid
          .join(regs, Seq("lang", "j"), "left")
          .withColumn("reg", coalesce(col("reg"), lit(0L)))
          .groupBy(col("lang"))
          .agg(sum(when(col("reg") === 0, 1L).otherwise(0L)).as("v_zero"),
            sum(Hll.termExpr()).as("s_scaled"))
        exact.join(agg, Seq("lang"))
          .withColumn("hll_est", Hll.estExpr())
          .select(col("lang"), col("n_tokens"), col("n_distinct_exact"),
            col("v_zero"), col("s_scaled"), col("hll_est"))
          .orderBy(col("lang"))
      },
      Some("""WITH toks AS (
             |  SELECT lang,
             |    unnest(list_filter(str_split(lower(text), ' '), x -> x <> '')) AS tok
             |  FROM documents),
             |h AS (
             |  SELECT lang, tok,
             |    CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS hv
             |  FROM toks),
             |r AS (
             |  SELECT lang, hv % 64 AS j,
             |    CASE WHEN hv // 64 = 0 THEN 55
             |         ELSE 55 - length(bin(hv // 64)) END AS rho
             |  FROM h),
             |regs AS (SELECT lang, j, max(rho) AS reg FROM r GROUP BY lang, j),
             |ex AS (
             |  SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
             |    CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct_exact
             |  FROM toks GROUP BY lang),
             |grid AS (
             |  SELECT lang, j FROM ex
             |  CROSS JOIN (SELECT unnest(range(0, 64)) AS j)),
             |fullr AS (
             |  SELECT g.lang, coalesce(regs.reg, 0) AS reg
             |  FROM grid g LEFT JOIN regs ON g.lang = regs.lang AND g.j = regs.j),
             |agg AS (
             |  SELECT lang,
             |    CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero,
             |    CAST(sum(CASE WHEN reg <= 54
             |              THEN CAST(1 AS BIGINT) << CAST(54 - reg AS INT)
             |              ELSE 0 END) AS BIGINT) AS s_scaled
             |  FROM fullr GROUP BY lang)
             |SELECT lang, n_tokens, n_distinct_exact, v_zero, s_scaled,
             |  0.709 * 4096 * CAST(18014398509481984 AS DOUBLE) / s_scaled AS hll_est
             |FROM ex JOIN agg USING (lang) ORDER BY lang""".stripMargin),
      doc = "sketch/HyperLogLog distinct-cardinality registers per language — exact-int64 harmonic sum, map-side-mergeable ≤64-row aggregate vs the (lang,tok) shuffle it replaces"),

    // T16: interpolated bigram-LM surprisal — the KenLM-shaped upgrade of
    // t11's unigram scorer (CCNet buckets corpora by LM perplexity; a
    // bigram model with unigram backoff is the smallest model that sees
    // word ORDER). p(w2|w1) = 0.7·c(w1w2)/c(w1) + 0.3·c(w2)/T as ONE
    // exact rational — num = 7·c12·T + 3·c2·c1, den = 10·c1·T (int64:
    // T ≤ ~10^6 tokens at bench scale keeps den ≤ 10^13; a 100 TB corpus
    // shards the LM and moves to log-space) — and the surprisal is
    // t11's engine-portable integer bit length of den/num. Histories
    // c(w1) are bigram-start sums (so Σ p over the vocab is honest),
    // backoff c(w2)/T is the unigram LM over ALL tokens. Scale shape:
    // two token-keyed shuffles build the two LMs (c12 keyed (w1,w2),
    // vocab keyed tok), the occurrence join carries 8-byte-ish word keys
    // with the stop-word skew spot documented at d9b, and the final
    // aggregate is doc-keyed. No FP crosses the oracle.
    QueryDef(
      "t16_bigram_surprisal",
      (s, d) => {
        val ts = filter(split(lower(col("text")), " "), x => x =!= "")
        val base = T.documents(s, d).select(col("doc_id"), ts.as("ts"))
        val toks = base.select(explode(col("ts")).as("tok"))
        val bgs = base.filter(size(col("ts")) >= 2)
          .select(col("doc_id"),
            explode(expr(
              "transform(sequence(1, size(ts) - 1), i -> struct(ts[i-1] AS w1, ts[i] AS w2))"))
              .as("bg"))
          .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        val c12 = bgs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
        val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
        val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c2"))
        val tot = toks.agg(count(lit(1)).as("t_total"))
        bgs
          .join(c12, Seq("w1", "w2"))
          .join(c1, Seq("w1"))
          .join(vocab, col("w2") === col("tok"))
          .crossJoin(broadcast(tot))
          .withColumn("bits",
            length(conv(
              expr("(10 * c1 * t_total) div (7 * c12 * t_total + 3 * c2 * c1)"),
              10, 2)).cast("long"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"), sum(col("bits")).as("bits_sum"))
          .withColumn("mean_bits",
            col("bits_sum").cast("double") / col("n_bigrams"))
          .withColumn("band",
            when(col("mean_bits") < 9, "head")
              .when(col("mean_bits") < 13, "middle").otherwise("tail"))
          .select(col("doc_id"), col("n_bigrams"), col("bits_sum"),
            col("mean_bits"), col("band"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH base AS (
             |  SELECT doc_id,
             |    list_filter(str_split(lower(text), ' '), x -> x <> '') AS ts
             |  FROM documents),
             |toks AS (SELECT unnest(ts) AS tok FROM base),
             |bg AS (
             |  SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
             |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i
             |        FROM base WHERE len(ts) >= 2)),
             |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
             |        FROM bg GROUP BY w1, w2),
             |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1
             |       FROM c12 GROUP BY w1),
             |v AS (SELECT tok, CAST(count(*) AS BIGINT) AS c2
             |      FROM toks GROUP BY tok),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS t_total FROM toks),
             |b AS (
             |  SELECT doc_id,
             |    length(bin((10 * c1 * t_total)
             |               // (7 * c12 * t_total + 3 * c2 * c1))) AS bits
             |  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
             |       JOIN v ON v.tok = bg.w2 CROSS JOIN tot)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             |  CAST(sum(bits) AS BIGINT) AS bits_sum,
             |  CAST(sum(bits) AS DOUBLE) / count(*) AS mean_bits,
             |  CASE WHEN CAST(sum(bits) AS DOUBLE) / count(*) < 9 THEN 'head'
             |       WHEN CAST(sum(bits) AS DOUBLE) / count(*) < 13 THEN 'middle'
             |       ELSE 'tail' END AS band
             |FROM b GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      doc = "pipeline/text: interpolated bigram-LM surprisal (KenLM-shaped CCNet scorer) — exact single-rational interpolation, integer bit-length surprisal, word-order-aware upgrade of t11"),

    // D18: content-defined chunking dedup — the storage-layer dedup
    // family (Rabin/LBFS, FastCDC): chunk boundaries come from the DATA
    // (positions where the w=8 sliding-window rolling hash ≡ 0 mod 64),
    // so an insertion early in a document shifts only the chunk it lands
    // in — fixed-size blocks would shift every later block, which is
    // exactly why dedup storage and training-corpus delta-compression
    // use CDC. window_hashes is the O(n) codegen kernel (one pass,
    // circular buffer — the builtin chain would re-hash w chars per
    // position); everything downstream is builtins: cut positions →
    // span arithmetic → substring chunks → 60-bit digests. Keep-first
    // canonicalization over the digest-keyed shuffle (chunks themselves
    // never ride it — only doc_id/start/len/digest move); hot digests
    // (boilerplate chunks) are d9b's documented skew spot. Basic CDC
    // rule only here; FastCDC's min/max chunk bounds (boundary i
    // depends on boundary i-1 — per-document sequential) are d18b's
    // aggregate-fold refinement below.
    //
    // Position spaces (ADVICE r8): cut positions use the kernel's own
    // codepoint rule (total on malformed UTF-8 — orphaned bytes count
    // one codepoint each), while n = length(text) and the substring()
    // slicing use Spark's char semantics. The two AGREE on well-formed
    // UTF-8 — the only regime where "chunk at codepoint p" is a
    // meaningful claim at all — and both stay total and deterministic
    // on dirty bytes, where spans may land on different byte offsets
    // than the kernel's coordinates (same rows every run, so dedup
    // accounting and the oracle are unaffected; only the spans'
    // byte-level interpretation degrades). Holds for d18b too.
    QueryDef(
      "d18_cdc_chunks",
      (s, d) => {
        val W = org.apache.spark.sql.expressions.Window
        val chunks = cdcChunks(T.documents(s, d))
        chunks
          .withColumn("rn", row_number().over(
            W.partitionBy(col("dg")).orderBy(col("doc_id"), col("start"))))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_chunks"),
            sum(when(col("rn") > 1, 1L).otherwise(0L)).as("dup_chunks"),
            sum(when(col("rn") > 1, col("clen")).otherwise(0L)).as("dup_chars"))
          .select(col("doc_id"), col("n_chunks"), col("dup_chunks"),
            col("dup_chars"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH c AS (
             |  SELECT doc_id, text, length(text) AS n,
             |    [CAST(unicode(ch) AS BIGINT) FOR ch IN split(text, '')] AS cps
             |  FROM documents WHERE length(text) > 0),
             |wh AS (
             |  SELECT doc_id, text, n,
             |    [CAST(i AS BIGINT) FOR i IN range(8, n + 1)
             |       IF list_reduce(list_prepend(CAST(0 AS BIGINT), cps[i-7:i]),
             |            (a, cc) -> (a * 31 + cc) % 1000000007) % 64 = 0
             |          AND i < n] AS cuts
             |  FROM c),
             |sp AS (
             |  SELECT doc_id, text,
             |    list_prepend(CAST(1 AS BIGINT),
             |                 list_transform(cuts, p -> p + 1)) AS starts,
             |    list_append(cuts, CAST(n AS BIGINT)) AS ends
             |  FROM wh),
             |ch AS (
             |  SELECT doc_id, i AS chunk_idx, starts[i] AS start,
             |    ends[i] - starts[i] + 1 AS clen,
             |    CAST('0x' || substr(md5(substring(text, CAST(starts[i] AS INT),
             |           CAST(ends[i] - starts[i] + 1 AS INT))), 1, 15) AS BIGINT) AS dg
             |  FROM (SELECT doc_id, text, starts, ends,
             |          unnest(range(1, len(starts) + 1)) AS i
             |        FROM sp)),
             |r AS (
             |  SELECT doc_id, clen,
             |    row_number() OVER (PARTITION BY dg ORDER BY doc_id, start) AS rn
             |  FROM ch)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
             |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
             |  CAST(sum(CASE WHEN rn > 1 THEN clen ELSE 0 END) AS BIGINT) AS dup_chars
             |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      doc = "dedup/content-defined chunking (Rabin/LBFS family) — data-derived chunk boundaries via the O(n) window_hashes kernel, digest-keyed keep-first dedup, per-doc bytes-saved accounting"),

    // D18b: FastCDC min/max chunk bounds over d18's candidate rule — the
    // production refinement every deployed CDC family ships (FastCDC,
    // Xia et al., USENIX ATC'16): candidates closer than MIN to the
    // previous boundary are skipped, and a gap longer than MAX forces a
    // cut at prev+MAX, so chunk sizes land in [MIN, MAX] (the final
    // chunk may undershoot MIN). Boundary i depends on boundary i-1 —
    // a per-DOCUMENT sequential recurrence, which is exactly the right
    // amount of sequential for Spark: documents are the unit of
    // parallelism, so the whole recurrence runs inside one map-side
    // `aggregate` fold over the candidate array (struct accumulator =
    // emitted cuts + last boundary; forced cuts between candidates are
    // counted arithmetically, k = (gap-1) div MAX, so the fold stays
    // O(#candidates + #forced)). Everything downstream — explode, chunk
    // digests, keep-first dedup over the dg shuffle — is d18's shape;
    // text never rides the shuffle. min/max chunk lengths ride the
    // output so the oracle checks the bounds law itself, not just the
    // dedup accounting. Oracle = DuckDB recursive CTE stepping the same
    // recurrence one boundary per iteration.
    QueryDef(
      "d18b_cdc_bounded",
      (s, d) => {
        graft.functions.GraftExtensions.registerInto(s)
        val W = org.apache.spark.sql.expressions.Window
        val MIN = 16L
        val MAX = 192L
        // prev' after the forced cuts owed before candidate c
        val prev2 = s"(acc.prev + (((c - acc.prev - 1) DIV $MAX) * $MAX))"
        val chunks = T.documents(s, d)
          .filter(length(col("text")) > 0)
          .select(col("doc_id"), col("text"), length(col("text")).as("n"))
          .withColumn("cands", expr(
            """filter(
              |  transform(window_hashes(text, 8),
              |    (h, i) -> IF(h % 64 = 0, CAST(i + 8 AS BIGINT), CAST(NULL AS BIGINT))),
              |  p -> p IS NOT NULL AND p < n)""".stripMargin))
          .withColumn("cuts", expr(
            s"""aggregate(
               |  cands,
               |  named_struct('cs', CAST(array() AS ARRAY<BIGINT>),
               |               'prev', CAST(0 AS BIGINT)),
               |  (acc, c) -> named_struct(
               |    'cs', concat(
               |      acc.cs,
               |      IF((c - acc.prev - 1) DIV $MAX = 0,
               |         CAST(array() AS ARRAY<BIGINT>),
               |         transform(sequence(1L, (c - acc.prev - 1) DIV $MAX),
               |                   j -> acc.prev + j * $MAX)),
               |      IF(c - $prev2 >= $MIN, array(c), CAST(array() AS ARRAY<BIGINT>))),
               |    'prev', IF(c - $prev2 >= $MIN, c, $prev2)),
               |  acc -> concat(
               |    acc.cs,
               |    IF((n - acc.prev - 1) DIV $MAX = 0,
               |       CAST(array() AS ARRAY<BIGINT>),
               |       transform(sequence(1L, (n - acc.prev - 1) DIV $MAX),
               |                 j -> acc.prev + j * $MAX))))""".stripMargin))
          .withColumn("starts",
            expr("concat(array(CAST(1 AS BIGINT)), transform(cuts, p -> p + 1))"))
          .withColumn("ends", expr("concat(cuts, array(CAST(n AS BIGINT)))"))
          .select(col("doc_id"), col("text"),
            posexplode(expr("arrays_zip(starts, ends)")).as(Seq("ci", "se")))
          .select(col("doc_id"), col("text"), (col("ci") + 1).as("chunk_idx"),
            col("se.starts").as("start"),
            (col("se.ends") - col("se.starts") + 1).as("clen"))
          .withColumn("dg", expr(
            """CAST(conv(substr(md5(substring(text, CAST(start AS INT), CAST(clen AS INT))),
              |               1, 15), 16, 10) AS BIGINT)""".stripMargin))
          .drop("text") // digest computed — only doc_id/start/clen/dg ride the dg shuffle
        chunks
          .withColumn("rn", row_number().over(
            W.partitionBy(col("dg")).orderBy(col("doc_id"), col("start"))))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_chunks"),
            min(col("clen")).as("min_clen"),
            max(col("clen")).as("max_clen"),
            sum(when(col("rn") > 1, 1L).otherwise(0L)).as("dup_chunks"),
            sum(when(col("rn") > 1, col("clen")).otherwise(0L)).as("dup_chars"))
          .select(col("doc_id"), col("n_chunks"), col("min_clen"),
            col("max_clen"), col("dup_chunks"), col("dup_chars"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH RECURSIVE c AS (
             |  SELECT doc_id, text, length(text) AS n,
             |    [CAST(unicode(ch) AS BIGINT) FOR ch IN split(text, '')] AS cps
             |  FROM documents WHERE length(text) > 0),
             |wh AS (
             |  SELECT doc_id, text, n,
             |    [CAST(i AS BIGINT) FOR i IN range(8, n + 1)
             |       IF list_reduce(list_prepend(CAST(0 AS BIGINT), cps[i-7:i]),
             |            (a, cc) -> (a * 31 + cc) % 1000000007) % 64 = 0
             |          AND i < n] AS cands
             |  FROM c),
             |s AS (
             |  SELECT doc_id, n, cands, CAST(0 AS BIGINT) AS cut
             |  FROM wh
             |  UNION ALL
             |  SELECT doc_id, n, cands,
             |    COALESCE(
             |      list_min(list_filter(cands, x -> x >= cut + 16 AND x <= cut + 192)),
             |      CASE WHEN n - cut > 192 THEN cut + 192 END)
             |  FROM s
             |  WHERE COALESCE(
             |      list_min(list_filter(cands, x -> x >= cut + 16 AND x <= cut + 192)),
             |      CASE WHEN n - cut > 192 THEN cut + 192 END) IS NOT NULL),
             |cl AS (
             |  SELECT doc_id, list_sort(list(cut)) AS bs FROM s GROUP BY doc_id),
             |sp AS (
             |  SELECT w.doc_id, w.text, w.n,
             |    list_transform(cl.bs, p -> p + 1) AS starts,
             |    list_append([b FOR b IN cl.bs IF b > 0], CAST(w.n AS BIGINT)) AS ends
             |  FROM wh w JOIN cl ON w.doc_id = cl.doc_id),
             |ch AS (
             |  SELECT doc_id, starts[i] AS start, ends[i] - starts[i] + 1 AS clen,
             |    CAST('0x' || substr(md5(substring(text, CAST(starts[i] AS INT),
             |           CAST(ends[i] - starts[i] + 1 AS INT))), 1, 15) AS BIGINT) AS dg
             |  FROM (SELECT doc_id, text, starts, ends,
             |          unnest(range(1, len(starts) + 1)) AS i
             |        FROM sp)),
             |r AS (
             |  SELECT doc_id, clen,
             |    row_number() OVER (PARTITION BY dg ORDER BY doc_id, start) AS rn
             |  FROM ch)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
             |  CAST(min(clen) AS BIGINT) AS min_clen,
             |  CAST(max(clen) AS BIGINT) AS max_clen,
             |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
             |  CAST(sum(CASE WHEN rn > 1 THEN clen ELSE 0 END) AS BIGINT) AS dup_chars
             |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      doc = "dedup/FastCDC bounded chunking — min/max chunk-size bounds (skip-below-MIN, force-cut-at-MAX) run as a per-document aggregate fold over the candidate array; bounds surfaced in the output, recursive-CTE oracle"),

    // D19: Misra-Gries heavy hitters — the frequency sibling of d17's
    // HLL and the sketch a data-mixing read actually wants (t13's vocab
    // coverage approximates this from the exact side): per language, a
    // CONSTANT-SIZE k-counter summary of the token stream with map-side
    // combine, so at 100 TB each partition ships ≤ k (token, count)
    // pairs per lang instead of its tokens. MG's law: any token with
    // true count > N/(k+1) is guaranteed present in the summary
    // (counters undercount by ≤ N/(k+1), so such a token's counter
    // stays positive). Counter VALUES are stream/merge-order dependent
    // — NOT reproducible cross-engine — so the oracled output exposes
    // only the order-insensitive law: survivors are semi-joined against
    // the exact counts and filtered to cnt·k > N, a set MG provably
    // always contains (a buggy sketch that evicts a guaranteed-heavy
    // token hash-fails here). k = 30 vs the corpus's ~31-token
    // near-uniform vocabulary keeps the sketch under constant eviction
    // pressure — the regime where the law has teeth. The exact-count
    // leg exists for the oracle/self-evaluation; a production mixing
    // read ships ONLY the merged summaries. Value error band + merge
    // associativity are pinned in SketchLmCdcSpec where the stream
    // order is controlled.
    QueryDef(
      "d19_heavy_hitters",
      (s, d) => {
        val K = 30
        // SharedFrame: the MG summary, exact-count and per-lang-total
        // legs are THREE consumers of the same tokenize pass — uncached,
        // each re-scans documents and re-explodes the token stream
        // (d21_grams / d23's shared-scan discipline applied here too)
        val toks = SharedFrame(T.documents(s, d)
          .select(col("lang"),
            explode(filter(split(lower(col("text")), " "), x => x =!= ""))
              .as("tok")),
          "d19_toks", d)
        val summary = toks.groupBy(col("lang"))
          .agg(graft.functions.MisraGries.udaf(K)(col("tok")).as("mg"))
          .select(col("lang"), explode(col("mg")).as("e"))
          .select(col("lang"), col("e._1").as("tok"))
        val exact = toks.groupBy(col("lang"), col("tok"))
          .agg(count(lit(1)).as("cnt"))
        val totals = toks.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
        exact.join(summary, Seq("lang", "tok"), "left_semi")
          .join(broadcast(totals), Seq("lang"))
          .filter(col("cnt") * K > col("n_lang"))
          .select(col("lang"), col("tok"), col("cnt"), col("n_lang"))
          .orderBy(col("lang"), col("cnt").desc, col("tok"))
      },
      Some("""WITH toks AS (
             |  SELECT lang,
             |    unnest(list_filter(str_split(lower(text), ' '), x -> x <> '')) AS tok
             |  FROM documents),
             |ex AS (
             |  SELECT lang, tok, CAST(count(*) AS BIGINT) AS cnt
             |  FROM toks GROUP BY lang, tok),
             |tot AS (
             |  SELECT lang, CAST(count(*) AS BIGINT) AS n_lang
             |  FROM toks GROUP BY lang)
             |SELECT ex.lang, ex.tok, ex.cnt, tot.n_lang
             |FROM ex JOIN tot ON ex.lang = tot.lang
             |WHERE ex.cnt * 30 > tot.n_lang
             |ORDER BY ex.lang, ex.cnt DESC, ex.tok""".stripMargin),
      doc = "sketch/heavy hitters: per-lang Misra-Gries k-counter summary (mergeable, constant-size, map-side combine) — oracled via the no-false-negative law (survivors ⊇ every token with cnt·k > N); value error band pinned in spec"),

    // D20: Count-Min sketch (Cormode & Muthukrishnan 2005) — the third
    // sketch-family member, and unlike MG it is ADDITIVE: cell (r, c)
    // holds Σ of increments, so the sketch is completely order- and
    // merge-order-independent — every value in this query is exactly
    // reproducible cross-engine and the oracle hashes the sketch
    // ITSELF, not just a law. depth 4 × width 32 against a ~31-token
    // vocabulary forces real collisions, so estimates genuinely
    // overcount and the self-evaluation (est vs exact per token) is
    // non-degenerate. Scale shape: cells are a (r, c)-keyed groupBy —
    // 128 counters, map-side combinable, the whole sketch broadcasts;
    // a production reader ships ONLY the cells and answers point
    // queries without the token shuffle (the exact leg here exists for
    // the oracle/self-evaluation, d17/x14's pattern). The CMS law
    // est ≥ true is structural (counters only ever add); the oracle
    // equality covers it since both engines compute the same est.
    // Row hashing is ONE md5 per token with the D row columns derived
    // by Kirsch-Mitzenmacher composition c_r = (h1 + r·h2) mod W
    // (h2 forced ODD by the 1 + 2·(… mod W/2) derivation — odd ⇒
    // coprime with the power-of-two width) — d21's probe positions and
    // d24's sign bits already derive from a single digest; hashing the
    // 100 TB token stream D times for D independent row hashes is 4×
    // the work the operator needs (KM's "two hashes suffice" result,
    // Kirsch & Mitzenmacher 2006, applies to CMS rows verbatim).
    QueryDef(
      "d20_count_min",
      (s, d) => {
        // cells leg = the shared batch/stream definition; the exact
        // probe leg re-derives (r, c) for the ~|vocab| distinct tokens
        // via the same cmsRowCols rule
        val docs = T.documents(s, d)
        val cells = cmsCells(docs)
        val exact = docs
          .select(explode(filter(split(lower(col("text")), " "), x => x =!= ""))
            .as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        cmsRowCols(exact.select(col("tok"), col("cnt")))
          .join(broadcast(cells), Seq("r", "c"))
          .groupBy(col("tok"), col("cnt"))
          .agg(min(col("cell")).as("est"))
          .select(col("tok"), col("est"), col("cnt"),
            (col("est") - col("cnt")).as("overcount"))
          .orderBy(col("tok"))
      },
      Some("""WITH toks AS (
             |  SELECT unnest(list_filter(str_split(lower(text), ' '), x -> x <> ''))
             |    AS tok
             |  FROM documents),
             |hashed AS (
             |  SELECT tok, r,
             |    ((dg % 32) + r * (1 + 2 * ((dg // 32) % 16))) % 32 AS c
             |  FROM (SELECT tok,
             |          CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS dg
             |        FROM toks),
             |       (SELECT unnest(range(0, 4)) AS r)),
             |cells AS (
             |  SELECT r, c, CAST(count(*) AS BIGINT) AS cell
             |  FROM hashed GROUP BY r, c),
             |ex AS (
             |  SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY tok),
             |probe AS (
             |  SELECT tok, cnt, r,
             |    ((dg % 32) + r * (1 + 2 * ((dg // 32) % 16))) % 32 AS c
             |  FROM (SELECT tok, cnt,
             |          CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS dg
             |        FROM ex),
             |       (SELECT unnest(range(0, 4)) AS r))
             |SELECT p.tok, CAST(min(cl.cell) AS BIGINT) AS est, p.cnt,
             |  CAST(min(cl.cell) - p.cnt AS BIGINT) AS overcount
             |FROM probe p JOIN cells cl ON p.r = cl.r AND p.c = cl.c
             |GROUP BY p.tok, p.cnt ORDER BY p.tok""".stripMargin),
      doc = "sketch/count-min (4x32, ONE md5 per token + Kirsch-Mitzenmacher row composition) — additive order-independent cells, fully oracle-exact incl. the collision overcounts; production ships 128 counters and answers point queries with no token shuffle"),

    // D21: Bloom-filter decontamination — d10's PRODUCTION shape: at
    // 100 TB you do not semi-join the corpus gram stream against an
    // eval digest table; you broadcast an m-bit Bloom filter of the
    // eval grams (bit ORs are additive → order-independent → every
    // bit, probe and count here is exactly oracle-reproducible) and
    // drop any document with a gram whose k bits are all set. k = 3
    // positions per gram via Kirsch-Mitzenmacher double hashing
    // (h1 + j·h2 mod m) from one md5-derived 60-bit digest; m = 65536
    // sized so the planted eval grams fill ~10% of the filter and
    // false positives exist but are rare — the self-evaluation
    // (bloom_hits vs exact_hits per doc, no-false-negative law
    // bloom ≥ exact structurally) stays non-degenerate. Gram digests
    // are md5-portable (not the xxhash kernel) so both engines hash
    // identical values. Scale shape: the filter is ≤ m bits broadcast
    // once; the probe is a map-side forall over each gram's 3
    // positions — the corpus is read once and nothing gram-shaped
    // shuffles at all (vs d10's digest-keyed window).
    QueryDef(
      "d21_bloom_decontaminate",
      (s, d) => {
        val M = 65536L
        val toks = filter(split(lower(col("text")), " "), x => x =!= "")
        // gram rule = the shared gramDigests definition (per-doc dedup
        // inside the array world, IF short-doc guard, md5 60-bit
        // digests — d23/streaming-KMV's rule). SharedFrame'd: the
        // filter-build, eval-digest, probe and accounting legs are FOUR
        // consumers of the same gram stream in one job — uncached, each
        // re-ran the corpus scan + gram explode
        val grams = SharedFrame(T.documents(s, d)
          .select(col("doc_id"), toks.as("ts"))
          .select(col("doc_id"), explode(gramDigests("ts")).as("dg"))
          .withColumn("ps", expr(
            s"transform(sequence(0, 2), j -> pmod(pmod(dg, $M) + j * (1 + pmod(dg div $M, ${M - 1})), $M))")),
          "d21_grams", d)
        // the filter is carried as M/64 = 1024 DENSE int64 words, not a
        // position set: array_contains over a ~6.5k-entry set is O(m)
        // per probe (measured 324 s at sf0.1 — 3 probes × 500k grams ×
        // 65536 comparisons), while element_at on a dense array + bit
        // mask is O(1). Same bit set, same output, oracle unchanged
        // (the rehearsal's decontaminate_bloom word-frame lesson,
        // applied to the broadcast-scalar carrier).
        val bits = grams.filter(col("doc_id") % 10 === 7)
          .select(explode(col("ps")).as("p"))
          .groupBy(expr("p div 64").as("w"))
          .agg(expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 64) AS INT)))")
            .as("word"))
          .agg(expr("map_from_entries(collect_list(struct(w, word)))").as("wm"))
          .select(expr(
            s"transform(sequence(0, ${M / 64 - 1}), i -> coalesce(element_at(wm, CAST(i AS BIGINT)), CAST(0 AS BIGINT)))")
            .as("words"))
        val evalDg = grams.filter(col("doc_id") % 10 === 7)
          .select(col("dg")).distinct()
        val probe = grams.filter(col("doc_id") % 10 =!= 7)
          .crossJoin(broadcast(bits))
          .withColumn("bloom_hit", expr(
            """forall(ps, p ->
              |  (element_at(words, CAST(p div 64 AS INT) + 1)
              |     & shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 64) AS INT))) != 0)""".stripMargin)
            .cast("long"))
          .join(broadcast(evalDg.withColumn("ex", lit(1L))), Seq("dg"), "left")
          .withColumn("exact_hit", coalesce(col("ex"), lit(0L)))
        // account EVERY non-eval doc: a gram-less (≤5-token) doc is
        // trivially clean but must still carry a zero row, or "docs in
        // == docs accounted" reconciliation undercounts
        T.documents(s, d).select(col("doc_id"))
          .filter(col("doc_id") % 10 =!= 7)
          .join(probe.groupBy(col("doc_id"))
            .agg(count(lit(1)).as("ng"),
              sum(col("bloom_hit")).as("bh"),
              sum(col("exact_hit")).as("eh")), Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("ng"), lit(0L)).as("n_grams"),
            coalesce(col("bh"), lit(0L)).as("bloom_hits"),
            coalesce(col("eh"), lit(0L)).as("exact_hits"),
            (coalesce(col("bh"), lit(0L)) > 0).cast("int").as("flagged_bloom"),
            (coalesce(col("eh"), lit(0L)) > 0).cast("int").as("is_contaminated"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(str_split(lower(text), ' '), x -> x <> '') AS ts
             |  FROM documents),
             |grams AS (
             |  SELECT DISTINCT doc_id,
             |    CAST('0x' || substr(md5(array_to_string(ts[i:i+5], ' ')), 1, 15)
             |         AS BIGINT) AS dg
             |  FROM (SELECT doc_id, ts,
             |          unnest(range(1, greatest(len(ts) - 5, 0) + 1)) AS i
             |        FROM toks)),
             |wp AS (
             |  SELECT doc_id, dg,
             |    [( (dg % 65536) + j * (1 + (dg // 65536) % 65535) ) % 65536
             |     FOR j IN range(0, 3)] AS ps
             |  FROM grams),
             |bits AS (
             |  SELECT list(DISTINCT p) AS bits
             |  FROM (SELECT unnest(ps) AS p FROM wp WHERE doc_id % 10 = 7)),
             |ev AS (SELECT DISTINCT dg FROM grams WHERE doc_id % 10 = 7),
             |probe AS (
             |  SELECT w.doc_id,
             |    CASE WHEN list_has_all(b.bits, w.ps) THEN 1 ELSE 0 END AS bloom_hit,
             |    CASE WHEN ev.dg IS NOT NULL THEN 1 ELSE 0 END AS exact_hit
             |  FROM wp w CROSS JOIN bits b
             |  LEFT JOIN ev ON ev.dg = w.dg
             |  WHERE w.doc_id % 10 != 7),
             |agg AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
             |    CAST(sum(bloom_hit) AS BIGINT) AS bloom_hits,
             |    CAST(sum(exact_hit) AS BIGINT) AS exact_hits
             |  FROM probe GROUP BY doc_id)
             |SELECT d.doc_id,
             |  coalesce(a.n_grams, 0) AS n_grams,
             |  coalesce(a.bloom_hits, 0) AS bloom_hits,
             |  coalesce(a.exact_hits, 0) AS exact_hits,
             |  CAST(CASE WHEN coalesce(a.bloom_hits, 0) > 0 THEN 1 ELSE 0 END AS INT)
             |    AS flagged_bloom,
             |  CAST(CASE WHEN coalesce(a.exact_hits, 0) > 0 THEN 1 ELSE 0 END AS INT)
             |    AS is_contaminated
             |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 != 7) d
             |LEFT JOIN agg a ON a.doc_id = d.doc_id
             |ORDER BY d.doc_id""".stripMargin),
      doc = "sketch/bloom decontamination — d10's 100 TB shape: m-bit eval-gram Bloom filter broadcast once, Kirsch-Mitzenmacher k=3 probe map-side, zero gram-shaped shuffles; fully oracle-exact incl. false positives, bloom ⊇ exact structurally"),

    // X14: ANN recall@k self-evaluation — the measurement every ANN
    // deployment runs before trusting an index: d5's brute-force top-5
    // is the ground truth, d7's IVF (2-probe) is the candidate, and the
    // output is per-query |hit| / 5. Composing BOTH family members in
    // one plan is the point: the quantized base frame is the SAME
    // SharedFrame d7 materializes (name-keyed, so a session running
    // d7 + x14 pays for it once), the exact leg is the bounded
    // broadcast-query shape of d5, and the IVF leg re-derives the index
    // end to end. At corpus scale the exact leg is the expensive one —
    // which is exactly how real recall evals run: brute-force ground
    // truth over a SAMPLED query set (here the bounded vec_id < 10
    // probe set), IVF over everything.
    QueryDef(
      "x14_ann_recall",
      (s0, d) => {
        val s = graft.functions.TopK.sessionWithHashAggCapacity(s0) // see TopK doc
        val q = expr("transform(embedding, x -> CAST(floor(x * 1000 + 0.5) AS BIGINT))")
        val base = SharedFrame(
          T.embeddings(s, d).select(col("vec_id"), q.as("q"))
            .withColumn("nn",
              expr("aggregate(zip_with(q, q, (a, b) -> a * b), 0L, (acc, x) -> acc + x)")),
          "d7_base", d)
        val queries = base.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("q").as("qq"), col("nn").as("qn"))
        val dot =
          expr("aggregate(zip_with(q, qq, (a, b) -> a * b), 0L, (acc, x) -> acc + x)")
            .cast("double")
        // exact leg: d5's brute-force top-5
        val gt = base.join(broadcast(queries), col("vec_id") =!= col("qid"))
          .withColumn("cos",
            dot / sqrt(col("qn").cast("double") * col("nn").cast("double")))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))))
          .filter(col("rk") <= 5)
          .select(col("qid"), col("vec_id").as("eid"))
        // IVF leg: d7's index, end to end
        val stride = math.max(50L,
          T.footerRowCount(s, d, "embeddings") / 4096L)
        val cents = base.filter(col("vec_id") % stride === 0)
          .select(col("vec_id").as("cid"), col("q").as("cq"), col("nn").as("cn"))
        val simToCent =
          expr("aggregate(zip_with(q, cq, (a, b) -> a * b), 0L, (acc, x) -> acc + x)")
            .cast("double") / sqrt(col("nn").cast("double") * col("cn").cast("double"))
        val assigned = base.join(broadcast(cents))
          .withColumn("sim", simToCent)
          .groupBy(col("vec_id"))
          .agg(max_by(col("cid"), struct(col("sim"), -col("cid"))).as("list_id"))
        val listed = base.join(assigned, "vec_id")
        val probes = base.filter(col("vec_id") < 10).join(broadcast(cents))
          .withColumn("sim", simToCent)
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("cid"))))
          .filter(col("rk") <= 2)
          .select(col("vec_id").as("qid"), col("q").as("qq"), col("nn").as("qn"),
            col("cid").as("probe_list"))
        val approx = probes.join(listed,
            col("list_id") === col("probe_list") && col("vec_id") =!= col("qid"))
          .withColumn("cos",
            dot / sqrt(col("qn").cast("double") * col("nn").cast("double")))
          .dropDuplicates("qid", "vec_id")
          .groupBy(col("qid"))
          .agg(graft.functions.TopK.udaf(5)(col("cos"), col("vec_id")).as("top"))
          .select(col("qid"), explode(expr("transform(top, t -> t._2)")).as("eid"))
        gt.join(approx, Seq("qid", "eid"), "left_semi")
          .groupBy(col("qid")).agg(count(lit(1)).as("n_hit"))
          .join(gt.select(col("qid")).distinct(), Seq("qid"), "right")
          .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
          .withColumn("recall", col("n_hit").cast("double") / 5.0)
          .select(col("qid"), col("n_hit"), col("recall"))
          .orderBy(col("qid"))
      },
      Some("""WITH base AS (
             |  SELECT vec_id,
             |         [floor((embedding[i] * 1000)::DOUBLE + 0.5)::BIGINT
             |          FOR i IN range(1, len(embedding) + 1)] AS q
             |  FROM embeddings),
             |withnn AS (
             |  SELECT vec_id, q,
             |         list_reduce([q[i] * q[i] FOR i IN range(1, len(q) + 1)],
             |                     (a, b) -> a + b) AS nn
             |  FROM base),
             |qs AS (SELECT vec_id AS qid, q AS qq, nn AS qn FROM withnn WHERE vec_id < 10),
             |gt AS (
             |  SELECT qid, eid FROM (
             |    SELECT qs.qid, n.vec_id AS eid,
             |      row_number() OVER (PARTITION BY qs.qid
             |        ORDER BY list_dot_product(n.q, qs.qq) / sqrt(qs.qn * n.nn) DESC,
             |                 n.vec_id) AS rk
             |    FROM qs JOIN withnn n ON n.vec_id <> qs.qid) WHERE rk <= 5),
             |cents AS (
             |  SELECT vec_id AS cid, q AS cq, nn AS cn FROM withnn WHERE vec_id % 50 = 0),
             |simsc AS (
             |  SELECT v.vec_id, v.q, v.nn, c.cid,
             |         list_reduce([v.q[i] * c.cq[i] FOR i IN range(1, len(v.q) + 1)],
             |                     (a, b) -> a + b)::DOUBLE
             |           / sqrt(v.nn::DOUBLE * c.cn::DOUBLE) AS sim
             |  FROM withnn v CROSS JOIN cents c),
             |assigned AS (
             |  SELECT vec_id, cid AS list_id FROM (
             |    SELECT vec_id, cid,
             |           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) AS rn
             |    FROM simsc) WHERE rn = 1),
             |probes AS (
             |  SELECT vec_id AS qid, q AS qq, nn AS qn, cid AS probe_list FROM (
             |    SELECT s.vec_id, s.q, s.nn, s.cid,
             |           row_number() OVER (PARTITION BY s.vec_id ORDER BY s.sim DESC, s.cid ASC) AS rn
             |    FROM simsc s WHERE s.vec_id < 10) WHERE rn <= 2),
             |cand AS (
             |  SELECT DISTINCT p.qid, p.qq, p.qn, v.vec_id, v.q, v.nn
             |  FROM probes p
             |  JOIN assigned a ON a.list_id = p.probe_list AND a.vec_id != p.qid
             |  JOIN withnn v ON v.vec_id = a.vec_id),
             |ap AS (
             |  SELECT qid, eid FROM (
             |    SELECT qid, vec_id AS eid,
             |      row_number() OVER (PARTITION BY qid
             |        ORDER BY list_reduce([q[i] * qq[i] FOR i IN range(1, len(q) + 1)],
             |                             (a, b) -> a + b)::DOUBLE
             |                   / sqrt(qn::DOUBLE * nn::DOUBLE) DESC,
             |                 vec_id) AS rk
             |    FROM cand) WHERE rk <= 5)
             |SELECT g.qid,
             |  CAST(count(ap.eid) AS BIGINT) AS n_hit,
             |  CAST(count(ap.eid) AS DOUBLE) / 5.0 AS recall
             |FROM gt g LEFT JOIN ap ON ap.qid = g.qid AND ap.eid = g.eid
             |GROUP BY g.qid ORDER BY g.qid""".stripMargin),
      doc = "similarity composite: ANN recall@5 self-evaluation — d5's brute-force ground truth vs d7's IVF answer over the shared quantized frame; the index-quality measurement every ANN deployment runs"),

    // X15: IVF-PQ — the production ANN pairing (Jégou et al. 2011 §V;
    // FAISS's IVFPQ index): d7's coarse quantizer PRUNES (queries probe
    // their 2 nearest inverted lists, so search cost scales with list
    // size), and inside the probed lists candidates are scored by d16's
    // asymmetric distance over PQ CODES (4 bytes per vector instead of
    // 32 floats — the RAM-residency enabler), not by exact dots.
    // Composing the two existing indexes is the whole point: the coarse
    // centroids, the inverted lists, the subspace codebooks, the codes
    // and the per-query ADC tables are each re-used verbatim from
    // d7/d16 (same SharedFrame base, same stride rule), and x14's
    // recall@5 machinery measures what the compression costs — the
    // recall gap between x14 (IVF + exact rescoring) and x15 (IVF + ADC)
    // is exactly the PQ approximation error. Scale shape: the candidate
    // generator is the list-bounded probe join (never N×Q); ADC scoring
    // adds one broadcast (m×K int64 tables per bounded query set) and a
    // (qid, vec_id)-keyed sum over 4 rows per candidate; everything
    // downstream of the probe is int64-exact.
    QueryDef(
      "x15_ivf_pq",
      (s, d) => {
        val q = expr("transform(embedding, x -> CAST(floor(x * 1000 + 0.5) AS BIGINT))")
        val base = SharedFrame(
          T.embeddings(s, d).select(col("vec_id"), q.as("q"))
            .withColumn("nn",
              expr("aggregate(zip_with(q, q, (a, b) -> a * b), 0L, (acc, x) -> acc + x)")),
          "d7_base", d)
        val queries = base.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("q").as("qq"), col("nn").as("qn"))
        val dot =
          expr("aggregate(zip_with(q, qq, (a, b) -> a * b), 0L, (acc, x) -> acc + x)")
            .cast("double")
        // exact ground truth (x14's leg): brute-force cosine top-5
        val gt = base.join(broadcast(queries), col("vec_id") =!= col("qid"))
          .withColumn("cos",
            dot / sqrt(col("qn").cast("double") * col("nn").cast("double")))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))))
          .filter(col("rk") <= 5)
          .select(col("qid"), col("vec_id").as("eid"))
        // IVF stage (d7's index): lists + 2-probe candidate generation
        val stride = math.max(50L,
          T.footerRowCount(s, d, "embeddings") / 4096L)
        val cents = base.filter(col("vec_id") % stride === 0)
          .select(col("vec_id").as("cid"), col("q").as("cq"), col("nn").as("cn"))
        val simToCent =
          expr("aggregate(zip_with(q, cq, (a, b) -> a * b), 0L, (acc, x) -> acc + x)")
            .cast("double") / sqrt(col("nn").cast("double") * col("cn").cast("double"))
        val assigned = base.join(broadcast(cents))
          .withColumn("sim", simToCent)
          .groupBy(col("vec_id"))
          .agg(max_by(col("cid"), struct(col("sim"), -col("cid"))).as("list_id"))
        val probes = base.filter(col("vec_id") < 10).join(broadcast(cents))
          .withColumn("sim", simToCent)
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("cid"))))
          .filter(col("rk") <= 2)
          .select(col("vec_id").as("qid"), col("cid").as("probe_list"))
        val cand = probes.join(assigned,
            col("list_id") === col("probe_list") && col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"))
        // PQ stage (d16's index): subspace codebooks, codes for the whole
        // corpus, per-query ADC tables. Codebooks cap at ≤ 256
        // codewords/subspace (r14, the family-wide 8-bit-code rule —
        // the encode join below is O(N·K) per subspace; see d16): below
        // 12,800 vectors this floors at the oracle's stride 50, so
        // every test-SF result is unchanged, while the 30× corpus
        // (60k vecs) encodes against 256 codewords instead of 1,200.
        val pqStride = math.max(stride,
          T.footerRowCount(s, d, "embeddings") / 256L)
        val subs = base.select(col("vec_id"),
          posexplode(expr(
            "transform(sequence(0, 3), b -> slice(q, b * 8 + 1, 8))"))
            .as(Seq("b", "s")))
        val pqCents = subs.filter(col("vec_id") % pqStride === 0)
          .select(col("b"), col("vec_id").as("pcid"), col("s").as("cs"))
        val sqDist =
          expr("aggregate(zip_with(s, cs, (a, c) -> (a - c) * (a - c)), 0L, (acc, x) -> acc + x)")
        val codes = subs
          .join(broadcast(pqCents), Seq("b"))
          .withColumn("dist", sqDist)
          .groupBy(col("vec_id"), col("b"))
          .agg(min_by(col("pcid"), struct(col("dist"), col("pcid"))).as("pcid"))
        val adc = subs.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("b"), col("s"))
          .join(broadcast(pqCents), Seq("b"))
          .withColumn("qdist", sqDist)
          .select(col("qid"), col("b"), col("pcid"), col("qdist"))
        // ADC scoring of the IVF candidates + top-5 by asymmetric distance
        val approx = cand.join(codes, "vec_id")
          .join(broadcast(adc), Seq("qid", "b", "pcid"))
          .groupBy(col("qid"), col("vec_id"))
          .agg(sum(col("qdist")).as("adist"))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("adist"), col("vec_id"))))
          .filter(col("rk") <= 5)
          .select(col("qid"), col("vec_id").as("eid"))
        gt.join(approx, Seq("qid", "eid"), "left_semi")
          .groupBy(col("qid")).agg(count(lit(1)).as("n_hit"))
          .join(gt.select(col("qid")).distinct(), Seq("qid"), "right")
          .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
          .withColumn("recall", col("n_hit").cast("double") / 5.0)
          .select(col("qid"), col("n_hit"), col("recall"))
          .orderBy(col("qid"))
      },
      Some("""WITH base AS (
             |  SELECT vec_id,
             |         [floor((embedding[i] * 1000)::DOUBLE + 0.5)::BIGINT
             |          FOR i IN range(1, len(embedding) + 1)] AS q
             |  FROM embeddings),
             |withnn AS (
             |  SELECT vec_id, q,
             |         list_reduce([q[i] * q[i] FOR i IN range(1, len(q) + 1)],
             |                     (a, b) -> a + b) AS nn
             |  FROM base),
             |qs AS (SELECT vec_id AS qid, q AS qq, nn AS qn FROM withnn WHERE vec_id < 10),
             |gt AS (
             |  SELECT qid, eid FROM (
             |    SELECT qs.qid, n.vec_id AS eid,
             |      row_number() OVER (PARTITION BY qs.qid
             |        ORDER BY list_dot_product(n.q, qs.qq) / sqrt(qs.qn * n.nn) DESC,
             |                 n.vec_id) AS rk
             |    FROM qs JOIN withnn n ON n.vec_id <> qs.qid) WHERE rk <= 5),
             |cents AS (
             |  SELECT vec_id AS cid, q AS cq, nn AS cn FROM withnn WHERE vec_id % 50 = 0),
             |simsc AS (
             |  SELECT v.vec_id, v.nn, c.cid,
             |         list_reduce([v.q[i] * c.cq[i] FOR i IN range(1, len(v.q) + 1)],
             |                     (a, b) -> a + b)::DOUBLE
             |           / sqrt(v.nn::DOUBLE * c.cn::DOUBLE) AS sim
             |  FROM withnn v CROSS JOIN cents c),
             |assigned AS (
             |  SELECT vec_id, cid AS list_id FROM (
             |    SELECT vec_id, cid,
             |           row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) AS rn
             |    FROM simsc) WHERE rn = 1),
             |probes AS (
             |  SELECT vec_id AS qid, cid AS probe_list FROM (
             |    SELECT s.vec_id, s.cid,
             |           row_number() OVER (PARTITION BY s.vec_id ORDER BY s.sim DESC, s.cid ASC) AS rn
             |    FROM simsc s WHERE s.vec_id < 10) WHERE rn <= 2),
             |cand AS (
             |  SELECT p.qid, a.vec_id
             |  FROM probes p
             |  JOIN assigned a ON a.list_id = p.probe_list AND a.vec_id != p.qid),
             |subs AS (
             |  SELECT vec_id, b, q[b * 8 + 1 : b * 8 + 8] AS s
             |  FROM base, (SELECT unnest(range(0, 4)) AS b)),
             |pqcents AS (
             |  SELECT b, vec_id AS pcid, s AS cs FROM subs WHERE vec_id % 50 = 0),
             |codes AS (
             |  SELECT vec_id, b, pcid FROM (
             |    SELECT v.vec_id, v.b, c.pcid,
             |      row_number() OVER (PARTITION BY v.vec_id, v.b ORDER BY
             |        list_reduce([(v.s[i] - c.cs[i]) * (v.s[i] - c.cs[i])
             |                     FOR i IN range(1, len(v.s) + 1)],
             |                    (a, x) -> a + x) ASC, c.pcid ASC) AS rn
             |    FROM subs v JOIN pqcents c USING (b)) WHERE rn = 1),
             |adc AS (
             |  SELECT v.vec_id AS qid, v.b, c.pcid,
             |    list_reduce([(v.s[i] - c.cs[i]) * (v.s[i] - c.cs[i])
             |                 FOR i IN range(1, len(v.s) + 1)],
             |                (a, x) -> a + x) AS qdist
             |  FROM subs v JOIN pqcents c USING (b)
             |  WHERE v.vec_id < 10),
             |ap AS (
             |  SELECT qid, eid FROM (
             |    SELECT sc.qid, sc.vec_id AS eid,
             |      row_number() OVER (PARTITION BY sc.qid
             |        ORDER BY sc.adist ASC, sc.vec_id ASC) AS rk
             |    FROM (
             |      SELECT cd.qid, cd.vec_id, CAST(sum(a.qdist) AS BIGINT) AS adist
             |      FROM cand cd
             |      JOIN codes e ON e.vec_id = cd.vec_id
             |      JOIN adc a ON a.qid = cd.qid AND a.b = e.b AND a.pcid = e.pcid
             |      GROUP BY cd.qid, cd.vec_id) sc) WHERE rk <= 5)
             |SELECT g.qid,
             |  CAST(count(ap.eid) AS BIGINT) AS n_hit,
             |  CAST(count(ap.eid) AS DOUBLE) / 5.0 AS recall
             |FROM gt g LEFT JOIN ap ON ap.qid = g.qid AND ap.eid = g.eid
             |GROUP BY g.qid ORDER BY g.qid""".stripMargin),
      doc = "similarity composite: IVF-PQ — d7's 2-probe inverted-list pruning with d16's int64 asymmetric-distance scoring over PQ codes, recall@5 measured against d5's exact ground truth (x14's machinery); the FAISS-style production ANN pairing"),

    // D22: HDR-histogram quantile sketch — the QUANTILE member of the
    // sketch family (d17 HLL = distinct, d19 MG = heavy hitters, d20
    // CMS = frequency, d21 Bloom = membership): per-document token
    // counts summarized into log2-octave × 16-linear-sub-bucket
    // counters (HdrHistogram's bucket geometry; same relative-error
    // contract as DDSketch, Masson et al. VLDB 2019 — but with INTEGER
    // bucket arithmetic: octave e = bit-length(v) − 1 via bin(),
    // sub-bucket m = ((v − 2^e)·16) div 2^e — so, unlike log_γ
    // bucketing, both engines compute identical bucket ids with zero
    // floating point and the sketch is fully oracle-exact). Buckets are
    // ADDITIVE counters: order- and merge-order-independent, map-side
    // combinable, ≤ 16 cells per octave (≤ ~1k for the whole int64
    // domain) — the quantile read that replaces a global sort at
    // 100 TB (doc-length p50/p99 for packing/curriculum decisions).
    // Quantile answers come from bucket GEOMETRY alone: lo/hi bounds
    // derived arithmetically from (e, m), giving the guarantee
    // (hi − lo)/lo ≤ 1/16 (+integer rounding) per answer. The exact
    // quantile rides along as the oracle-visible accuracy proof (d17's
    // pattern) — derived from the per-VALUE histogram (bounded by the
    // doc-length value domain, never a global sort over docs), and
    // bound_ok pins the sandwich law est_lo ≤ exact_q ≤ est_hi inside
    // the hash itself. Rank rule: quantile q = smallest value whose
    // cumulative count ≥ ceil(q·n), all integer.
    QueryDef(
      "d22_hdr_quantiles",
      (s, d) => {
        import s.implicits._
        val lens = T.documents(s, d)
          .select(size(filter(split(lower(col("text")), " "), x => x =!= ""))
            .cast("long").as("v"))
          .filter(col("v") >= 1)
        val hist = Hdr.withBuckets(lens)
          .groupBy(col("e"), col("m"), col("pw"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("lo", Hdr.loExpr)
          .withColumn("hi", Hdr.hiExpr)
        // two 1-row scalar frames: the bucket summary (sketch) and the
        // per-value histogram (exact leg; bounded by the doc-length
        // value domain) — both collect_list scalars, both broadcast
        val packed = hist.agg(
          sort_array(collect_list(struct(col("e"), col("m"), col("lo"),
            col("hi"), col("cnt")))).as("hist"),
          sum(col("cnt")).as("n"))
        val vpacked = lens.groupBy(col("v")).agg(count(lit(1)).as("vcnt"))
          .agg(sort_array(collect_list(struct(col("v"), col("vcnt")))).as("vh"))
        Seq(100L, 250L, 500L, 750L, 900L, 950L, 990L).toDF("q_milli")
          .crossJoin(broadcast(packed))
          .crossJoin(broadcast(vpacked))
          .withColumn("rnk", expr(Hdr.rankSql("q_milli", "n")))
          .withColumn("sel", Hdr.quantileSel("rnk"))
          .withColumn("exact_q", expr(
            """aggregate(vh,
              |  named_struct('cum', CAST(0 AS BIGINT), 'v', CAST(-1 AS BIGINT)),
              |  (a, b) -> IF(a.v >= 0, a, named_struct(
              |    'cum', a.cum + b.vcnt,
              |    'v', IF(a.cum + b.vcnt >= rnk, b.v, CAST(-1 AS BIGINT))))).v""".stripMargin))
          .select(col("q_milli"),
            col("sel.lo").as("est_lo"), col("sel.hi").as("est_hi"),
            col("exact_q"), col("n"),
            (col("sel.lo") <= col("exact_q") && col("exact_q") <= col("sel.hi"))
              .cast("int").as("bound_ok"),
            expr("((sel.hi - sel.lo) * 1000) div sel.lo").as("width_milli"))
          // a corpus with ZERO non-empty docs has no quantiles: n is the
          // empty-input scalar agg's null — drop the rows so the answer
          // matches the oracle's empty join result instead of emitting
          // seven null-n rows
          .filter(col("n").isNotNull)
          .orderBy(col("q_milli"))
      },
      Some("""WITH lens AS (
             |  SELECT CAST(len(list_filter(str_split(lower(text), ' '),
             |           x -> x <> '')) AS BIGINT) AS v
             |  FROM documents),
             |lp AS (SELECT v FROM lens WHERE v >= 1),
             |bk AS (
             |  SELECT v, CAST(length(bin(v)) - 1 AS BIGINT) AS e,
             |    CAST(1 AS BIGINT) << CAST(length(bin(v)) - 1 AS INT) AS pw
             |  FROM lp),
             |hist AS (
             |  SELECT e, m, pw, CAST(count(*) AS BIGINT) AS cnt,
             |    pw + (m * pw + 15) // 16 AS lo,
             |    least(pw + ((m + 1) * pw + 15) // 16 - 1, 2 * pw - 1) AS hi
             |  FROM (SELECT e, pw, ((v - pw) * 16) // pw AS m FROM bk)
             |  GROUP BY e, m, pw),
             |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM hist),
             |cum AS (
             |  SELECT e, m, lo, hi, cnt,
             |    sum(cnt) OVER (ORDER BY e, m) AS cum
             |  FROM hist),
             |qs AS (SELECT CAST(unnest([100, 250, 500, 750, 900, 950, 990])
             |         AS BIGINT) AS q_milli),
             |ranks AS (
             |  SELECT q_milli, (q_milli * n + 999) // 1000 AS rnk, n
             |  FROM qs, tot),
             |sel AS (
             |  SELECT q_milli, rnk, n, lo, hi,
             |    row_number() OVER (PARTITION BY q_milli ORDER BY e, m) AS rn
             |  FROM ranks r JOIN cum c ON c.cum >= r.rnk),
             |vcum AS (
             |  SELECT v, sum(cnt) OVER (ORDER BY v) AS cum
             |  FROM (SELECT v, CAST(count(*) AS BIGINT) AS cnt
             |        FROM lp GROUP BY v)),
             |ex AS (
             |  SELECT q_milli, CAST(min(vc.v) AS BIGINT) AS exact_q
             |  FROM ranks r JOIN vcum vc ON vc.cum >= r.rnk
             |  GROUP BY q_milli)
             |SELECT s.q_milli,
             |  CAST(s.lo AS BIGINT) AS est_lo, CAST(s.hi AS BIGINT) AS est_hi,
             |  e.exact_q, s.n,
             |  CAST(CASE WHEN s.lo <= e.exact_q AND e.exact_q <= s.hi
             |       THEN 1 ELSE 0 END AS INT) AS bound_ok,
             |  CAST(((s.hi - s.lo) * 1000) // s.lo AS BIGINT) AS width_milli
             |FROM sel s JOIN ex e USING (q_milli)
             |WHERE s.rn = 1 ORDER BY s.q_milli""".stripMargin),
      doc = "sketch/quantiles: HDR-histogram doc-length quantile sketch — integer log2-octave×16 sub-bucket additive counters (mergeable, map-side combinable, ≤16 cells/octave), quantile answers from bucket geometry with (hi−lo)/lo ≤ 1/16 guarantee; fully oracle-exact incl. the sandwich law est_lo ≤ exact_q ≤ est_hi"),

    // X16: per-shard dataset card — the summary a 100 TB pipeline
    // PUBLISHES with every training shard (the "data card"/datasheet
    // read: Gebru et al. 2021): doc/token counts, token-count spread,
    // doc-length quantiles, and distinct-token cardinality, one row per
    // shard, all from ONE corpus scan plus constant-size keyed
    // aggregates. Composes the sketch family per shard: d22's HDR
    // buckets (additive, (shard,e,m)-keyed, folded per shard) answer
    // p50/p95 doc length; d17's HLL registers ((shard,j)-keyed, ≤ 64
    // rows per shard) answer distinct tokens — with the register grid
    // DENSIFIED ARITHMETICALLY instead of via d17's broadcast grid
    // join: a register j absent from the (shard,j) aggregate has
    // M_j = 0, so it contributes exactly 2^54 to the harmonic sum and
    // 1 to v_zero, i.e. s_scaled = (64 − n_present)·2^54 + Σ 2^(54−reg)
    // — no cross join anywhere in this plan. Shard assignment is the
    // md5-portable doc_id hash (ShardSink's discipline: never Spark's
    // non-portable hash()), so both engines bucket identically. Every
    // column is integer except hll_est, evaluated by both engines from
    // identical integers (d17's rule).
    QueryDef(
      "x16_shard_data_card",
      (s, d) => {
        // ONE doc-grain aggregate carries counts AND the HDR histogram
        // (zero-token docs in withBuckets' sentinel cell): one pass per
        // GRAIN (docs, then tokens for HLL), not one per statistic. The
        // same three stages serve the streaming incremental card store —
        // see shardCardBase/shardCardCells/shardCardRegs/assembleShardCard.
        val base = shardCardBase(T.documents(s, d))
        assembleShardCard(shardCardCells(base), shardCardRegs(base))
      },
      Some("""WITH docs AS (
             |  SELECT doc_id,
             |    list_filter(str_split(lower(text), ' '), x -> x <> '') AS ts,
             |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
             |      % 8 AS shard
             |  FROM documents),
             |dv AS (SELECT doc_id, shard, ts, CAST(len(ts) AS BIGINT) AS v FROM docs),
             |counts AS (
             |  SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(v) AS BIGINT) AS n_tokens,
             |    CAST(min(v) AS BIGINT) AS min_toks,
             |    CAST(max(v) AS BIGINT) AS max_toks
             |  FROM dv GROUP BY shard),
             |bk AS (
             |  SELECT shard, v, CAST(length(bin(v)) - 1 AS BIGINT) AS e,
             |    CAST(1 AS BIGINT) << CAST(length(bin(v)) - 1 AS INT) AS pw
             |  FROM dv WHERE v >= 1),
             |hist AS (
             |  SELECT shard, e, m, pw, CAST(count(*) AS BIGINT) AS cnt,
             |    pw + (m * pw + 15) // 16 AS lo
             |  FROM (SELECT shard, e, pw, ((v - pw) * 16) // pw AS m FROM bk)
             |  GROUP BY shard, e, m, pw),
             |nq AS (SELECT shard, CAST(sum(cnt) AS BIGINT) AS nq FROM hist GROUP BY shard),
             |cum AS (
             |  SELECT shard, e, m, lo,
             |    sum(cnt) OVER (PARTITION BY shard ORDER BY e, m) AS cum
             |  FROM hist),
             |quant AS (
             |  SELECT q.shard, q.q_milli, c.lo,
             |    row_number() OVER (PARTITION BY q.shard, q.q_milli ORDER BY c.e, c.m) AS rn
             |  FROM (SELECT shard, nq, unnest([500, 950]) AS q_milli FROM nq) q
             |  JOIN cum c ON c.shard = q.shard
             |    AND c.cum >= (q.q_milli * q.nq + 999) // 1000),
             |qs AS (
             |  SELECT shard,
             |    CAST(max(CASE WHEN q_milli = 500 THEN lo END) AS BIGINT) AS p50_lo,
             |    CAST(max(CASE WHEN q_milli = 950 THEN lo END) AS BIGINT) AS p95_lo
             |  FROM quant WHERE rn = 1 GROUP BY shard),
             |toks AS (
             |  SELECT shard, unnest(ts) AS tok FROM dv),
             |hr AS (
             |  SELECT shard,
             |    CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % 64 AS j,
             |    CASE WHEN CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) // 64 = 0
             |         THEN 55
             |         ELSE 55 - length(bin(CAST('0x' || substr(md5(tok), 1, 15)
             |                AS BIGINT) // 64)) END AS rho
             |  FROM toks),
             |regs AS (SELECT shard, j, max(rho) AS reg FROM hr GROUP BY shard, j),
             |hll AS (
             |  SELECT shard, CAST(64 - count(*) AS BIGINT) AS v_zero,
             |    CAST((64 - count(*)) * 18014398509481984 +
             |      sum(CASE WHEN reg <= 54
             |          THEN CAST(1 AS BIGINT) << CAST(54 - reg AS INT)
             |          ELSE 0 END) AS BIGINT) AS s_scaled
             |  FROM regs GROUP BY shard)
             |SELECT c.shard, c.n_docs, c.n_tokens, c.min_toks, c.max_toks,
             |  coalesce(q.p50_lo, -1) AS p50_lo,
             |  coalesce(q.p95_lo, -1) AS p95_lo,
             |  coalesce(h.v_zero, 64) AS v_zero,
             |  coalesce(h.s_scaled, 64 * 18014398509481984) AS s_scaled,
             |  0.709 * 4096 * CAST(18014398509481984 AS DOUBLE)
             |    / coalesce(h.s_scaled, 64 * 18014398509481984) AS hll_est
             |FROM counts c LEFT JOIN qs q USING (shard)
             |LEFT JOIN hll h USING (shard)
             |ORDER BY c.shard""".stripMargin),
      doc = "pipeline composite: per-shard dataset card — doc/token counts, HDR p50/p95 doc length (d22's buckets per shard) and HLL distinct tokens (d17's registers per shard, grid densified arithmetically — no cross join) in one scan + constant-size keyed aggregates; md5-portable shard hash"),

    // D23: KMV / theta-sketch source overlap — the INTERSECTION sketch
    // (K-minimum-values, Bar-Yossef et al. 2002; theta framework,
    // Dasgupta et al. 2016) completing what d17's HLL cannot do: HLL
    // registers union but never intersect, so "how much distinct
    // content do two crawl sources share" (d11's question, asked of
    // grams instead of whole docs) needs the bottom-k carrier. Per
    // source, the 64 smallest distinct 6-gram hashes — computed by the
    // BottomK typed Aggregator, NOT a per-source ranking window: map-side
    // combine ships ≤ 64 longs per source per partition, vs the window
    // formulation's full (source, h)-distinct shuffle + sort. Bottom-k
    // of a SET is order-/merge-order-independent → every sketch entry,
    // theta cut and estimate is exactly oracle-reproducible (unlike
    // d19's MG values). Pairwise: theta = min of the two 64th-smallest
    // hashes (2^60 when a sketch isn't full — that side is known
    // exactly); entries below theta from BOTH sketches are a uniform
    // sample of the pair's union, so jaccard_est = |intersect| /
    // |union| of the filtered entries, in integer milli. The exact
    // (source, gram)-distinct legs ride along as the oracle-visible
    // accuracy proof (d17/d20's pattern) — they are precisely the
    // shuffles the sketch replaces at 100 TB, where per-source sketches
    // are 64 longs and the 190-pair comparison is driver-trivial.
    // Per-doc gram dedup stays inside the array world (d21's rule), and
    // the ≤5-token guard is an IF, never greatest() (Spark's
    // sequence(1, 0) descends).
    QueryDef(
      "d23_kmv_source_overlap",
      (s, d) => {
        val K = 64
        val TH = 1152921504606846976L // 2^60: hash-space top, theta when not full
        val grams = T.documents(s, d)
          .select(col("source"),
            filter(split(lower(col("text")), " "), x => x =!= "").as("ts"))
          .select(col("source"), explode(gramDigests("ts")).as("h"))
        // the 20-row sketch frame feeds BOTH sides of the pair join and
        // the distinct-gram frame feeds three exact legs — without the
        // shared cache each consumer re-runs the corpus scan + gram
        // explode (12 parquet scans in the uncached plan)
        val sk = SharedFrame(grams.groupBy(col("source"))
          .agg(graft.functions.BottomK.udaf(K)(col("h")).as("ks"))
          .withColumn("theta_x",
            expr(s"IF(size(ks) < $K, CAST($TH AS BIGINT), element_at(ks, -1))")),
          "d23_sk", d)
        val pairs = sk.select(col("source").as("src_a"), col("ks").as("ka"),
            col("theta_x").as("ta"))
          .join(broadcast(sk.select(col("source").as("src_b"), col("ks").as("kb"),
            col("theta_x").as("tb"))), col("src_a") < col("src_b"))
          .withColumn("theta", least(col("ta"), col("tb")))
          .withColumn("af", expr("filter(ka, x -> x < theta)"))
          .withColumn("bf", expr("filter(kb, x -> x < theta)"))
          .withColumn("n_common", size(expr("array_intersect(af, bf)")).cast("long"))
          .withColumn("n_theta_union", size(expr("array_union(af, bf)")).cast("long"))
          .withColumn("jaccard_est_milli", expr(
            "IF(n_theta_union = 0, CAST(0 AS BIGINT), (1000 * n_common) div n_theta_union)"))
          .select(col("src_a"), col("src_b"),
            size(col("ka")).cast("long").as("k_a"),
            size(col("kb")).cast("long").as("k_b"),
            col("n_common"), col("n_theta_union"), col("jaccard_est_milli"))
        // exact legs — the (source, gram)-distinct shuffles the sketch
        // replaces, kept for the oracle-visible accuracy proof
        val dg = SharedFrame(grams.distinct(), "d23_dg", d)
        val perSrc = dg.groupBy(col("source")).agg(count(lit(1)).as("nd"))
        val commonExact = dg.as("a")
          .join(dg.as("b"),
            col("a.h") === col("b.h") && col("a.source") < col("b.source"))
          .select(col("a.source").as("src_a"), col("b.source").as("src_b"))
          .groupBy(col("src_a"), col("src_b"))
          .agg(count(lit(1)).as("exact_common"))
        pairs
          .join(commonExact, Seq("src_a", "src_b"), "left")
          .join(perSrc.select(col("source").as("src_a"), col("nd").as("nd_a")),
            Seq("src_a"))
          .join(perSrc.select(col("source").as("src_b"), col("nd").as("nd_b")),
            Seq("src_b"))
          .withColumn("exact_common", coalesce(col("exact_common"), lit(0L)))
          .withColumn("exact_jaccard_milli",
            expr("(1000 * exact_common) div (nd_a + nd_b - exact_common)"))
          .select(col("src_a"), col("src_b"), col("k_a"), col("k_b"),
            col("n_common"), col("n_theta_union"), col("jaccard_est_milli"),
            col("exact_common"), col("exact_jaccard_milli"))
          .orderBy(col("src_a"), col("src_b"))
      },
      Some("""WITH toks AS (
             |  SELECT source,
             |    list_filter(str_split(lower(text), ' '), x -> x <> '') AS ts
             |  FROM documents),
             |grams AS (
             |  SELECT DISTINCT source,
             |    CAST('0x' || substr(md5(array_to_string(ts[i:i+5], ' ')), 1, 15)
             |         AS BIGINT) AS h
             |  FROM (SELECT source, ts,
             |          unnest(range(1, greatest(len(ts) - 5, 0) + 1)) AS i
             |        FROM toks)),
             |rk AS (
             |  SELECT source, h,
             |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn
             |  FROM grams),
             |sk AS (
             |  SELECT source, list(h ORDER BY h) AS ks
             |  FROM rk WHERE rn <= 64 GROUP BY source),
             |th AS (
             |  SELECT source, ks,
             |    CASE WHEN len(ks) < 64 THEN 1152921504606846976
             |         ELSE ks[-1] END AS theta_x
             |  FROM sk),
             |pr AS (
             |  SELECT a.source AS src_a, b.source AS src_b,
             |    CAST(len(a.ks) AS BIGINT) AS k_a, CAST(len(b.ks) AS BIGINT) AS k_b,
             |    list_filter(a.ks, x -> x < least(a.theta_x, b.theta_x)) AS af,
             |    list_filter(b.ks, x -> x < least(a.theta_x, b.theta_x)) AS bf
             |  FROM th a JOIN th b ON a.source < b.source),
             |est AS (
             |  SELECT src_a, src_b, k_a, k_b,
             |    CAST(len(list_intersect(af, bf)) AS BIGINT) AS n_common,
             |    CAST(len(list_distinct(list_concat(af, bf))) AS BIGINT)
             |      AS n_theta_union
             |  FROM pr),
             |nd AS (SELECT source, CAST(count(*) AS BIGINT) AS nd
             |       FROM grams GROUP BY source),
             |ce AS (
             |  SELECT a.source AS src_a, b.source AS src_b,
             |    CAST(count(*) AS BIGINT) AS exact_common
             |  FROM grams a JOIN grams b ON a.h = b.h AND a.source < b.source
             |  GROUP BY 1, 2)
             |SELECT e.src_a, e.src_b, e.k_a, e.k_b, e.n_common, e.n_theta_union,
             |  CAST(CASE WHEN e.n_theta_union = 0 THEN 0
             |       ELSE (1000 * e.n_common) // e.n_theta_union END AS BIGINT)
             |    AS jaccard_est_milli,
             |  CAST(coalesce(ce.exact_common, 0) AS BIGINT) AS exact_common,
             |  CAST((1000 * coalesce(ce.exact_common, 0))
             |    // (na.nd + nb.nd - coalesce(ce.exact_common, 0)) AS BIGINT)
             |    AS exact_jaccard_milli
             |FROM est e
             |LEFT JOIN ce ON ce.src_a = e.src_a AND ce.src_b = e.src_b
             |JOIN nd na ON na.source = e.src_a
             |JOIN nd nb ON nb.source = e.src_b
             |ORDER BY e.src_a, e.src_b""".stripMargin),
      doc = "sketch/KMV theta source overlap — per-source bottom-64 distinct 6-gram hashes via a map-side-combining typed Aggregator (≤64 longs/source/partition vs the ranking window's full sort), theta-cut pairwise jaccard estimates in integer milli; sketch entries and estimates fully oracle-exact, exact (source,gram) legs ride along as the accuracy proof"),

    // D24: AMS F2 sketch (Alon, Matias & Szegedy 1996) — the SKEW /
    // join-size member of the sketch family: F2 = Σ f_tok² is exactly
    // the self-join size of the token stream, the signal that tells a
    // planner whether a key distribution needs salting (the w6-w8
    // mitigations) or a plain hash join. The sketch is 32 sign
    // counters per lang, counter_s = Σ σ_s(tok) with σ_s = ±1 read
    // from BIT s of ONE md5 60-bit digest (one hash per token, not 32
    // — d20's row-hash lesson applied before it was paid); E[c_s²] =
    // F2. Counters are LINEAR in the stream: additive, order- and
    // merge-order-independent, map-side combinable (32 longs per lang
    // per partition), and therefore fully oracle-exact — the oracle
    // hashes every counter's square sum, not a law. The exact F2 leg
    // (the (lang, tok) shuffle the sketch replaces) rides along as the
    // accuracy proof; abs_err_milli stays division-safe (abs before
    // div — Spark div truncates, DuckDB // floors; they agree only on
    // non-negatives). int64 bound: c ≤ n_tokens and f² ≤ F2, so the
    // arithmetic is exact up to ~3e9 tokens per lang; beyond that a
    // production variant widens to double/128-bit.
    QueryDef(
      "d24_ams_f2_skew",
      (s, d) => {
        // counters leg = the shared batch/stream definition
        val docs = T.documents(s, d)
        val toks = docs
          .select(col("lang"),
            explode(filter(split(lower(col("text")), " "), x => x =!= ""))
              .as("tok"))
        val sk = amsCounters(docs).groupBy(col("lang"))
          .agg(sum(col("c") * col("c")).as("sum_sq"))
          .withColumn("est_f2", expr("sum_sq div 32"))
        val ex = toks.groupBy(col("lang"), col("tok"))
          .agg(count(lit(1)).as("f"))
          .groupBy(col("lang"))
          .agg(sum(col("f") * col("f")).as("exact_f2"),
            sum(col("f")).as("n_tokens"))
        sk.join(ex, Seq("lang"))
          .select(col("lang"), col("n_tokens"), col("est_f2"),
            col("exact_f2"),
            expr("(abs(est_f2 - exact_f2) * 1000) div exact_f2")
              .as("abs_err_milli"))
          .orderBy(col("lang"))
      },
      Some("""WITH toks AS (
             |  SELECT lang,
             |    unnest(list_filter(str_split(lower(text), ' '), x -> x <> ''))
             |      AS tok
             |  FROM documents),
             |h AS (
             |  SELECT lang, tok,
             |    CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS hv
             |  FROM toks),
             |sgn AS (
             |  SELECT lang, sx,
             |    1 - 2 * CAST((hv // (CAST(1 AS BIGINT) << CAST(sx AS INT))) % 2
             |      AS BIGINT) AS sig
             |  FROM h, (SELECT unnest(range(0, 32)) AS sx)),
             |counters AS (
             |  SELECT lang, sx, CAST(sum(sig) AS BIGINT) AS c
             |  FROM sgn GROUP BY lang, sx),
             |sk AS (
             |  SELECT lang, CAST(sum(c * c) AS BIGINT) AS sum_sq
             |  FROM counters GROUP BY lang),
             |ex AS (
             |  SELECT lang, CAST(sum(f * f) AS BIGINT) AS exact_f2,
             |    CAST(sum(f) AS BIGINT) AS n_tokens
             |  FROM (SELECT lang, tok, CAST(count(*) AS BIGINT) AS f
             |        FROM toks GROUP BY lang, tok)
             |  GROUP BY lang)
             |SELECT sk.lang, ex.n_tokens,
             |  CAST(sk.sum_sq // 32 AS BIGINT) AS est_f2, ex.exact_f2,
             |  CAST((abs(sk.sum_sq // 32 - ex.exact_f2) * 1000) // ex.exact_f2
             |    AS BIGINT) AS abs_err_milli
             |FROM sk JOIN ex USING (lang) ORDER BY sk.lang""".stripMargin),
      doc = "sketch/AMS F2 skew — 32 linear sign counters per lang (signs from bits of one md5 digest), est F2 = mean counter²; F2 IS the token self-join size, the salting/skew planner signal; counters additive and fully oracle-exact, exact F2 leg rides as the accuracy proof"),

    // D25: exact substring dedup (Lee et al. 2021, "Deduplicating
    // Training Data Makes Language Models Better", ExactSubstr) — the
    // last canonical dedup member: d9/d9b FLAG cross-document gram
    // coverage; ExactSubstr EDITS — keep ONE canonical occurrence of
    // every long exact repeat and emit removal spans for the rest,
    // and repeats WITHIN one document count (d9's docs_with > 1 grain
    // misses self-repeats by construction). The paper builds a corpus
    // suffix array; the distributed-equivalent bounded variant is
    // anchor-gram keep-first: any exact repeat of ≥ L tokens is, at
    // every one of its positions, an n-gram (n ≤ L) that also occurs
    // at the matching position of the repeat's other copy — so marking
    // every NON-FIRST occurrence of each n-gram (first = min
    // (doc_id, pos), the suffix-array rank-0 analogue), merging marked
    // coverage per doc (d9b's gaps-and-islands), and keeping spans of
    // ≥ L tokens yields removal spans that COVER every all-but-first
    // copy of every ≥L-token exact repeat (coverage-complete; the spec
    // pins it against a brute-force window scan). Conservative the
    // other way only at gram granularity: a merged span can bridge two
    // distinct shorter repeats — the same over-merge d9b accepts.
    // Scale shape: grams are 8-byte digests BEFORE the shuffle
    // (hashed_ngrams kernel); canonical selection is d1's keep-min
    // discipline on the digest partition (row_number over
    // (doc_id, pos) — one digest-keyed exchange, no join back); the
    // island merge is a doc-keyed window. Hot boilerplate digests
    // inherit d9b's documented skew posture (Skew.saltedJoin /
    // materialize-first when a digest approaches every-doc frequency).
    QueryDef(
      "d25_exact_substring_dedup",
      (s, d) => {
        graft.functions.GraftExtensions.registerInto(s)
        val n = 6
        val L = 15
        val toks = filter(split(lower(col("text")), " "), x => x =!= "")
        val base = T.documents(s, d).select(col("doc_id"), toks.as("ts"))
        val grams = base
          .select(col("doc_id"),
            posexplode(expr(s"hashed_ngrams(ts, $n)")).as(Seq("pos0", "h")))
          .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("h"))
        // every occurrence of a digest EXCEPT the corpus-first one is
        // removable coverage; rn > 1 exists only when the digest
        // repeats, so no separate count filter
        val removable = grams
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("h")).orderBy(col("doc_id"), col("pos"))))
          .filter(col("rn") > 1)
          .select(col("doc_id"), col("pos"))
        islandSpans(removable, n)
          .filter(col("n_tokens") >= L)
          .orderBy(col("doc_id"), col("span_start"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(str_split(lower(text), ' '), x -> x <> '') AS ts
             |  FROM documents),
             |pos AS (
             |  SELECT doc_id, ts, unnest(range(1, greatest(len(ts) - 4, 1))) AS i FROM toks),
             |grams AS (
             |  SELECT doc_id, i, md5(array_to_string(ts[i : i + 5], ' ')) AS h FROM pos),
             |rem AS (
             |  SELECT doc_id, i AS p FROM (
             |    SELECT doc_id, i,
             |      row_number() OVER (PARTITION BY h ORDER BY doc_id, i) AS rn
             |    FROM grams)
             |  WHERE rn > 1),
             |isl AS (
             |  SELECT doc_id, p,
             |    CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p) IS NULL THEN 1
             |         WHEN p > lag(p) OVER (PARTITION BY doc_id ORDER BY p) + 6 THEN 1
             |         ELSE 0 END AS new_island
             |  FROM rem),
             |grp AS (
             |  SELECT doc_id, p,
             |    sum(new_island) OVER (PARTITION BY doc_id ORDER BY p
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
             |  FROM isl)
             |SELECT doc_id,
             |  CAST(min(p) AS BIGINT) AS span_start,
             |  CAST(max(p) + 5 AS BIGINT) AS span_end,
             |  CAST(max(p) + 5 - min(p) + 1 AS BIGINT) AS n_tokens
             |FROM grp GROUP BY doc_id, island
             |HAVING max(p) + 5 - min(p) + 1 >= 15
             |ORDER BY doc_id, span_start""".stripMargin),
      doc = "dedup/exact substring removal (Lee et al. 2021 ExactSubstr, bounded anchor-gram variant) — keep-first canonical occurrence per gram digest, within-doc repeats count, merged removal spans of >= 15 tokens; coverage-complete for every >=L-token exact repeat (spec pins vs brute force)")
  )
}
