package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing scratchpad: times the building blocks of the heavy
  * bench queries so optimization effort lands where the seconds are.
  * `runMain graft.TimeAudit [sfDir]`.
  */
object TimeAudit {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftExtensions.registerInto(spark)

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[audit] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val normSql = "regexp_replace(trim(lower(text)), ' +', ' ')"
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("lang"), floor(col("n_chars") / 32).as("lb"),
        col("doc_id"), expr(normSql).as("nt"))
      .withColumn("g", expr(
        """CASE WHEN length(nt) < 3 THEN CAST(array() AS ARRAY<BIGINT>)
          |ELSE array_sort(array_distinct(transform(sequence(1, length(nt) - 2),
          |       i -> xxhash64(substring(nt, i, 3))))) END""".stripMargin))
      .drop("nt")

    // warmup
    time("warmup_scan")(spark.read.parquet(s"$d/documents.parquet").count())
    time("d4_norm_only")(spark.read.parquet(s"$d/documents.parquet")
      .select(expr(normSql).as("nt")).agg(sum(length(col("nt")))).collect())
    time("d4_trigrams")(docs.agg(sum(size(col("g")))).collect())
    time("d4_trigrams_again")(docs.agg(sum(size(col("g")))).collect())
    val a = docs.select(col("lang"), col("lb"), col("doc_id").as("id1"), col("g").as("g1"))
    val b = docs.select(col("lang").as("l2"), col("lb").as("lb2"),
      col("doc_id").as("id2"), col("g").as("g2"))
    val joined = a.join(b, col("lang") === col("l2") && col("lb") === col("lb2") &&
        col("id1") < col("id2"))
      .withColumn("inter", expr("sorted_intersect_size(g1, g2)"))
      .withColumn("jaccard",
        col("inter").cast("double") / (size(col("g1")) + size(col("g2")) - col("inter")))
      .filter(col("jaccard") >= 0.35)
    time("d4_pair_join")(joined.count())
    time("d4_full_with_sort")(joined
      .select(col("lang"), col("id1"), col("id2"), col("jaccard"))
      .orderBy(col("lang"), col("id1"), col("id2")).count())

    // variant A: split/filter/join normalization instead of the regex
    val normB = "array_join(filter(split(trim(lower(text)), ' '), x -> x != ''), ' ')"
    time("d4_norm_splitjoin")(spark.read.parquet(s"$d/documents.parquet")
      .select(expr(normB).as("nt")).agg(sum(length(col("nt")))).collect())
    // sanity: byte-identical to the regex form
    time("d4_norm_equal_check") {
      val n = spark.read.parquet(s"$d/documents.parquet")
        .select(expr(normSql).as("x"), expr(normB).as("y"))
        .filter(col("x") =!= col("y")).count()
      println(s"[audit] norm mismatch rows: $n")
    }

    // variant B: pre-repartition on the block key so ReuseExchange
    // computes the trigram pipeline once for both join sides
    val docsB = spark.read.parquet(s"$d/documents.parquet")
      .select(col("lang"), floor(col("n_chars") / 32).as("lb"),
        col("doc_id"), expr(normB).as("nt"))
      .withColumn("g", expr(
        """CASE WHEN length(nt) < 3 THEN CAST(array() AS ARRAY<BIGINT>)
          |ELSE array_sort(array_distinct(transform(sequence(1, length(nt) - 2),
          |       i -> xxhash64(substring(nt, i, 3))))) END""".stripMargin))
      .drop("nt")
      .repartition(col("lang"), col("lb"))
    val aB = docsB.select(col("lang"), col("lb"), col("doc_id").as("id1"), col("g").as("g1"))
    val bB = docsB.select(col("lang").as("l2"), col("lb").as("lb2"),
      col("doc_id").as("id2"), col("g").as("g2"))
    val joinedB = aB.join(bB, col("lang") === col("l2") && col("lb") === col("lb2") &&
        col("id1") < col("id2"))
      .withColumn("inter", expr("sorted_intersect_size(g1, g2)"))
      .withColumn("jaccard",
        col("inter").cast("double") / (size(col("g1")) + size(col("g2")) - col("inter")))
      .filter(col("jaccard") >= 0.35)
    time("d4_variantB_join")(joinedB.count())
    time("d4_variantB_full")(joinedB
      .select(col("lang"), col("id1"), col("id2"), col("jaccard"))
      .orderBy(col("lang"), col("id1"), col("id2")).count())
    val planB = joinedB.queryExecution.executedPlan.toString
    println(s"[audit] variantB exchanges: ${"(?<!Reused)Exchange".r.findAllIn(planB).length}, " +
      s"reused: ${"ReusedExchange".r.findAllIn(planB).length}")

    // variant C: split-norm only, no pre-repartition
    val docsC = spark.read.parquet(s"$d/documents.parquet")
      .select(col("lang"), floor(col("n_chars") / 32).as("lb"),
        col("doc_id"), expr(normB).as("nt"))
      .withColumn("g", expr(
        """CASE WHEN length(nt) < 3 THEN CAST(array() AS ARRAY<BIGINT>)
          |ELSE array_sort(array_distinct(transform(sequence(1, length(nt) - 2),
          |       i -> xxhash64(substring(nt, i, 3))))) END""".stripMargin))
      .drop("nt")
    val aC = docsC.select(col("lang"), col("lb"), col("doc_id").as("id1"), col("g").as("g1"))
    val bC = docsC.select(col("lang").as("l2"), col("lb").as("lb2"),
      col("doc_id").as("id2"), col("g").as("g2"))
    val joinedC = aC.join(bC, col("lang") === col("l2") && col("lb") === col("lb2") &&
        col("id1") < col("id2"))
      .withColumn("inter", expr("sorted_intersect_size(g1, g2)"))
      .withColumn("jaccard",
        col("inter").cast("double") / (size(col("g1")) + size(col("g2")) - col("inter")))
      .filter(col("jaccard") >= 0.35)
    time("d4_variantC_full")(joinedC
      .select(col("lang"), col("id1"), col("id2"), col("jaccard"))
      .orderBy(col("lang"), col("id1"), col("id2")).count())
    // interleaved repeats: host contention swamps single measurements
    for (r <- 1 to 2) {
      time(s"d4_variantB_full_r$r")(joinedB
        .select(col("lang"), col("id1"), col("id2"), col("jaccard"))
        .orderBy(col("lang"), col("id1"), col("id2")).count())
      time(s"d4_variantC_full_r$r")(joinedC
        .select(col("lang"), col("id1"), col("id2"), col("jaccard"))
        .orderBy(col("lang"), col("id1"), col("id2")).count())
    }

    // ---- d2 stages ----
    {
      import graft.functions.Sketches
      val shingleUdf = udf((text: String) =>
        if (text == null) Array.empty[String]
        else {
          val toks = text.toLowerCase.split(" +").filter(_.nonEmpty)
          if (toks.length < 2) toks
          else toks.sliding(2).map(_.mkString(" ")).toArray.distinct
        })
      val bandsUdf = udf((sh: Seq[String]) =>
        Sketches.bandKeys(Sketches.minHash(sh, 32), 4))
      val base = spark.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"), shingleUdf(col("text")).as("shingles"))
      time("d2_shingles_only")(base.agg(sum(size(col("shingles")))).collect())
      time("d2_shingles_bands")(base.withColumn("bands", bandsUdf(col("shingles")))
        .agg(sum(size(col("bands")))).collect())
      time("d2_shingles_hs")(base.withColumn("hs",
          expr("array_sort(transform(shingles, x -> xxhash64(x)))"))
        .agg(sum(size(col("hs")))).collect())
      time("d2_full")(SparkEntry.queries("d2_minhash_lsh")(spark, d).count())
      time("d2_full_again")(SparkEntry.queries("d2_minhash_lsh")(spark, d).count())
    }

    // ---- r5 sketch kernels vs the UDF forms they replaced ----
    {
      import graft.functions.Sketches
      val raw = spark.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"), col("text"))
      val shingleUdf = udf((text: String) =>
        if (text == null) Array.empty[String]
        else {
          val toks = text.toLowerCase.split(" +").filter(_.nonEmpty)
          if (toks.length < 2) toks
          else toks.sliding(2).map(_.mkString(" ")).toArray.distinct
        })
      val bandsUdf = udf((sh: Seq[String]) =>
        Sketches.bandKeys(Sketches.minHash(sh, 32), 4))
      val udfForm = raw
        .select(col("doc_id"), shingleUdf(col("text")).as("sh"))
        .select(col("doc_id"), bandsUdf(col("sh")).as("bands"))
      val kernelForm = operators.PipelineOps.minhashSignatures(raw)
        .select(col("doc_id"), col("bands"))
      for (r <- 1 to 2) {
        time(s"minhash_udf_form_r$r")(udfForm
          .agg(sum(expr("bands[0]"))).collect())
        time(s"minhash_kernel_form_r$r")(kernelForm
          .agg(sum(expr("bands[0]"))).collect())
      }
      val mismatch = udfForm.select(col("doc_id"), col("bands").as("b1"))
        .join(kernelForm.select(col("doc_id"), col("bands").as("b2")), "doc_id")
        .filter(col("b1") =!= col("b2")).count()
      println(s"[audit] minhash band mismatch rows: $mismatch")
      val simUdf = udf((text: String) =>
        Sketches.simHash(
          if (text == null) Seq.empty[String]
          else text.toLowerCase.split(" +").filter(_.nonEmpty).toSeq))
      for (r <- 1 to 2) {
        // bit_count keeps the ANSI sum in range (raw 64-bit sigs overflow)
        time(s"simhash_udf_r$r")(raw
          .select(simUdf(col("text")).as("s"))
          .agg(sum(expr("bit_count(s)"))).collect())
        time(s"simhash_kernel_r$r")(raw
          .select(expr("simhash64(coalesce(text, ''))").as("s"))
          .agg(sum(expr("bit_count(s)"))).collect())
      }
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      val hypUdf = udf((v: Seq[Float]) => Sketches.hyperplaneSignature(v.toArray, 32))
      for (r <- 1 to 2) {
        time(s"hyperplane_udf_r$r")(emb
          .select(hypUdf(col("embedding")).as("s")).agg(sum("s")).collect())
        time(s"hyperplane_kernel_r$r")(emb
          .select(expr("hyperplane_sig(embedding, 32)").as("s"))
          .agg(sum("s")).collect())
      }
    }

    // ---- x2/x3 shared positional frame ----
    {
      val x2 = SparkEntry.queries("x2_rgp_mine")(spark, d)
      val plan = x2.queryExecution.executedPlan.toString
      println(s"[audit] x2 row_number windows in plan: " +
        s"${"row_number".r.findAllIn(plan).length}, " +
        s"InMemoryTableScan: ${"InMemoryTableScan".r.findAllIn(plan).length}, " +
        s"events scans: ${"events.parquet".r.findAllIn(plan).length}")
      time("x2_cold")(x2.count())
      time("x2_warm_cache")(SparkEntry.queries("x2_rgp_mine")(spark, d).count())
      time("x3_shares_cache")(SparkEntry.queries("x3_anchor_phylo")(spark, d).count())
    }

    // ---- m-family real PNG codec: batched reader vs per-row ImageIO ----
    // decode cost only (the encoded frame is persisted + materialized
    // first); the delta is what one-reader-per-batch amortization buys
    // over the ImageIO.read convenience path's per-image reader
    // construction + plugin-registry scan.
    {
      import graft.functions.PngCodec
      import spark.implicits._
      val png = spark.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id")).as[Long]
        .flatMap(id => (0 until 20).map(k => id * 131 + k)) // ~20× corpus
        .mapPartitions(_.map(id => (id, PngCodec.synthesize(id))))
        .toDF("doc_id", "png").persist()
      time("png_encode_materialize")(png.count())
      for (r <- 1 to 2) {
        time(s"png_decode_batched_r$r")(png.as[(Long, Array[Byte])]
          .mapPartitions(_.grouped(64).flatMap(b =>
            PngCodec.decodeBatch(b)((id, _, _, px) => (id, px.foldLeft(0L)(_ + _)))))
          .toDF("id", "s").agg(sum("s")).collect())
        time(s"png_decode_perrow_r$r")(png.as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, bytes) =>
            val (_, _, px) = PngCodec.decodeOne(bytes)
            (id, px.foldLeft(0L)(_ + _))
          })
          .toDF("id", "s").agg(sum("s")).collect())
      }
      png.unpersist(): Unit
    }

    // ---- d4 dispatch crossover: blocked quadratic vs PrefixJoin ----
    // The d4 size dispatch (PipelineOps, footerRowCount threshold) was
    // asserted lossless but never TIMED past sf0.1; this measures both
    // branches on 1x/2x/4x/8x corpora (5k -> 40k docs). Replica tokens
    // are hashed per rep LENGTH-PRESERVINGLY, so replicas are ~disjoint
    // across reps (no fake cross-rep duplicate pairs inflating the
    // output) but keep their original length — hence the SAME (lang, lb)
    // blocks: growing N grows block SIZES, the regime the dispatch
    // guards against (a variant with free-length hashes, which spreads
    // replicas into fresh length buckets instead, measured quadratic
    // 0.74/0.96/1.93/7.73 s vs prefix 9.9/13.4/10.0/75.6 s at 1/2/4/8x —
    // when blocks stay small the quadratic wins at every N; see
    // NOTES_r7).
    {
      import graft.operators.PrefixJoin
      def corpus(k: Int) = {
        val base = spark.read.parquet(s"$d/documents.parquet")
          .select(col("lang"), col("doc_id"), col("text"))
          .withColumn("rep", explode(expr(s"sequence(0, ${k - 1})")))
          .withColumn("text",
            when(col("rep") === 0, col("text"))
              .otherwise(expr("""array_join(transform(
                  filter(split(lower(text), ' '), x -> x != ''),
                  t -> substring(repeat(hex(xxhash64(concat(t, CAST(rep AS STRING)))), 3),
                                 1, length(t))), ' ')""")))
          .withColumn("doc_id", col("doc_id") * 16 + col("rep"))
        base
          .select(col("lang"), floor(length(col("text")) / 32).as("lb"),
            col("doc_id"), expr(normSql).as("nt"))
          .withColumn("g", expr(
            """CASE WHEN length(nt) < 3 THEN CAST(array() AS ARRAY<BIGINT>)
              |ELSE array_sort(array_distinct(transform(sequence(1, length(nt) - 2),
              |       i -> xxhash64(substring(nt, i, 3))))) END""".stripMargin))
          .drop("nt")
          .repartition(col("lang"), col("lb"))
          .persist()
      }
      for (k <- Seq(1, 2, 4, 8)) {
        val docs = corpus(k)
        val n = docs.count() // materialize untimed
        val a = docs.select(col("lang"), col("lb"), col("doc_id").as("id1"), col("g").as("g1"))
        val b = docs.select(col("lang").as("l2"), col("lb").as("lb2"),
          col("doc_id").as("id2"), col("g").as("g2"))
        val quad = a.join(b, col("lang") === col("l2") && col("lb") === col("lb2") &&
            col("id1") < col("id2"))
          .withColumn("inter", expr("sorted_intersect_size(g1, g2)"))
          .withColumn("jaccard", col("inter").cast("double") /
            (size(col("g1")) + size(col("g2")) - col("inter")))
          .filter(col("jaccard") >= 0.35)
        time(s"d4_quadratic_${k}x_n$n")(quad.count())
        time(s"d4_prefixjoin_${k}x_n$n")(
          PrefixJoin.jaccardPairs(docs, "doc_id", "g", Seq("lang", "lb"), 0.35).count())
        docs.unpersist(): Unit
      }
    }

    spark.stop()
  }
}
