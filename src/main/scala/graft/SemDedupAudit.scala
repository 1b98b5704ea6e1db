package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-split audit for the SemDeDup stage at corpus-rehearsal scale:
  * times the N×K centroid assignment and the Σ|cluster|² pair scan
  * SEPARATELY across K, with the per-K cluster balance — the numbers
  * behind the operator's K ≈ √N cost-balancing choice (assignment grows
  * with K, the pair scan shrinks). Replicates semDedup's internals the
  * way TimeAudit replicates d4's — a scratchpad, not a second code
  * path. `runMain graft.SemDedupAudit [nDocs]`.
  */
object SemDedupAudit {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.getOrElse("500000").toLong
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftExtensions.registerInto(spark)
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[semdedup-audit] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // the corpus rehearsal's deterministic embedding derivation
    val emb = CorpusRehearsal.embedQ(CorpusRehearsal.synthesize(spark, n))
      .withColumn("nn", expr("long_dot(q, q)"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("embed_materialize")(emb.count())

    for (k <- Seq(256, 512, 1024, 2048)) {
      val stride = math.max(1L, n / k)
      val cents = emb.filter(col("vec_id") % stride === 0)
        .select(col("vec_id").as("cid"), col("q").as("cq"), col("nn").as("cn"))
      val assigned = emb.join(broadcast(cents))
        .withColumn("sim", expr("long_dot(q, cq)").cast("double") /
          sqrt(col("nn").cast("double") * col("cn").cast("double")))
        .groupBy(col("vec_id"))
        .agg(max_by(struct(col("cid"), col("sim")),
          struct(col("sim"), -col("cid"))).as("b"))
        .select(col("vec_id"), col("b.cid").as("list_id"),
          floor(col("b.sim") * lit(1000000) + lit(0.5)).cast("long").as("cqc"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time(s"assign_K$k")(assigned.count())
      val bal = assigned.groupBy(col("list_id")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)), max(col("c")), sum(col("c") * col("c"))).collect()(0)
      println(s"[semdedup-audit] balance_K$k   clusters=${bal.getLong(0)} " +
        s"max=${bal.getLong(1)} sum_sq=${bal.getLong(2)}")
      val members = emb.join(assigned, "vec_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      members.count() // materialize untimed so the pair phase is isolated
      val m2 = members.select(col("list_id").as("l2"), col("vec_id").as("id2"),
        col("q").as("q2"), col("nn").as("n2"), col("cqc").as("p2"))
      time(s"pairs_K$k")(members
        .join(m2, col("list_id") === col("l2") && col("vec_id") =!= col("id2"))
        .withColumn("dot", expr("long_dot(q, q2)"))
        .withColumn("cos", col("dot").cast("double") /
          sqrt(col("nn").cast("double") * col("n2").cast("double")))
        .filter(col("cos") >= 0.9 &&
          (col("p2") < col("cqc") ||
            (col("p2") === col("cqc") && col("id2") < col("vec_id"))))
        .select(col("vec_id")).distinct().count())
      members.unpersist(blocking = true): Unit
      assigned.unpersist(blocking = true): Unit
    }
    emb.unpersist(blocking = true): Unit
    spark.stop()
  }
}
