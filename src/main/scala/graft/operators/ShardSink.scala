package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic training-shard writer — the physical last mile of
  * `x8_training_mix`: deal a curated corpus into `nShards` shards by the
  * same portable per-doc hash the mix sampler uses, and write one
  * directory per shard (`shard_id=K/`) with the shard's rows co-located
  * in one task.
  *
  * Scale notes:
  *  - shard membership is a pure function of the id column (no RNG, no
  *    row order), so a re-run — or an incremental append — lands every
  *    document in the same shard; downstream loaders can rely on it;
  *  - `repartition(nShards, shard_id)` keys the single shuffle on the
  *    shard id; each output directory is then written by the task(s)
  *    owning that hash bucket — no global sort, no driver collect;
  *  - the parquet `partitionBy` prunes per-shard reads for loaders that
  *    train shard-at-a-time.
  *
  * At real scale pick `nShards` so a shard ≈ a training-loader chunk
  * (hundreds of MB), not 8; the arithmetic is identical.
  */
object ShardSink {

  private val P = 1000000007L

  /** The t6/x8 portable per-id hash, exposed for read-side checks. */
  def sampleHash(id: Long): Long = ((id % P) * 2654435761L + 2246822519L) % P

  /** Writes `df` into `path` as `nShards` hash-sharded parquet
    * directories and returns the per-shard manifest (shard_id, n_rows)
    * read back from the written files — the written data, not the plan,
    * is what the manifest describes.
    */
  def writeTrainingShards(df: DataFrame, idCol: String, path: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val sharded = df.withColumn("shard_id",
      ((col(idCol) % P) * 2654435761L + 2246822519L) % P % nShards)
    sharded
      .repartition(nShards, col("shard_id"))
      .write.mode("overwrite")
      .partitionBy("shard_id")
      .parquet(path)
    df.sparkSession.read.parquet(path)
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("shard_id"))
  }

  /** The t9 sequence-packing layout written as physical training input:
    * docs hash-deal into `nShards` shards, concatenate in id order
    * within each shard, and every row carries the token offset where
    * the doc lands plus the `packTokens`-sized pack its first token
    * falls in. Rows are sorted (pack_id, tok_offset) WITHIN each
    * shard's files, so a loader streams packs sequentially without a
    * read-side sort. Returns the per-shard manifest (n_docs, n_packs,
    * n_tokens) read back from the written files.
    *
    * Scale notes (t9's): the per-shard prefix sum is one sequential
    * window per shard — at a fixed shard count that is nShards long
    * tasks at 100 TB, so production raises the shard count (packing is
    * shard-local; more shards = more parallelism, same layout law) or
    * routes the running sum through Skew.globalRowNumber's two-phase
    * chunked pattern, which generalizes verbatim from counts to sums.
    * Membership and offsets are pure functions of (id, token count), so
    * re-runs land bit-identically.
    */
  def writePackedSequences(df: DataFrame, idCol: String, textCol: String,
      path: String, nShards: Int, packTokens: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(packTokens > 0, s"packTokens must be positive, got $packTokens")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard_id")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("shard_id",
        ((col(idCol) % P) * 2654435761L + 2246822519L) % P % nShards)
      .withColumn("n_toks",
        size(filter(split(col(textCol), " "), x => x =!= "")).cast("long"))
      .filter(col("n_toks") > 0)
      .withColumn("cum", sum(col("n_toks")).over(w))
      .withColumn("tok_offset", col("cum") - col("n_toks"))
      .withColumn("pack_id", expr(s"tok_offset div $packTokens"))
      .drop("cum")
      .repartition(nShards, col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("pack_id"), col("tok_offset"))
      .write.mode("overwrite")
      .partitionBy("shard_id")
      .parquet(path)
    df.sparkSession.read.parquet(path)
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("pack_id")).as("n_packs"),
        sum(col("n_toks")).as("n_tokens"))
      .orderBy(col("shard_id"))
  }
}
