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
}
