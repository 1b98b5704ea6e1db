package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (the 100 TB posture's manual
  * counterpart to AQE's skew-join split, for when a single key dwarfs a
  * partition): salt the probe side into `salts` sub-keys and replicate the
  * build side once per salt. Result is identical to the plain equi-join;
  * the hot key's rows spread over `salts` tasks.
  */
object Skew {

  /** Salted inner equi-join on `key`. `big` is the skewed probe side;
    * `small` (replicated ×salts) must be the dimension side.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    // deterministic scatter: hash of the whole row spreads a hot key's rows
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts)).cast("int"))
    val smallSalted = small.withColumn("__salt",
      explode(expr(s"sequence(0, ${salts - 1})")))
    bigSalted.join(smallSalted, Seq(key, "__salt")).drop("__salt")
  }
}
