package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
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

  /** Skew-safe trailing RANGE window — the window-family counterpart to
    * [[saltedJoin]]. A plain `Window.partitionBy(key)` cannot split a key
    * (every frame needs its whole partition), so one pathological key
    * serializes into one long task (SkewSpec's documented bound). For
    * VALUE-RANGE trailing frames the key CAN be split, exactly:
    *
    *  - chunk the order axis into spans of `W = window × chunkFactor`
    *    (`__chunk = floor(ord / W)`, integer floor-div via pmod so
    *    negative ords chunk correctly);
    *  - duplicate each chunk's trailing `window`-span rows (`ord mod W >=
    *    W - window`) into the NEXT chunk, flagged as carries;
    *  - run the same `rangeBetween(-window, 0)` frame partitioned by
    *    `(key…, __chunk)` — a row at ord `t` in chunk `c` has frame
    *    `[t-window, t]`, and every frame row from chunk `c-1` satisfies
    *    the carry predicate (`t-window ≥ c·W - window`), so it is present
    *    in `c` as a carry; carry rows older than the frame are excluded
    *    by the RANGE bound itself;
    *  - keep only non-carry rows.
    *
    * Result is row-for-row identical to the plain per-key window (pinned
    * by SkewSpec), but the hot key's rows spread over `span(ord)/W`
    * tasks instead of one. Cost: the carry duplication, a fraction
    * `1/chunkFactor` of the input — the recall-free analogue of salting.
    * Only trailing frames qualify (a FOLLOWING bound would need carries
    * from the next chunk too); aggregates must be order-insensitive over
    * the frame SET (sum/count/min/max — anything exact), which is also
    * what bit-reproducibility across the two plans requires.
    *
    * `aggs` receives the chunked WindowSpec and returns the named output
    * columns; all input columns pass through.
    */
  def rangeRolling(df: DataFrame, keys: Seq[String], ordCol: Column,
      window: Long, chunkFactor: Int = 4)(
      aggs: WindowSpec => Seq[(String, Column)]): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(chunkFactor >= 1, s"chunkFactor must be >= 1, got $chunkFactor")
    val w = window * chunkFactor
    val base = df.withColumn("__ord", ordCol)
    // exact floor division in long arithmetic: (ord - pmod(ord, W)) div W
    // (Column./ on longs is double division — lossy past 2^53; `div` is
    // the integral operator, and subtracting pmod first floors any sign)
    val chunkOf = expr(s"(__ord - pmod(__ord, ${w}L)) div ${w}L")
    val cur = base
      .withColumn("__chunk", chunkOf)
      .withColumn("__carry", lit(false))
    val carry = base
      .filter(pmod(col("__ord"), lit(w)) >= w - window)
      .withColumn("__chunk", chunkOf + 1)
      .withColumn("__carry", lit(true))
    val spec = Window
      .partitionBy(keys.map(col) :+ col("__chunk"): _*)
      .orderBy(col("__ord"))
      .rangeBetween(-window, 0)
    val rolled = aggs(spec).foldLeft(cur.unionByName(carry)) {
      case (acc, (name, c)) => acc.withColumn(name, c)
    }
    rolled.filter(!col("__carry")).drop("__ord", "__chunk", "__carry")
  }
}
