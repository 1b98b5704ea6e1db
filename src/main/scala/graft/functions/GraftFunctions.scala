package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-facing registration of the engine's scalar function pack
  * (SURVEY §2.11). Idempotent; sessions call it once so both the DataFrame
  * API (`expr("cai(seq)")`) and `spark.sql` can use the functions.
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    GraftExtensions.registerInto(spark) // native Expression forms
    val u = spark.udf
    u.register("variation_encode", (seq: String, ref: String) => VariationCodec.encode(seq, ref))
    u.register("variation_decode", (v: String, ref: String) => VariationCodec.decode(v, ref))
    u.register("cai", (seq: String) =>
      Cai.caiForGene(seq).map(java.lang.Double.valueOf).orNull)
    u.register("gc_content", (seq: String) => Cai.gcContent(seq))
    u.register("welch_p", (t: Double, df: Double) => {
      val p = Stats.tTwoSidedP(t, df)
      if (p.isNaN) null.asInstanceOf[java.lang.Double] else java.lang.Double.valueOf(p)
    })
    u.register("welch_df",
      (sd1: Double, n1: Double, sd2: Double, n2: Double) => Stats.welchDf(sd1, n1, sd2, n2))
  }
}
