package graft.operators

import org.apache.spark.sql.SparkSession

/** Session-scoped scratch location for intra-query materialization — the
  * shuffle-boundary checkpoint pattern: write a small derived table once,
  * read it back, and release every upstream cache so iterative stages
  * (GraphX CC, multi-pass sketches) never leak state into later queries.
  *
  * Locally this lands under `java.io.tmpdir`; on a real cluster set
  * `graft.scratch.dir` to a cluster-visible path (HDFS/S3) — the
  * write/read-back pattern requires a filesystem all executors share.
  */
object Scratch {
  private val hooked = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()

  def dir(spark: SparkSession): String = {
    val explicit = spark.conf.getOption("graft.scratch.dir")
    val root = explicit.getOrElse(sys.props("java.io.tmpdir"))
    val d = s"$root/graft-scratch-${spark.sparkContext.applicationId}"
    // local default: reap the session's scratch on JVM exit so repeated
    // runs don't accumulate under /tmp. An explicit cluster scratch dir
    // is left alone — its lifecycle (quotas, TTL policies) is the
    // cluster's business, not a driver shutdown hook's.
    if (explicit.isEmpty && hooked.putIfAbsent(d, true) == null)
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(new java.io.File(d))))
    d
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
