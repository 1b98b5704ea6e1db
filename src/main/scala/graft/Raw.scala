package graft

/** Logger-bypassing stdout for the one-line JSON contracts (Bench,
  * Rehearsal): `sbt run` re-logs the forked JVM's println output with an
  * "[info] " prefix under the default LoggedOutput strategy, which made
  * the driver's tail parser reject the line in rounds 1-4. Writing to
  * fd 1 directly keeps the line bare regardless of sbt's output strategy.
  */
object Raw {
  lazy val stdout: java.io.PrintStream = new java.io.PrintStream(
    new java.io.FileOutputStream(java.io.FileDescriptor.out), true, "UTF-8")
}
