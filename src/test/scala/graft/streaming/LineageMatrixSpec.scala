package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Table-driven enumeration of the store-ownership state machine
  * (r11 verdict stretch #8): [[StreamingJobs.lineageGuard]] now sits
  * under four interacting guards (lineage marker, adoption conf,
  * rows-present, multi-grain rebase), and the streaming integration
  * tests pin six end-to-end scenarios — this spec pins the FULL
  * (marker-state × rows × adopt-conf) matrix at the unit level, so a
  * future re-ordering of the guards fails by named cell instead of
  * surfacing as a clobbered store in production.
  *
  * Matrix (marker ∈ {absent, same-lineage, foreign}; rows ∈ {yes, no};
  * adopt ∈ {off, on}):
  *
  * | marker  | rows | adopt | outcome                                    |
  * |---------|------|-------|--------------------------------------------|
  * | absent  | no   | off   | claim: marker stamped, false               |
  * | absent  | no   | on    | claim (adopt irrelevant), false            |
  * | absent  | yes  | off   | REFUSE (pre-marker populated store)        |
  * | absent  | yes  | on    | adopt: rebase to -1, re-stamp, true        |
  * | same    | no   | off   | no-op, false                               |
  * | same    | yes  | off   | no-op, false                               |
  * | same    | yes  | on    | no-op, false — adopt NEVER rebases an      |
  * |         |      |       | owned store (the conf is for foreign ones) |
  * | foreign | no   | off   | REFUSE (foreign lineage)                   |
  * | foreign | no   | on    | adopt empty-but-marked store: NO parquet   |
  * |         |      |       | read (nothing to rebase), re-stamp, true   |
  * | foreign | yes  | off   | REFUSE (foreign lineage)                   |
  * | foreign | yes  | on    | adopt: rebase to -1, re-stamp, true        |
  */
class LineageMatrixSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def write(path: String, content: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, content.getBytes("UTF-8")): Unit
  }

  /** A checkpoint dir whose streaming-query id is `id` (lineageId reads
    * the JSON `metadata` file Structured Streaming writes).
    */
  private def mkCkpt(root: String, id: String): String = {
    val d = s"$root/ckpt_$id"
    write(s"$d/metadata", s"""{"id":"$id"}""")
    d
  }

  private def mkStore(root: String, tag: String, marker: Option[String],
      rows: Boolean): String = {
    import spark.implicits._
    val d = s"$root/store_$tag"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
    marker.foreach(o => write(s"$d/_graft_lineage", o))
    if (rows)
      Seq((11L, 0L), (22L, 1L)).toDF("dg", "batch_id")
        .write.partitionBy("batch_id").mode("append").parquet(d)
    // a rows-bearing write re-creates the dir: restamp the marker after
    marker.foreach(o => write(s"$d/_graft_lineage", o))
    d
  }

  private def markerOf(store: String): Option[String] = {
    val p = java.nio.file.Paths.get(s"$store/_graft_lineage")
    if (java.nio.file.Files.exists(p))
      Some(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
    else None
  }

  private def guard(store: String, ckpt: String, rows: Boolean): Boolean =
    StreamingJobs.lineageGuard(spark, store, ckpt, storeHasRows = rows)

  private def withAdopt[T](on: Boolean)(body: => T): T =
    if (!on) body
    else {
      spark.conf.set("graft.stream.adoptStore", "true")
      try body finally spark.conf.unset("graft.stream.adoptStore")
    }

  // (name, marker owner [None/Some(SELF)/Some(other)], rows, adopt,
  //  expected: Right(adopted) | Left(error substring))
  private val SELF = "self"
  private case class Cell(name: String, marker: Option[String], rows: Boolean,
      adopt: Boolean, expect: Either[String, Boolean])

  private val matrix = Seq(
    Cell("absent/noRows/off", None, rows = false, adopt = false, Right(false)),
    Cell("absent/noRows/on", None, rows = false, adopt = true, Right(false)),
    Cell("absent/rows/off", None, rows = true, adopt = false,
      Left("carries no lineage marker")),
    Cell("absent/rows/on", None, rows = true, adopt = true, Right(true)),
    Cell("same/noRows/off", Some(SELF), rows = false, adopt = false, Right(false)),
    Cell("same/rows/off", Some(SELF), rows = true, adopt = false, Right(false)),
    Cell("same/rows/on", Some(SELF), rows = true, adopt = true, Right(false)),
    Cell("foreign/noRows/off", Some("other-lineage"), rows = false,
      adopt = false, Left("belongs to checkpoint lineage")),
    Cell("foreign/noRows/on", Some("other-lineage"), rows = false,
      adopt = true, Right(true)),
    Cell("foreign/rows/off", Some("other-lineage"), rows = true,
      adopt = false, Left("belongs to checkpoint lineage")),
    Cell("foreign/rows/on", Some("other-lineage"), rows = true,
      adopt = true, Right(true)))

  matrix.foreach { c =>
    test(s"lineage matrix: ${c.name}") {
      val root = java.nio.file.Files.createTempDirectory("graft_linmat").toString
      val ckpt = mkCkpt(root, "lin-A")
      val owner = c.marker.map(m => if (m == SELF) "lin-A" else m)
      val store = mkStore(root, c.name.replace('/', '_'), owner, c.rows)
      c.expect match {
        case Left(msg) =>
          val e = intercept[IllegalArgumentException] {
            withAdopt(c.adopt)(guard(store, ckpt, c.rows))
          }
          assert(e.getMessage.contains(msg), e.getMessage)
          // a refusal must leave the store untouched: marker unchanged,
          // rows (if any) still under their original batch ids
          assert(markerOf(store) == owner)
          if (c.rows)
            assert(spark.read.parquet(store).select("batch_id").distinct()
              .collect().map(_.getAs[Number](0).longValue).toSet == Set(0L, 1L))
        case Right(expectAdopted) =>
          val adopted = withAdopt(c.adopt)(guard(store, ckpt, c.rows))
          assert(adopted == expectAdopted, s"adopted=$adopted")
          // every proceed path ends with THIS lineage owning the store
          assert(markerOf(store).contains("lin-A"))
          if (c.rows) {
            val bids = spark.read.parquet(store).select("batch_id").distinct()
              .collect().map(_.getAs[Number](0).longValue).toSet
            if (expectAdopted)
              assert(bids == Set(-1L), s"adopted rows must rebase to -1: $bids")
            else
              assert(bids == Set(0L, 1L),
                s"an owned store must NEVER be rebased (adopt conf on or off): $bids")
          }
      }
    }
  }

  test("guard is idempotent: re-claiming an owned store across calls is a no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft_linmat2").toString
    val ckpt = mkCkpt(root, "lin-B")
    val store = s"$root/store"
    assert(!guard(store, ckpt, rows = false)) // claim
    assert(!guard(store, ckpt, rows = false)) // replay of batch 0
    assert(markerOf(store).contains("lin-B"))
  }
}
