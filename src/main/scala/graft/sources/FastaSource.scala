package graft.sources

import java.util
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StructType, StructField, StringType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 FASTA reader (SURVEY S5 polish): `spark.read.format
  * ("fasta").load(dirOrFile)` → rows (file, id, desc, seq).
  *
  * Handles the general format — multi-line sequences, whitespace-split
  * header (`>id desc...`) — unlike the alternating-line assumption the
  * reference's parser makes (pirateToDatabase.py:110-126). One input
  * partition per file: FASTA records cross line boundaries, so files are
  * the natural split unit (same reasoning as the wholeTextFiles readers);
  * a byte-range splitter that resynchronizes on '>' is the upgrade path
  * for few-huge-file corpora.
  */
class FastaSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "fasta"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FastaSource.schema

  // writes pass the dataframe's own schema through to the table (reads
  // still get the canonical FASTA schema from inferSchema)
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new FastaTable(properties.get("path"), schema)
}

object FastaSource {
  val schema: StructType = StructType(Seq(
    StructField("file", StringType), StructField("id", StringType),
    StructField("desc", StringType), StructField("seq", StringType)))
}

class FastaTable(path: String, tblSchema: StructType) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"fasta($path)"
  override def schema(): StructType = tblSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = FastaSource.schema
      override def toBatch: Batch = new FastaBatch(path)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new FastaWriteBuilder(path, info.schema(), truncate = false)
}

/** DSv2 FASTA sink (SURVEY S9 as a first-class source): `df.write
  * .format("fasta").mode("overwrite").save(dir)` — one `part-N.fasta`
  * file per input partition (so `df.repartition(col)` controls the file
  * layout), records wrapped at 70 columns. Input needs string columns
  * `id`, `seq` and optionally `desc`; tasks write to hidden temp files
  * and the driver-side commit renames them, so failed/speculative tasks
  * never leave partial output.
  */
class FastaWriteBuilder(path: String, schema: StructType, truncate: Boolean)
    extends WriteBuilder with SupportsTruncate {

  override def truncate(): WriteBuilder = new FastaWriteBuilder(path, schema, truncate = true)

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val idIdx = schema.fieldIndex("id") // throws with a clear message if absent
      val seqIdx = schema.fieldIndex("seq")
      val descIdx = if (schema.fieldNames.contains("desc")) schema.fieldIndex("desc") else -1
      new FastaBatchWrite(path, idIdx, descIdx, seqIdx, truncate)
    }
  }
}

class FastaBatchWrite(path: String, idIdx: Int, descIdx: Int, seqIdx: Int,
    truncate: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    if (truncate && fs.exists(dir))
      fs.listStatus(dir).filter(_.isFile).foreach(st => fs.delete(st.getPath, false))
    fs.mkdirs(dir)
    // executors must see the SESSION's Hadoop conf (fs credentials,
    // defaultFS, custom schemes) — a bare `new Configuration()` on the
    // task side could resolve a different filesystem than this commit side
    FastaWriterFactory(path, idIdx, descIdx, seqIdx, HadoopConfBox(conf))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)
    messages.foreach { case FastaCommit(tmp, fin) =>
      val t = new Path(tmp)
      if (fs.exists(t)) {
        if (!fs.rename(t, new Path(fin)))
          throw new java.io.IOException(s"fasta sink: could not commit $tmp -> $fin")
      } else if (!fs.exists(new Path(fin))) {
        // a missing tmp is only legal when the final file already exists
        // (idempotent retry of a committed task) — otherwise a lost task
        // output would commit as silently missing data
        throw new java.io.IOException(
          s"fasta sink: task output $tmp vanished before commit (and $fin absent)")
      }
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)
    messages.filter(_ != null).foreach { case FastaCommit(tmp, _) =>
      fs.delete(new Path(tmp), false)
    }
  }
}

case class FastaCommit(tmpFile: String, finalFile: String) extends WriterCommitMessage

/** Java-serializable Hadoop Configuration carrier (Configuration itself is
  * Writable but not Serializable).
  */
class HadoopConfBox(@transient private var conf: Configuration) extends Serializable {
  def value: Configuration = conf
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new Configuration(false)
    conf.readFields(in)
  }
}
object HadoopConfBox { def apply(c: Configuration) = new HadoopConfBox(c) }

case class FastaWriterFactory(path: String, idIdx: Int, descIdx: Int, seqIdx: Int,
    conf: HadoopConfBox) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new FastaDataWriter(path, partitionId, taskId, idIdx, descIdx, seqIdx, conf.value)
}

class FastaDataWriter(path: String, partitionId: Int, taskId: Long,
    idIdx: Int, descIdx: Int, seqIdx: Int, conf: Configuration)
    extends DataWriter[InternalRow] {

  // taskId in the FINAL name too: append-mode writes into a non-empty
  // directory must not collide with an earlier write's part files
  private val tmp = new Path(path, f".part-$partitionId%05d-$taskId.fasta.tmp")
  private val fin = new Path(path, f"part-$partitionId%05d-$taskId.fasta")
  private val fs = tmp.getFileSystem(conf)
  private val out = new java.io.BufferedWriter(
    new java.io.OutputStreamWriter(fs.create(tmp, true), "UTF-8"))

  override def write(row: InternalRow): Unit = {
    val id = row.getUTF8String(idIdx)
    val desc = if (descIdx >= 0 && !row.isNullAt(descIdx))
      row.getUTF8String(descIdx).toString else ""
    out.write(">")
    out.write(if (id == null) "" else id.toString)
    if (desc.nonEmpty) { out.write(" "); out.write(desc) }
    out.write("\n")
    val seq = if (row.isNullAt(seqIdx)) "" else row.getUTF8String(seqIdx).toString
    var i = 0
    while (i < seq.length) {
      out.write(seq, i, math.min(70, seq.length - i))
      out.write("\n")
      i += 70
    }
    if (seq.isEmpty) out.write("\n")
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    FastaCommit(tmp.toString, fin.toString)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(tmp, false)
  }

  override def close(): Unit = ()
}

case class FastaInputPartition(file: String) extends InputPartition

class FastaBatch(path: String) extends Batch {
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(_.isFile).map(_.getPath.toString)
          // Spark hidden-file convention — also skips uncommitted .tmp
          // output from a crashed FastaDataWriter
          .filterNot(f => { val n = f.split('/').last
            n.startsWith(".") || n.startsWith("_") })
      else Array(p.toString)
    files.sorted.map(f => FastaInputPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = HadoopConfBox(SparkSession.active.sparkContext.hadoopConfiguration)
    (partition: InputPartition) =>
      new FastaPartitionReader(partition.asInstanceOf[FastaInputPartition].file, conf.value)
  }
}

/** Streams one file; emits a row per '>' record, concatenating body lines. */
class FastaPartitionReader(file: String, conf: Configuration)
    extends PartitionReader[InternalRow] {
  private val fs = new Path(file).getFileSystem(conf)
  private val in = new java.io.BufferedReader(
    new java.io.InputStreamReader(fs.open(new Path(file)), "UTF-8"))
  private var pendingHeader: String = null
  private var current: InternalRow = _

  override def next(): Boolean = {
    // advance to the first/next header
    if (pendingHeader == null) {
      var line = in.readLine()
      while (line != null && !line.startsWith(">")) line = in.readLine()
      pendingHeader = line
    }
    if (pendingHeader == null) return false
    val header = pendingHeader.substring(1).trim
    val seq = new StringBuilder
    var line = in.readLine()
    while (line != null && !line.startsWith(">")) {
      seq.append(line.trim)
      line = in.readLine()
    }
    pendingHeader = line // null at EOF
    val sp = header.indexOf(' ')
    val (id, desc) = if (sp < 0) (header, "") else (header.take(sp), header.drop(sp + 1))
    current = InternalRow(
      UTF8String.fromString(file), UTF8String.fromString(id),
      UTF8String.fromString(desc), UTF8String.fromString(seq.toString))
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
