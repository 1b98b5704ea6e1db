package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2.1 sources — distributed readers for the PIRATE output formats.
  *
  * Single-file formats use `spark.read.text`/`csv` (splittable, scales with
  * input size). The per-file formats (aligned FASTA per cluster, GFF per
  * strain) use `wholeTextFiles`, which parallelizes across *files* — the
  * natural unit here, since records interleave header/body lines that
  * cannot be split blindly at byte boundaries. At 770+ files per dataset
  * that keeps every executor busy; a DataSource V2 FASTA reader with
  * in-file splitting is the upgrade path for few-huge-file corpora.
  */
object PirateSources {

  /** S1+S2: co-ords/<Strain>.co-ords.tsv — 7 projected columns + strain
    * from the file name; Type renamed FeatureType (pirateToDatabase.py:19-28).
    *
    * A `Contig` column, when the co-ords carry one (draft assemblies /
    * plasmids), rides along so the chain derivation can break NEIGHBOUR
    * chains at replicon boundaries; absent, every feature lands on the
    * single default chain "0" — the reference's one-chain-per-genome
    * assumption (01_creatingDatabase.cypher:108-119), which its
    * 770-complete-genome dataset satisfies. Coordinates stay GLOBAL into
    * the concatenated genome string either way (the reference's
    * concatenation model, pirateToDatabase.py:136-173), so substring
    * extraction is contig-agnostic.
    */
  def readCoords(spark: SparkSession, coordsDir: String): DataFrame = {
    val raw = spark.read.option("sep", "\t").option("header", "true").csv(coordsDir)
    val contig = if (raw.columns.contains("Contig")) col("Contig") else lit("0")
    raw
      .withColumn("Strain",
        regexp_extract(input_file_name(), "([^/]+?)\\.[^/]*$", 1))
      .select(col("Name"), col("Start").cast("long"), col("End").cast("long"),
        col("Length").cast("long"), col("Type").as("FeatureType"),
        col("Strand"), col("Product"), col("Strain"), contig.as("Contig"))
  }

  /** S3+P1-P3: PIRATE.gene_families.tsv — fixed columns by position
    * (0,1,3,4,6 + the three length columns by name), the variable
    * per-genome tail folded into one sanitized `;`-joined `feature` string
    * (pirateToDatabase.py:69-88: fillna "0", join on ';', strip parens,
    * ':' -> ';'). The genome columns are everything *after*
    * `average_length(bp)` — PIRATE's fixed prefix ends there, so the start
    * is derived from the header rather than hardcoded (the reference uses
    * `range(17, num_cols)` then keeps min/max/average by position, which
    * amounts to the same split on real PIRATE files).
    */
  def readGeneFamilies(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("sep", "\t").option("header", "true").csv(path)
    val cols = raw.columns
    val avgIdx = cols.indexOf("average_length(bp)")
    require(avgIdx >= 0,
      s"PIRATE.gene_families.tsv at $path lacks the average_length(bp) column")
    val genomeCols = cols.drop(avgIdx + 1)
    val folded = concat_ws(";",
      genomeCols.map(c => coalesce(col(s"`$c`"), lit("0"))): _*)
    raw.select(
      col(cols(0)).as("allele_name"),
      col(cols(1)).as("gene_family"),
      col(cols(3)).as("consensus_product"),
      col(cols(4)).cast("long").as("threshold"),
      col(cols(6)).cast("long").as("number_genomes"),
      col("`min_length(bp)`").cast("long").as("min_length"),
      col("`max_length(bp)`").cast("long").as("max_length"),
      col("`average_length(bp)`").cast("double").as("average_length"),
      translate(folded, ":()", ";").as("feature")) // ':'->';', parens deleted
  }

  /** S4: representative_sequences.ffn headers -> (cluster_name,
    * reference_locus) (pirateToDatabase.py:42-52: field 0 minus '>',
    * field 2 minus 'locus_tag=').
    */
  def readRepresentativeHeaders(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .filter(col("value").startsWith(">"))
      .select(
        regexp_replace(split(col("value"), ";").getItem(0), ">", "")
          .as("cluster_name"),
        regexp_replace(split(col("value"), ";").getItem(2), "locus_tag=", "")
          .as("reference_locus"))

  /** S5: feature_sequences/<cluster>.nucleotide.fasta -> one row per
    * aligned member (Feature, Seq, Cluster) — only `*.nucleotide.*` files,
    * cluster from the filename stem, single-line sequences
    * (pirateToDatabase.py:110-126).
    */
  def readAlignedSequences(spark: SparkSession, seqDir: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(seqDir)
      .flatMap { case (path, content) =>
        val fileName = path.split('/').last
        val parts = fileName.split('.')
        if (parts.length < 2 || parts(1) != "nucleotide") Iterator.empty
        else {
          val cluster = parts(0)
          content.linesIterator.grouped(2).collect {
            case scala.collection.immutable.Seq(h, s) if h.startsWith(">") =>
              (h.drop(1).trim, s.trim, cluster)
          }
        }
      }
      .toDF("Feature", "Seq", "Cluster")
  }

  /** S6: modified_gffs/<Strain>.gff -> one whole-genome string per strain:
    * everything after ##FASTA, '>' contig separators dropped
    * (pirateToDatabase.py:136-173). One row per file; genome strings are
    * MB-scale, kept out of broadcasts and substring-extracted early (P6).
    */
  def readStrainGenomes(spark: SparkSession, gffDir: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(gffDir)
      .map { case (path, content) =>
        val strain = path.split('/').last.split('.')(0)
        val sb = new StringBuilder
        var started = false
        content.linesIterator.foreach { line =>
          if (!started) { if (line.contains("##FASTA")) started = true }
          else if (!line.contains(">")) sb.append(line)
        }
        (strain, sb.toString)
      }
      .toDF("Strain", "Sequence")
  }

  /** S9: FASTA sink — one ">id desc\\nseq" text block per row. */
  def writeFasta(df: DataFrame, id: String, desc: String, seq: String, path: String): Unit =
    df.select(concat(lit(">"), col(id), lit(" "), col(desc), lit("\n"), col(seq))
      .as("value"))
      .write.mode("overwrite").text(path)

  /** S10: BLAST outfmt-5 XML rows — real pull-parser in [[BlastXml]]
    * (`BlastXml.read` for files on disk, `BlastShell.runBlastXml` for the
    * external-process pipe, X1). This is the row schema both produce.
    */
  def blastResultSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "cluster_id STRING, title STRING, score DOUBLE, e DOUBLE, num_alignments INT")
}
