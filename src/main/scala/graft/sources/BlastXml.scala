package graft.sources

import java.io.StringReader
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S10 — BLAST outfmt-5 (XML) pull-parser, reproducing what the reference
  * extracts with Biopython's NCBIXML (extendingDB_performingBlast.py:92-105):
  * one row per (query, hit) with
  *
  *  - cluster_id      = Iteration_query-def up to the first space
  *  - title           = "Hit_id Hit_def" (NCBIXML description.title)
  *  - score           = the hit's FIRST Hsp_score (description.score is
  *                      only set once, by the first HSP)
  *  - e               = the hit's first Hsp_evalue, same rule
  *  - num_alignments  = number of HSPs in the hit (NCBIXML increments
  *                      description.num_alignments per Hsp)
  *
  * A streaming StAX cursor (JDK built-in) — constant memory per file, no
  * DOM: BLAST XML against a big virus DB can be GB-scale per shard, and the
  * parse cost stays one pass. Parallelism is per-file (one XML document is
  * one well-formed unit); shard-per-query-batch layouts — what the
  * reference's batched blastn runs produce — keep every executor busy.
  */
object BlastXml {

  final case class Hit(
      cluster_id: String, title: String, score: Double, e: Double,
      num_alignments: Int)

  /** Parse one complete outfmt-5 document. */
  def parseString(xml: String): Iterator[Hit] = {
    if (xml == null || xml.trim.isEmpty) return Iterator.empty
    val f = XMLInputFactory.newInstance()
    // hygiene for untrusted input: no DTDs, no external entities
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val r = f.createXMLStreamReader(new StringReader(xml))
    try parseReader(r).toVector.iterator // materialize before close
    finally r.close()
  }

  private def parseReader(r: XMLStreamReader): Iterator[Hit] = {
    val out = Vector.newBuilder[Hit]
    var query: String = ""
    var hitId: String = ""
    var hitDef: String = ""
    var score: Option[Double] = None
    var e: Option[Double] = None
    var numHsps = 0

    def text(): String = {
      // coalesce CHARACTERS events until the element closes
      val sb = new StringBuilder
      var ev = r.next()
      while (ev == XMLStreamConstants.CHARACTERS || ev == XMLStreamConstants.CDATA) {
        sb.append(r.getText)
        ev = r.next()
      }
      sb.toString
    }

    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "Iteration_query-def" => query = text().split(' ')(0)
            case "Hit" =>
              hitId = ""; hitDef = ""; score = None; e = None; numHsps = 0
            case "Hit_id" => hitId = text()
            case "Hit_def" => hitDef = text()
            case "Hsp" => numHsps += 1
            case "Hsp_score" =>
              val v = text()
              if (score.isEmpty) score = Some(v.trim.toDouble)
            case "Hsp_evalue" =>
              val v = text()
              if (e.isEmpty) e = Some(v.trim.toDouble)
            case _ => ()
          }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "Hit" =>
          out += Hit(query, s"$hitId $hitDef",
            score.getOrElse(Double.NaN), e.getOrElse(Double.NaN), numHsps)
        case _ => ()
      }
    }
    out.result().iterator
  }

  /** Distributed scan: one XML document per file under `path` (the layout
    * blastn's per-batch runs produce), parsed in parallel across files.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (_, content) => parseString(content) }
      .toDF("cluster_id", "title", "score", "e", "num_alignments")
  }
}
