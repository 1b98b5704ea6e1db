package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** S13 — the clipboard/report sink (RGPs.ipynb:1842,1909,1969,2001,2958):
  * the reference pastes small annotation frames into iTOL through
  * `pd.DataFrame.to_clipboard(index=False, header=False, sep)`. The
  * engine-side equivalent renders a frame to one delimited text blob —
  * headerless, index-free, caller-chosen separator — either as a driver
  * String (the clipboard analogue) or as a single ordered text file.
  *
  * This is a PRESENTATION sink: the frames are per-cluster annotation
  * tables (hundreds of rows), so the driver path is guarded by `maxRows`
  * and fails loudly rather than becoming an accidental data exfil path
  * for a 100 TB table. Row order is the frame's order — callers sort
  * first, exactly like the reference sorts before pasting.
  */
object Reports {

  // nulls render empty; everything else via toString (matches Spark's
  // string cast for the primitive types these reports carry, so the
  // driver string and the file variant agree byte-for-byte)
  private def fmt(v: Any): String = v match {
    case null => ""
    case x => x.toString
  }

  private def line(r: Row, sep: String): String =
    r.toSeq.map(fmt).mkString(sep)

  /** The `to_clipboard` analogue: the whole frame as one delimited,
    * headerless string. Throws when the frame exceeds `maxRows` — a
    * report that doesn't fit a clipboard is a sign the caller wanted a
    * real sink (S7 CSV / parquet) instead.
    */
  def delimitedString(df: DataFrame, sep: String = ",", maxRows: Int = 100000): String = {
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"report sink: frame exceeds $maxRows rows — use a data sink (df.write) instead")
    rows.map(line(_, sep)).mkString("\n")
  }

  /** Single-file variant for handing a report to another tool: coalesce
    * to one partition (order preserved — partitions concatenate in
    * order) and write one headerless text part.
    */
  def writeDelimited(df: DataFrame, path: String, sep: String = ","): Unit = {
    val sepLit = sep
    val cols = df.columns.map(c => coalesce(col(c).cast("string"), lit("")))
    df.select(concat_ws(sepLit, cols: _*).as("value"))
      .coalesce(1)
      .write.mode("overwrite").text(path)
  }
}
