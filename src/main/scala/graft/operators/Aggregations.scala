package graft.operators
import graft.QueryDef
object Aggregations {
  val defs: Seq[QueryDef] = Seq()
}
