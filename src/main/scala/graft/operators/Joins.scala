package graft.operators
import graft.QueryDef
object Joins {
  val defs: Seq[QueryDef] = Seq()
}
