package graft.operators
import graft.QueryDef
object Windows {
  val defs: Seq[QueryDef] = Seq()
}
