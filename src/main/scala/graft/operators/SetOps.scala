package graft.operators
import graft.QueryDef
object SetOps {
  val defs: Seq[QueryDef] = Seq()
}
