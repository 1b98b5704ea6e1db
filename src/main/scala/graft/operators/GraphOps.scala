package graft.operators
import graft.QueryDef
object GraphOps {
  val defs: Seq[QueryDef] = Seq()
}
