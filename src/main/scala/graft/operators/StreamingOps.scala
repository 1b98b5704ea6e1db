package graft.operators
import graft.QueryDef
object StreamingOps {
  val defs: Seq[QueryDef] = Seq()
}
