package graft.operators
import graft.QueryDef
object DomainOps {
  val defs: Seq[QueryDef] = Seq()
}
