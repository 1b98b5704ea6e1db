package graft.operators
import graft.QueryDef
object Projections {
  val defs: Seq[QueryDef] = Seq()
}
