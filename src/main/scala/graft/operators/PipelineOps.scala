package graft.operators
import graft.QueryDef
object PipelineOps {
  val defs: Seq[QueryDef] = Seq()
}
