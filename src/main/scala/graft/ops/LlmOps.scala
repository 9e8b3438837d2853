package graft.ops

object LlmOps {
  val ops: Seq[Op] = Seq()
}
