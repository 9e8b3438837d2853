package graft.ops

object Relational {
  val ops: Seq[Op] = Seq()
}
