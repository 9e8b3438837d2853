package graft.ops

object Scalars {
  val ops: Seq[Op] = Seq()
}
