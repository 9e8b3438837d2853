package graft.ops

object Windows {
  val ops: Seq[Op] = Seq()
}
