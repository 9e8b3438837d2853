package graft.ops

object EventTime {
  val ops: Seq[Op] = Seq()
}
