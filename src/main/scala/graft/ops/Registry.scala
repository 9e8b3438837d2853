package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Assembles the full operator inventory (SURVEY.md §2). The driver-facing
  * maps in SparkEntry are derived from `all`, so a query key and its oracle
  * key can never drift apart.
  */
object Registry {

  def all: Seq[Op] =
    Relational.ops ++
      Aggregates.ops ++
      Windows.ops ++
      Scalars.ops ++
      EventTime.ops ++
      LlmOps.ops ++
      Multimodal.ops ++
      Udafs.ops

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(op => op.name -> op.build).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(op => op.oracle.map(op.name -> _)).toMap
}
