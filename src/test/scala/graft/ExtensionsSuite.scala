package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** A session built with GraftExtensions must resolve both native
  * functions from SQL with no imperative registration. Runs on its own
  * session (newSession() shares the SparkContext but extensions bind at
  * builder time, so a full builder round-trip is the honest test).
  */
class ExtensionsSuite extends AnyFunSuite {

  test("withExtensions(GraftExtensions) resolves graft_* functions from SQL") {
    val shared = TestSpark.spark // ensure the shared context exists first
    // getOrCreate() would hand back the shared session and silently skip
    // extensions — clear it so a genuinely new session (same context)
    // binds them, and restore afterwards
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s =
      try SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      finally {
        SparkSession.setDefaultSession(shared)
        SparkSession.setActiveSession(shared)
      }
    val row = s.sql(
      """SELECT
        |  graft_cosine(array(cast(1.0 as float), cast(0.0 as float)),
        |               array(cast(1.0 as float), cast(0.0 as float))) AS c,
        |  graft_sorted_intersect_count(array('a', 'b', 'c'), array('b', 'c', 'd')) AS n
      """.stripMargin).collect().head
    assert(row.getDouble(0) == 1.0)
    assert(row.getInt(1) == 2)

    // the injected GENERATOR resolves from SQL too (table-function
    // position), same analyzer path as explode
    val chunks = s.sql(
      """SELECT chunk_id, chunk
        |FROM (SELECT array('a','b','c','d','e') AS tk)
        |LATERAL VIEW graft_chunk_split(tk, 3, 2) AS chunk_id, chunk
      """.stripMargin).collect()
    assert(chunks.map(r =>
      r.getLong(0) -> r.getSeq[String](1).mkString("")).toSeq ==
      Seq(0L -> "abc", 1L -> "cde", 2L -> "e"))

    // the injected optimizer rule folds graft_sqdist(x, x) to a
    // null-preserving 0.0 — assert both the REWRITE (no sqdist left in
    // the optimized plan) and the SEMANTICS (0.0 on a value, null on a
    // null array)
    // build from spark.range, NOT a local Seq — local relations get
    // whole-plan constant-folded (ConvertToLocalRelation) and would
    // make this assertion pass without the rule ever firing
    def selfDist = s.range(2)
      .selectExpr("IF(id = 0, array(cast(id as double), 2.5), NULL) AS v")
      .selectExpr("graft_sqdist(v, v) AS d")
    assert(!selfDist.queryExecution.optimizedPlan.toString.contains("graft_sqdist"),
      s"self-distance not folded:\n${selfDist.queryExecution.optimizedPlan}")
    val got = selfDist.orderBy("d").collect() // nulls first under asc
      .map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(got.toSeq == Seq(null, 0.0))
    // the guard conf disables the fold (NaN-carrying corpora)
    s.conf.set("spark.graft.sqdist.selfFoldNaNSafe", "false")
    try
      assert(selfDist.queryExecution.optimizedPlan.toString.contains("graft_sqdist"))
    finally s.conf.set("spark.graft.sqdist.selfFoldNaNSafe", "true")
  }
}
