package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tables.Tables

/** Fail-fast fixture-drift guard: every loader's schema must match the
  * catalog's expectation (names + types; nullability flags excluded —
  * parquet writers vary them without semantic change).
  */
class SchemaSuite extends AnyFunSuite {

  Tables.expectedSchemas.foreach { case (name, expected) =>
    test(s"$name schema matches catalog") {
      val got =
        if (name == "events") Tables.events(TestSpark.spark, TestSpark.Sf0001)
        else Tables.load(TestSpark.spark, TestSpark.Sf0001, name)
      val gotShape = got.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq
      val expShape = expected.fields.map(f => (f.name, f.dataType.simpleString)).toSeq
      assert(gotShape == expShape)
    }
  }
}
