package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.TableRegistry

/** The declared fixture-schema contract (TableRegistry.fixtureSchemas —
  * what the NL column-level productions resolve against at translate time,
  * with no session in hand) must EQUAL the schema each fixture loader
  * actually produces, post-shim. A driver-side fixture change then breaks
  * this suite loudly instead of silently skewing translations.
  */
class FixtureSchemaSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  val d = TestSpark.sfDir

  test("every fixture table has a declared schema and vice versa") {
    assert(TableRegistry.fixtureSchemas.keySet === TableRegistry.tables.keySet)
  }

  for ((name, declared) <- TableRegistry.fixtureSchemas.toSeq.sortBy(_._1)) {
    test(s"declared schema of '$name' matches the loaded fixture") {
      val loaded = TableRegistry.load(spark, d, name).schema
      // compare names + types in order; nullability is not part of the
      // contract (parquet scans report everything nullable anyway)
      assert(loaded.fields.map(f => (f.name, f.dataType)).toSeq ===
        declared.fields.map(f => (f.name, f.dataType)).toSeq,
        s"FIXTURES.md drift for '$name'")
    }
  }
}
