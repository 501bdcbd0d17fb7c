package graft

import org.apache.spark.sql.types.{TimestampType, StringType}

/** Schema-drift canary: the shared testdata has been regenerated under the
  * engine before (round 7: `events.ts` flipped INT64(NANOS) → timestamp[us],
  * silently breaking 10 gate queries). This spec turns any future drift into
  * one loud, named failure instead of dozens of cryptic cast errors.
  */
class TestdataCanarySpec extends SparkSpec {
  private val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
    .map(sf => s"/root/testdata/$sf")
    .filter(d => new java.io.File(d).exists())

  test("canary: events.ts normalizes to TimestampType at every sf") {
    assert(sfDirs.nonEmpty, "no testdata dirs found")
    sfDirs.foreach { dir =>
      val dt = Tables.events(spark, dir).schema("ts").dataType
      assert(dt == TimestampType,
        s"$dir/events.parquet: ts reads as $dt after Tables normalization — " +
          "testdata encoding drifted; extend Tables.apply")
    }
  }

  test("canary: DDL events view normalizes ts to TimestampType") {
    sfDirs.headOption.foreach { dir =>
      graft.sql.SqlSurface.registerTablesDdl(spark, dir)
      val dt = spark.table("events").schema("ts").dataType
      assert(dt == TimestampType, s"DDL events view: ts reads as $dt")
    }
  }

  test("canary: key columns keep expected types") {
    sfDirs.headOption.foreach { dir =>
      assert(Tables.documents(spark, dir).schema("text").dataType == StringType)
      val emb = Tables.embeddings(spark, dir).schema("embedding").dataType
      assert(emb.typeName == "array", s"embeddings.embedding reads as $emb")
    }
  }
}
