package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** SQL-text surface: the pure-DDL registration path yields the same
  * results as the DataFrame loaders (reference day10 SQL DDL demos).
  */
class SqlSurfaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("DDL-registered views match DataFrame loader results") {
    graft.sql.SqlSurface.registerTablesDdl(spark, dir)
    val viaSql = spark.sql(SqlText.q35).collect().toSeq
    graft.sql.SqlSurface.registerTables(spark, dir)
    val viaDf = spark.sql(SqlText.q35).collect().toSeq
    assert(viaSql == viaDf)
  }

  test("DDL events view applies the same ns->us timestamp normalization") {
    graft.sql.SqlSurface.registerTablesDdl(spark, dir)
    val ddlMax = spark.sql("SELECT CAST(MAX(ts) AS LONG) FROM events")
      .head().getLong(0)
    val dfMax = Tables.events(spark, dir)
      .agg(max(col("ts").cast("long"))).head().getLong(0)
    assert(ddlMax == dfMax)
  }
}
