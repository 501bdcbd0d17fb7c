package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Kafka paths minus the broker (none exists in this sandbox): the
  * value-parsing projections (Sources.csvValues/jsonValues — everything
  * kafkaCsv/kafkaJson add over the raw source) and the producer's
  * serialization (Sinks.kafkaCsvRecords/kafkaJsonRecords) run against
  * fixture frames with Kafka's exact wire schema. Untestable remainder:
  * the broker round-trip itself (standard spark-sql-kafka read/write,
  * offset checkpointing engine-side).
  */
class KafkaWireSpec extends SparkSpec {
  import spark.implicits._

  /** Fixture with the columns a Kafka source produces (key/value BINARY
    * + topic/partition/offset/timestamp metadata).
    */
  private def wireFrame(values: Seq[String]) =
    values.zipWithIndex.map { case (v, i) =>
      (s"k$i".getBytes("UTF-8"), v.getBytes("UTF-8"), "events", 0, i.toLong,
        new java.sql.Timestamp(1700000000000L + i), 0)
    }.toDF("key", "value", "topic", "partition", "offset", "timestamp",
      "timestampType")

  private val schema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  test("csvValues parses CSV payload bytes into the declared schema") {
    val out = Sources.csvValues(
      wireFrame(Seq("7,alice,3.5", "8,bob,1.25")), schema)
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((7L, "alice", 3.5), (8L, "bob", 1.25)))
  }

  test("jsonValues parses JSON payload bytes into the declared schema") {
    val out = Sources.jsonValues(
      wireFrame(Seq("""{"user_id":7,"name":"alice","score":3.5}""")), schema)
      .as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq((7L, "alice", 3.5)))
  }

  test("malformed payloads parse to null fields, not exceptions") {
    val csvOut = Sources.csvValues(wireFrame(Seq("not,a number,xx")), schema)
      .collect().head
    assert(csvOut.isNullAt(0) && csvOut.getString(1) == "a number")
    val jsonOut = Sources.jsonValues(wireFrame(Seq("{broken json")), schema)
      .collect().head
    assert((0 until 3).forall(jsonOut.isNullAt))
  }

  test("producer CSV records round-trip through csvValues") {
    val rows = Seq((7L, "alice", 3.5), (8L, "bob", 1.25))
      .toDF("user_id", "name", "score")
    val wire = Sinks.kafkaCsvRecords(rows, "user_id")
    // the writer contract: exactly (key, value) string columns
    assert(wire.columns.toSeq == Seq("key", "value"))
    val back = Sources.csvValues(
      wire.select(col("key"), col("value").cast("binary")),
      StructType(Seq(StructField("name", StringType),
        StructField("score", DoubleType))))
    assert(back.as[(String, Double)].collect().sortBy(_._1).toSeq ==
      Seq(("alice", 3.5), ("bob", 1.25)))
  }

  test("producer JSON records round-trip through jsonValues") {
    val rows = Seq((7L, "alice", 3.5)).toDF("user_id", "name", "score")
    val wire = Sinks.kafkaJsonRecords(rows, "user_id")
    val back = Sources.jsonValues(
      wire.select(col("value").cast("binary")),
      StructType(Seq(StructField("name", StringType),
        StructField("score", DoubleType))))
    assert(back.as[(String, Double)].collect().toSeq == Seq(("alice", 3.5)))
    assert(wire.select(col("key")).as[String].collect().toSeq == Seq("7"))
  }

  test("kafka sink builder accepts the wire frame (no broker dial)") {
    // construction-only: DataStreamWriter resolves the kafka format at
    // start(), so building the writer is assertable brokerless. The
    // READER (Sources.kafka) resolves `format("kafka")` at load() and
    // needs the spark-sql-kafka package on the classpath — absent here
    // (this distribution ships no Kafka connector jar), so the reader
    // builder is the documented untestable remainder along with the
    // broker round-trip itself.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val wire = Sinks.kafkaJsonRecords(ms.toDF().toDF("id", "payload"), "id")
    val writer = Sinks.kafka(wire, "localhost:19092", "events")
    assert(writer != null)
  }
}
