package graft.io

import graft.SparkSpec
import graft.io.v2.KeyValueSinkV2
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class KVPair(key: String, value: String)

/** DataSourceV2 streaming sink: two-phase epoch commit, idempotent
  * publish, upsert-on-key semantics.
  */
class KeyValueSinkV2Spec extends SparkSpec {
  import spark.implicits._

  test("streaming write publishes epochs atomically and upserts keys") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    KeyValueSinkV2.clear("t1")
    val ms = MemoryStream[KVPair]
    val q = ms.toDF().writeStream
      .format("graft.io.v2.KeyValueSinkV2")
      .option("store", "t1")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("kvsink").toString)
      .outputMode("append").start()
    try {
      ms.addData(KVPair("a", "1"), KVPair("b", "2")); q.processAllAvailable()
      ms.addData(KVPair("a", "3")); q.processAllAvailable() // upsert a
      val store = KeyValueSinkV2.store("t1")
      assert(store.get("a") == Some("3") && store.get("b") == Some("2"))
      // each epoch committed exactly once
      assert(KeyValueSinkV2.committedEpochs("t1").size() >= 2)
    } finally q.stop()
  }
}
