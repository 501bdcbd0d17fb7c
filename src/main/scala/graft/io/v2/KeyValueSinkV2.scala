package graft.io.v2

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSourceV2 streaming SINK demonstrating the exactly-once
  * write protocol the reference's RichSinkFunction sinks approximate by
  * hand: executors buffer rows and return them as commit messages; the
  * driver's `commit(epochId, messages)` publishes an epoch atomically and
  * IDEMPOTENTLY (a replayed epoch is a no-op), `abort` discards. That is
  * the engine-side two-phase commit; the reference's Redis/JDBC upsert
  * sinks get at-least-once and rely on upsert idempotence instead.
  *
  * The store is a JVM-global map keyed by the `store` option — right for
  * tests/local mode (the canonical small-sink pattern: ship rows in
  * commit messages). A 100 TB sink stages files/transactions per task and
  * publishes them in commit — the PROTOCOL here is the real one, the
  * store is the stand-in.
  *
  * Schema: (key STRING, value STRING); last write per key wins within an
  * epoch batch (upsert).
  */
class KeyValueSinkV2 extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KeyValueSinkV2.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KVSinkTable(new CaseInsensitiveStringMap(properties))
}

object KeyValueSinkV2 {
  val schema: StructType = StructType(Seq(
    StructField("key", StringType), StructField("value", StringType)))

  /** name -> (data, committed epoch ids) */
  private val stores =
    new java.util.concurrent.ConcurrentHashMap[String,
      (scala.collection.concurrent.TrieMap[String, String],
        java.util.concurrent.ConcurrentHashMap.KeySetView[java.lang.Long, java.lang.Boolean])]()

  def store(name: String): scala.collection.concurrent.TrieMap[String, String] =
    stores.computeIfAbsent(name, _ =>
      (scala.collection.concurrent.TrieMap.empty[String, String],
        java.util.concurrent.ConcurrentHashMap.newKeySet[java.lang.Long]()))._1

  def committedEpochs(name: String): java.util.Set[java.lang.Long] =
    stores.computeIfAbsent(name, _ =>
      (scala.collection.concurrent.TrieMap.empty[String, String],
        java.util.concurrent.ConcurrentHashMap.newKeySet[java.lang.Long]()))._2

  def clear(name: String): Unit = stores.remove(name)
}

private class KVSinkTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsWrite {
  override def name(): String = "graft_kv_sink"
  override def schema(): StructType = KeyValueSinkV2.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val storeName = Option(options.get("store")).getOrElse("default")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite = new KVStreamingWrite(storeName)
      }
    }
  }
}

private case class KVCommitMessage(pairs: Array[(String, String)])
    extends WriterCommitMessage

private class KVStreamingWrite(storeName: String) extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new KVWriterFactory
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    // idempotent publish: a replayed epoch must not re-apply
    if (KeyValueSinkV2.committedEpochs(storeName).add(epochId)) {
      val store = KeyValueSinkV2.store(storeName)
      messages.foreach {
        case KVCommitMessage(pairs) => pairs.foreach { case (k, v) => store.put(k, v) }
        case _ => ()
      }
    }
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

private class KVWriterFactory extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer[(String, String)]()
      override def write(row: InternalRow): Unit =
        buf += ((row.getString(0), row.getString(1)))
      override def commit(): WriterCommitMessage = KVCommitMessage(buf.toArray)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}
