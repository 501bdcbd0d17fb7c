package graft.io.v2

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSourceV2 source — the engine-native tier for the
  * reference's hand-rolled SourceFunctions
  * (java/.../source/CustomSourceDemo.java:24-77 generator loop;
  * scala/.../streamingwithflink/util/SensorSource.scala:14-36 synthetic
  * sensor feed; java/.../state/MyAtleastOnceSourceDemo.java:52-112
  * offset-checkpointed replay).
  *
  * Emits a deterministic sensor feed: row i (a global sequence number) →
  * (id = "sensor_" + i % sensors, ts = epochStartSec + i seconds as
  * TimestampType-compatible µs, temperature = deterministic hash walk).
  * Offsets are plain row sequence numbers, so the engine's checkpoint
  * gives exactly-once replay for free — the at-least-once ListState
  * bookkeeping the reference writes by hand is the platform's job here.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft.io.v2.SensorSourceV2")
  *     .option("rowsPerBatch", "100").option("sensors", "10").load()
  *   spark.read.format("graft.io.v2.SensorSourceV2")
  *     .option("totalRows", "1000").load()          // bounded form
  * }}}
  */
class SensorSourceV2 extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SensorSourceV2.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SensorTable(new CaseInsensitiveStringMap(properties))
}

object SensorSourceV2 {
  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("ts_us", LongType, nullable = false),
    StructField("temperature", DoubleType, nullable = false)))

  /** Deterministic row law shared by batch/stream/tests. */
  def rowAt(i: Long, sensors: Int, epochStartSec: Long): (String, Long, Double) = {
    val id = s"sensor_${i % sensors}"
    val tsUs = (epochStartSec + i) * 1000000L
    val h = java.lang.Long.hashCode(i * 0x9E3779B97F4A7C15L)
    val temp = 65.0 + (math.abs(h) % 1000) / 50.0 - 10.0
    (id, tsUs, temp)
  }
}

private class SensorTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft_sensor_source"
  override def schema(): StructType = SensorSourceV2.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options)
    merged.putAll(o)
    new SensorScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

private class SensorScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder {
  override def build(): Scan = new SensorScan(options)
}

private case class SensorOffset(seq: Long) extends Offset {
  override def json(): String = seq.toString
}

private class SensorScan(options: CaseInsensitiveStringMap) extends Scan {
  private val sensors = options.getInt("sensors", 10)
  private val epochStartSec = options.getLong("epochStartSec", 1000L)
  private val rowsPerBatch = options.getLong("rowsPerBatch", 100L)
  private val totalRows = options.getLong("totalRows", 1000L)
  private val partitions = options.getInt("partitions", 4)

  override def readSchema(): StructType = SensorSourceV2.schema
  override def description(): String = "graft deterministic sensor source"

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      SensorScan.slice(0L, totalRows, partitions, sensors, epochStartSec)
    override def createReaderFactory(): PartitionReaderFactory =
      new SensorReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream {
      // latestOffset() may be polled several times per trigger, so the
      // advance signal must be idempotent within a trigger: derive it from
      // elapsed wall-clock (rate-source style) — rowsPerBatch rows per
      // batchIntervalMs, capped at totalRows. Exactly-once comes from the
      // checkpointed [start, end) ranges, not from this clock — PLUS the
      // monotonic clamp below: after a restart from checkpoint the
      // wall-clock restarts near 0, so without the clamp the source would
      // publish an offset BEHIND the restored one and re-plan
      // already-committed ranges (duplicate rows). Offsets must never move
      // backwards across restarts; `maxSeen` is re-learned from every
      // checkpoint-restored offset the engine hands back.
      private val startMs = System.currentTimeMillis()
      private val intervalMs = math.max(1L, options.getLong("batchIntervalMs", 100L))
      @volatile private var maxSeen = 0L
      private def noteSeen(seq: Long): Long = {
        if (seq > maxSeen) maxSeen = seq
        seq
      }
      override def initialOffset(): Offset = SensorOffset(0L)
      override def latestOffset(): Offset = {
        val ticks = (System.currentTimeMillis() - startMs) / intervalMs + 1
        val clocked = math.min(totalRows, ticks * rowsPerBatch)
        SensorOffset(noteSeen(math.max(maxSeen, clocked)))
      }
      override def deserializeOffset(json: String): Offset =
        SensorOffset(noteSeen(json.toLong))
      override def commit(end: Offset): Unit = ()
      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
        SensorScan.slice(start.asInstanceOf[SensorOffset].seq,
          noteSeen(end.asInstanceOf[SensorOffset].seq), partitions, sensors, epochStartSec)
      override def createReaderFactory(): PartitionReaderFactory =
        new SensorReaderFactory
      override def stop(): Unit = ()
    }
}

private object SensorScan {
  /** Split [from, until) into contiguous per-task ranges. */
  def slice(from: Long, until: Long, parts: Int, sensors: Int,
      epochStartSec: Long): Array[InputPartition] = {
    val n = math.max(0L, until - from)
    if (n == 0) Array.empty
    else {
      val per = math.max(1L, (n + parts - 1) / parts)
      Iterator.range(0, parts).map { p =>
        val s = from + p * per
        val e = math.min(until, s + per)
        SensorPartition(s, e, sensors, epochStartSec): InputPartition
      }.filter { case SensorPartition(s, e, _, _) => s < e }.toArray
    }
  }
}

private case class SensorPartition(from: Long, until: Long, sensors: Int,
    epochStartSec: Long) extends InputPartition

private class SensorReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SensorPartition]
    new PartitionReader[InternalRow] {
      private var i = p.from - 1
      override def next(): Boolean = { i += 1; i < p.until }
      override def get(): InternalRow = {
        val (id, tsUs, temp) = SensorSourceV2.rowAt(i, p.sensors, p.epochStartSec)
        InternalRow(UTF8String.fromString(id), tsUs, temp)
      }
      override def close(): Unit = ()
    }
  }
}
