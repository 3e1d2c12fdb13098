package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `cdc-gen` — a DataSource V2 micro-batch streaming source emitting a
  * deterministic synthetic changelog: the Spark-native stand-in for the
  * reference's DynamoDB stream (NEW_IMAGE envelopes, ordered per key —
  * `/root/reference/cdk_infrastructure/__init__.py:290,351-359`), usable
  * wherever a real CDC tap (Debezium topic, DMS stream, binlog reader)
  * would be plugged in.
  *
  * Contract demonstrated — the part that matters for exactly-once:
  *  - offsets are a plain event counter; `latestOffset` advances by
  *    `eventsPerBatch` per micro-batch;
  *  - every event is a PURE FUNCTION of its sequence number (SplitMix64),
  *    so replaying any offset range after a crash yields byte-identical
  *    rows — the property checkpoint recovery relies on;
  *  - partition planning splits the offset range evenly; readers are
  *    independent per split (no shared state, no driver data path).
  *
  * Usage:
  * {{{
  *   spark.readStream.format("cdc-gen")
  *     .option("keys", 50)            // key space size
  *     .option("eventsPerBatch", 100) // reference batch_size=100
  *     .option("removeEvery", 10)     // every Nth event is a REMOVE
  *     .load()
  * }}}
  * Schema: eventName STRING, key STRING, newImage STRING (JSON), ts TIMESTAMP.
  */
class CdcGenerator extends TableProvider with DataSourceRegister {
  override def shortName(): String = "cdc-gen"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CdcGenerator.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CdcGeneratorTable(new CaseInsensitiveStringMap(properties))
}

object CdcGenerator {
  val Schema: StructType = StructType(Seq(
    StructField("eventName", StringType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("newImage", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false)))

  /** Base event time: 2026-01-01T00:00:00Z in epoch micros; event i is
    * one second later than event i-1 (deterministic, no wall clock). */
  val BaseMicros: Long = 1767225600000000L

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Event `i` of the synthetic changelog (pure function of i). */
  def eventAt(i: Long, keys: Int, removeEvery: Int): (String, String, String, Long) = {
    val h = mix(i)
    val key = s"k${java.lang.Long.remainderUnsigned(h, keys.toLong)}"
    val name =
      if (removeEvery > 0 && i % removeEvery == removeEvery - 1) "REMOVE"
      else if (java.lang.Long.remainderUnsigned(mix(h), 3L) == 0L) "INSERT"
      else "MODIFY"
    val value = java.lang.Long.remainderUnsigned(mix(h + 1), 100000L)
    val image = s"""{"id":"$key","seq":$i,"value":${value.toDouble / 100}}"""
    (name, key, image, BaseMicros + i * 1000000L)
  }
}

private class CdcGeneratorTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "cdc-gen"
  override def schema(): StructType = CdcGenerator.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val keys = opts.getInt("keys", 50)
    val perBatch = opts.getInt("eventsPerBatch", 100)
    val removeEvery = opts.getInt("removeEvery", 10)
    val totalForBatch = opts.getLong("totalEvents", 1000L)
    val maxEvents = opts.getLong("maxEvents", Long.MaxValue)
    val partitions = opts.getInt("numPartitions", 4)
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = CdcGenerator.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new CdcMicroBatchStream(keys, perBatch, removeEvery, partitions, maxEvents)
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            CdcGeneratorPartitioning.split(0L, totalForBatch, partitions)
          override def createReaderFactory(): PartitionReaderFactory =
            new CdcReaderFactory(keys, removeEvery)
        }
      }
    }
  }
}

private case class CdcOffset(count: Long) extends Offset {
  override def json(): String = count.toString
}

private object CdcGeneratorPartitioning {
  def split(start: Long, end: Long, n: Int): Array[InputPartition] = {
    val total = end - start
    (0 until n).flatMap { p =>
      val s = start + total * p / n
      val e = start + total * (p + 1) / n
      if (e > s) Some(CdcRangePartition(s, e)) else None
    }.toArray
  }
}

private case class CdcRangePartition(start: Long, end: Long) extends InputPartition

/** Stateless micro-batch stream via SupportsAdmissionControl: Spark hands
  * the current start offset to `latestOffset(start, limit)`, so the next
  * batch is always `start + perBatch` — no in-memory position that a
  * checkpoint restart could regress (a plain `latestOffset()` counter
  * re-emitted ranges after recovery, because `commit` is never replayed
  * for restored batches).
  *
  * @param maxEvents ceiling on the generated changelog. A source whose
  * offsets grow forever can never satisfy "no new data", so
  * `processAllAvailable()` would block indefinitely (like Spark's own
  * `rate` source); a finite changelog drains and idles. */
private class CdcMicroBatchStream(keys: Int, perBatch: Int, removeEvery: Int,
    partitions: Int, maxEvents: Long)
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = CdcOffset(0L)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    CdcOffset(math.min(start.asInstanceOf[CdcOffset].count + perBatch, maxEvents))
  override def deserializeOffset(json: String): Offset = CdcOffset(json.toLong)
  override def commit(end: Offset): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    CdcGeneratorPartitioning.split(
      start.asInstanceOf[CdcOffset].count, end.asInstanceOf[CdcOffset].count,
      partitions)

  override def createReaderFactory(): PartitionReaderFactory =
    new CdcReaderFactory(keys, removeEvery)

  override def stop(): Unit = ()
}

private class CdcReaderFactory(keys: Int, removeEvery: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val range = partition.asInstanceOf[CdcRangePartition]
    new PartitionReader[InternalRow] {
      private var i = range.start - 1
      override def next(): Boolean = { i += 1; i < range.end }
      override def get(): InternalRow = {
        val (name, key, image, micros) =
          CdcGenerator.eventAt(i, keys, removeEvery)
        InternalRow(
          UTF8String.fromString(name), UTF8String.fromString(key),
          UTF8String.fromString(image), micros)
      }
      override def close(): Unit = ()
    }
  }
}
