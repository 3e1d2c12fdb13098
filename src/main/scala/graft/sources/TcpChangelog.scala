package graft.sources

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `tcp-changelog` — a DataSource V2 micro-batch source tailing a LIVE
  * network changelog: the in-sandbox analog of DMS tailing a MySQL
  * binlog over the network (the reference's actual CDC transport,
  * `/root/reference/cdk_infrastructure/__init__.py:179-204`). Lines are
  * opaque UTF-8 (Debezium-envelope JSON in the E1 pipeline;
  * [[graft.cdc.DebeziumEnvelope.decode]] downstream), delivered in
  * changelog order.
  *
  * Why a bare socket CAN be exactly-once here, when Spark's own `socket`
  * source is documented not to be: the protocol makes the SERVER the
  * replay log. A client never just "reads the stream" — it asks for a
  * closed offset range (`FROM <start> <end>`), exactly as a binlog
  * client states the binlog position it wants to resume from. Offsets
  * in the checkpoint therefore denote server-side positions that can be
  * re-fetched after any crash, which is the whole exactly-once
  * contract; a transport with no replay (pure firehose) fundamentally
  * cannot give it, and that is a property of the protocol, not of this
  * code.
  *
  * Admission control caps each micro-batch at `eventsPerBatch`; the
  * changelog is SERIAL (one reader partition — a binlog has one
  * position sequence; parallelism at 100 TB comes from the keyed
  * shuffle downstream, not from the tap), and `latestOffset` asks the
  * server how far the log has grown, so the stream follows a live,
  * still-being-written changelog and idles when caught up.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("tcp-changelog")
  *     .option("host", "127.0.0.1").option("port", p)
  *     .option("eventsPerBatch", 100)
  *     .load()   // schema: offset LONG, value STRING
  * }}}
  */
class TcpChangelog extends TableProvider with DataSourceRegister {
  override def shortName(): String = "tcp-changelog"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TcpChangelog.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TcpChangelogTable(new CaseInsensitiveStringMap(properties))
}

object TcpChangelog {
  val Schema: StructType = StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("value", StringType, nullable = false)))

  /** One short request/response exchange with the replay server. */
  private[sources] def exchange(host: String, port: Int, request: String)
      (readBody: BufferedReader => Unit): Unit = {
    val sock = new Socket()
    try {
      sock.connect(new InetSocketAddress(host, port), 10000)
      sock.setSoTimeout(30000)
      val out = new BufferedWriter(new OutputStreamWriter(
        sock.getOutputStream, StandardCharsets.UTF_8))
      out.write(request); out.write("\n"); out.flush()
      readBody(new BufferedReader(new InputStreamReader(
        sock.getInputStream, StandardCharsets.UTF_8)))
    } finally sock.close()
  }

  /** Current end offset of the server's log. */
  private[sources] def serverEnd(host: String, port: Int): Long = {
    var end = 0L
    exchange(host, port, "END") { in =>
      val line = in.readLine()
      require(line != null, "changelog server closed without an END reply")
      end = line.trim.toLong
    }
    end
  }
}

private class TcpChangelogTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "tcp-changelog"
  override def schema(): StructType = TcpChangelog.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val host = opts.getOrDefault("host", "127.0.0.1")
    val port = opts.getInt("port", -1)
    require(port > 0, "tcp-changelog requires a positive 'port' option")
    val perBatch = opts.getInt("eventsPerBatch", 1000)
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = TcpChangelog.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new TcpChangelogStream(host, port, perBatch)
      }
    }
  }
}

private case class TcpOffset(count: Long) extends Offset {
  override def json(): String = count.toString
}

private case class TcpRangePartition(host: String, port: Int,
    start: Long, end: Long) extends InputPartition

/** Stateless micro-batch stream (the [[CdcMicroBatchStream]] admission
  * discipline): the next end offset is a pure function of the restored
  * start and the server's current length, so checkpoint recovery cannot
  * regress or skip a range. */
private class TcpChangelogStream(host: String, port: Int, perBatch: Int)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // Trigger.AvailableNow pins "available" at query start: without this,
  // the wrapper would read ONE admission-capped batch as the drain
  // target and strand the rest of the backlog. The pinned end is a
  // server-side position, so the drain stays exactly-once re-fetchable.
  @volatile private var pinnedEnd: Long = -1L
  override def prepareForTriggerAvailableNow(): Unit =
    pinnedEnd = TcpChangelog.serverEnd(host, port)

  override def initialOffset(): Offset = TcpOffset(0L)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[TcpOffset].count
    val end = if (pinnedEnd >= 0) pinnedEnd else TcpChangelog.serverEnd(host, port)
    TcpOffset(math.min(s + perBatch, math.max(s, end)))
  }
  override def deserializeOffset(json: String): Offset = TcpOffset(json.toLong)
  override def commit(end: Offset): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TcpOffset].count
    val e = end.asInstanceOf[TcpOffset].count
    if (e > s) Array(TcpRangePartition(host, port, s, e)) else Array.empty
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TcpReaderFactory

  override def stop(): Unit = ()
}

private class TcpReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TcpRangePartition]
    new PartitionReader[InternalRow] {
      // the whole range is fetched eagerly in one exchange: ranges are
      // ≤ eventsPerBatch lines by admission control, and a short-lived
      // connection per task avoids holding sockets across task retries
      private val lines = {
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        TcpChangelog.exchange(p.host, p.port, s"FROM ${p.start} ${p.end}") { in =>
          var line = in.readLine()
          while (line != null) { buf += line; line = in.readLine() }
        }
        require(buf.size == p.end - p.start,
          s"changelog server replayed ${buf.size} lines for range " +
            s"[${p.start}, ${p.end}) — replay must be complete for " +
            "exactly-once recovery")
        buf
      }
      private var i = -1
      override def next(): Boolean = { i += 1; i < lines.size }
      override def get(): InternalRow = InternalRow(
        p.start + i, UTF8String.fromString(lines(i)))
      override def close(): Unit = ()
    }
  }
}

/** A minimal replayable-changelog server: an append-only in-memory log
  * served over TCP with two commands — `END` (current end offset) and
  * `FROM <start> <end>` (replay the half-open range). This is the
  * library's stand-in for the upstream system that owns the changelog
  * (MySQL binlog, a Kafka partition): the REPLAY capability lives with
  * the log owner, which is what lets the consumer be exactly-once. */
final class TcpChangelogServer {
  private val log = new java.util.concurrent.CopyOnWriteArrayList[String]()
  private val server = new ServerSocket(0) // ephemeral port
  @volatile private var running = true

  def port: Int = server.getLocalPort
  def append(lines: Seq[String]): Unit = log.addAll(lines.asJava)
  private implicit class SeqOps(s: Seq[String]) {
    def asJava: java.util.Collection[String] = {
      val l = new java.util.ArrayList[String](s.size)
      s.foreach(l.add); l
    }
  }

  private val thread = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        // one request per connection; served inline (requests are tiny)
        try {
          sock.setSoTimeout(30000)
          val in = new BufferedReader(new InputStreamReader(
            sock.getInputStream, StandardCharsets.UTF_8))
          val out = new BufferedWriter(new OutputStreamWriter(
            sock.getOutputStream, StandardCharsets.UTF_8))
          val req = in.readLine()
          if (req != null) req.trim.split("\\s+") match {
            case Array("END") =>
              out.write(log.size.toString); out.write("\n")
            case Array("FROM", s, e) =>
              val start = s.toLong
              val end = math.min(e.toLong, log.size.toLong)
              var i = start
              while (i < end) {
                out.write(log.get(i.toInt)); out.write("\n"); i += 1
              }
            case other =>
              out.write(s"ERR unknown request: ${other.mkString(" ")}\n")
          }
          out.flush()
        } finally sock.close()
      } catch {
        case _: java.net.SocketException => () // closed during accept
        case scala.util.control.NonFatal(_) => ()
      }
    }
  }, s"tcp-changelog-server-$port")
  thread.setDaemon(true)
  thread.start()

  def close(): Unit = { running = false; server.close() }
}
