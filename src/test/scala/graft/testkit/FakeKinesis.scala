package graft.testkit

import java.util
import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** In-JVM Kinesis stand-in for tests — the offline analogue of the
  * reference's kinesalite verification flow (reference README.md:14-52).
  *
  * A "stream" is a set of shards; `putRecord` routes by MD5 of the
  * partition key (Kinesis's hash-range routing) and stamps a monotonic
  * sequence number, so per-shard order mirrors real Kinesis semantics.
  * [[FakeKinesisProvider]] exposes the registry as a Structured Streaming
  * DataSourceV2 registered under the short name `kinesis` (test classpath
  * only, via META-INF/services), so the production
  * `KinesisTopicSource.load()` call — `readStream.format("kinesis")` with
  * the real option map — runs through a genuine microbatch loop:
  * admission control (`maxFetchRecordsPerShard` caps each batch),
  * starting positions (TRIM_HORIZON/LATEST), offset checkpointing and
  * restart resume.
  */
object FakeKinesis {

  /** Record schema of the public spark-sql-kinesis connector family. */
  val schema: StructType = StructType(Seq(
    StructField("data", BinaryType),
    StructField("streamName", StringType),
    StructField("partitionKey", StringType),
    StructField("sequenceNumber", StringType),
    StructField("approximateArrivalTimestamp", TimestampType)))

  final case class Rec(partitionKey: String, data: Array[Byte], seq: Long, arrivalMicros: Long)

  private val streams = TrieMap.empty[String, Array[ArrayBuffer[Rec]]]
  private val seqs = TrieMap.empty[String, AtomicLong]

  def createStream(name: String, shards: Int): Unit = {
    streams.put(name, Array.fill(shards)(ArrayBuffer.empty[Rec]))
    seqs.put(name, new AtomicLong(0L))
  }

  /** Append one record, routed to a shard by MD5 of the partition key. */
  def putRecord(name: String, partitionKey: String, data: Array[Byte]): Long = {
    val shards = streams(name)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(partitionKey.getBytes("UTF-8"))
    val shard = math.floorMod(md(0).toInt, shards.length)
    val seq = seqs(name).getAndIncrement()
    // arrivals spaced 1 ms apart: AT_TIMESTAMP is millisecond-granular
    // (KCL contract), so the fixture must be distinguishable at that unit
    val rec = Rec(partitionKey, data, seq, 1700000000000000L + seq * 1000L)
    shards(shard).synchronized { shards(shard) += rec }
    seq
  }

  def shardSizes(name: String): Map[Int, Long] =
    streams(name).zipWithIndex.map { case (b, i) => i -> b.synchronized(b.size.toLong) }.toMap

  /** Per-shard position of the first record at or after `micros` —
    * the AT_TIMESTAMP starting point (records are appended in arrival
    * order, so the prefix below the timestamp is contiguous). */
  def positionsAt(name: String, micros: Long): Map[Int, Long] =
    streams(name).zipWithIndex.map { case (b, i) =>
      i -> b.synchronized(b.count(_.arrivalMicros < micros).toLong)
    }.toMap

  def slice(name: String, shard: Int, from: Long, until: Long): Array[Rec] = {
    val b = streams(name)(shard)
    b.synchronized { b.slice(from.toInt, until.toInt).toArray }
  }

  def reset(): Unit = { streams.clear(); seqs.clear() }
}

/** [[graft.connector.RecordSender]] that republishes into a fake stream —
  * lets `TopicSink.writeOrdered` close the consume→process→publish loop
  * against the same registry, like the reference's producer side. */
final class FakeKinesisSender(streamName: String) extends graft.connector.RecordSender {
  override def send(pk: String, data: Array[Byte], ehk: Option[String]): Unit = {
    FakeKinesis.putRecord(streamName, pk, data)
    ()
  }
}

/** DataSourceV2 provider registered as `kinesis` on the test classpath. */
class FakeKinesisProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kinesis"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = FakeKinesis.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new FakeKinesisTable(new CaseInsensitiveStringMap(properties))
}

final class FakeKinesisTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = s"fake-kinesis-${options.get("streamName")}"
  override def schema(): StructType = FakeKinesis.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = new ScanBuilder {
    override def build(): Scan = new Scan {
      override def readSchema(): StructType = FakeKinesis.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new FakeKinesisMicroBatch(
          options.get("streamName"),
          Option(options.get("startingPosition")).getOrElse("TRIM_HORIZON"),
          Option(options.get("maxFetchRecordsPerShard")).map(_.toInt).getOrElse(Int.MaxValue),
          Option(options.get("startingTimestamp")).map(_.toLong))  // epoch millis
    }
  }
}

/** Offset = consumed position per shard, serialized as a tiny JSON map. */
final case class ShardOffsets(pos: Map[Int, Long]) extends Offset {
  override def json(): String =
    pos.toSeq.sortBy(_._1).map { case (s, p) => s""""$s":$p""" }.mkString("{", ",", "}")
}
object ShardOffsets {
  private val entry = """"(\d+)":(\d+)""".r
  def parse(json: String): ShardOffsets =
    ShardOffsets(entry.findAllMatchIn(json).map(m => m.group(1).toInt -> m.group(2).toLong).toMap)
}

final class FakeKinesisMicroBatch(streamName: String, startingPosition: String,
                                  maxFetchPerShard: Int,
                                  startingTimestampMillis: Option[Long] = None)
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  @volatile private var availableNowTarget: Option[Map[Int, Long]] = None

  private def currentSizes: Map[Int, Long] = FakeKinesis.shardSizes(streamName)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(currentSizes)

  override def initialOffset(): Offset = startingPosition match {
    case "LATEST" => ShardOffsets(currentSizes)
    case "AT_TIMESTAMP" =>
      val ts = startingTimestampMillis.getOrElse(
        throw new IllegalArgumentException("AT_TIMESTAMP requires startingTimestamp"))
      ShardOffsets(FakeKinesis.positionsAt(streamName, ts * 1000L))
    case _ => ShardOffsets(currentSizes.map { case (s, _) => s -> 0L }) // TRIM_HORIZON
  }

  override def getDefaultReadLimit: ReadLimit =
    if (maxFetchPerShard == Int.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(maxFetchPerShard.toLong)

  /** Admission control: each microbatch advances at most
    * `maxFetchRecordsPerShard` per shard — the reference's
    * `max-batch-size` cap (KinesisSubscriberActor.scala:196). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ShardOffsets].pos
    val target = availableNowTarget.getOrElse(currentSizes)
    ShardOffsets(target.map { case (shard, size) =>
      shard -> math.min(size, s.getOrElse(shard, 0L) + maxFetchPerShard)
    })
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("admission-controlled source: use latestOffset(start, limit)")

  override def reportLatestOffset(): Offset = ShardOffsets(currentSizes)

  override def deserializeOffset(json: String): Offset = ShardOffsets.parse(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ShardOffsets].pos
    val e = end.asInstanceOf[ShardOffsets].pos
    e.toSeq.sortBy(_._1).map { case (shard, until) =>
      FakeShardPartition(streamName,
        FakeKinesis.slice(streamName, shard, s.getOrElse(shard, 0L), until)): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new FakeKinesisReaderFactory
}

final case class FakeShardPartition(streamName: String,
                                    records: Array[FakeKinesis.Rec]) extends InputPartition

final class FakeKinesisReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[FakeShardPartition]
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < p.records.length }
      override def get(): InternalRow = {
        val r = p.records(i)
        new GenericInternalRow(Array[Any](
          r.data,
          UTF8String.fromString(p.streamName),
          UTF8String.fromString(r.partitionKey),
          UTF8String.fromString(r.seq.toString),
          r.arrivalMicros))
      }
      override def close(): Unit = ()
    }
  }
}
