package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Wire-level envelopes, modeled on the reference's record shapes.
  *
  * Outbound mirrors `KinesisOutboundRecord(data, partitionKey,
  * explicitHashKey)` (reference: service/core/kinesis/server/src/main/scala/
  * com/lightbend/lagom/internal/broker/kinesis/KinesisOutboundRecord.scala:5-9).
  * Inbound mirrors the KCL record surface consumed at
  * KinesisSubscriberActor.scala:145 (payload bytes + partition key +
  * sequence number + arrival time); the per-record `markProcessed()`
  * handle has no row-level equivalent — commit is the engine's
  * checkpoint WAL (SURVEY.md §2a #7-#11).
  */
case class OutboundRecord(
    data: Array[Byte],
    partitionKey: String,
    explicitHashKey: Option[String])

case class InboundRecord(
    data: Array[Byte],
    partitionKey: String,
    sequenceNumber: String,
    approximateArrivalTimestamp: Timestamp)

object Envelope {
  val outboundSchema: StructType = StructType(Seq(
    StructField("data", BinaryType, nullable = false),
    StructField("partitionKey", StringType, nullable = false),
    StructField("explicitHashKey", StringType, nullable = true)))

  val inboundSchema: StructType = StructType(Seq(
    StructField("data", BinaryType, nullable = false),
    StructField("partitionKey", StringType, nullable = false),
    StructField("sequenceNumber", StringType, nullable = false),
    StructField("approximateArrivalTimestamp", TimestampType, nullable = false)))
}
