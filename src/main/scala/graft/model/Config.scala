package graft.model

import scala.concurrent.duration._

/** Connector configuration, mirroring the reference's config model and its
  * validation invariants (reference: KinesisConfig.scala:14-111,
  * reference.conf defaults; Producer.scala:218-222 XOR checks).
  *
  * Spark mapping: these become source/sink options and spark.conf entries;
  * validation happens eagerly at construction, like the reference's
  * config-parse-time checks, instead of failing mid-stream.
  */
final case class EndpointConfig(
    kinesisEndpoint: Option[String],
    dynamoEndpoint: Option[String]) {
  // reference KinesisConfig.scala:37-40 — both-or-neither
  require(kinesisEndpoint.isDefined == dynamoEndpoint.isDefined,
    "kinesis-endpoint and dynamo-endpoint must be set together or not at all")
}

final case class ClientConfig(
    region: Option[String],
    endpoint: Option[String],
    accessKeyId: Option[String],
    secretKey: Option[String],
    minBackoff: FiniteDuration = 3.seconds,     // reference.conf:19-25
    maxBackoff: FiniteDuration = 30.seconds,
    randomFactor: Double = 0.2) {
  // reference Producer.scala:218-222 — endpoint XOR region, key pair together
  require(!(region.isDefined && endpoint.isDefined),
    "endpoint and region must not both be set")
  require(accessKeyId.isDefined == secretKey.isDefined,
    "access-key-id and secret-key must be set together or not at all")
}

final case class ConsumerConfig(
    applicationName: Option[String],
    maxBufferSize: Int = 10,   // reference.conf:39
    maxBatchSize: Int = 10,    // reference.conf:40
    startingPosition: String = "TRIM_HORIZON", // KinesisSubscriberActor.scala:193, made configurable
    // required by AT_TIMESTAMP (KCL InitialPositionInStream). Held in epoch
    // MICROseconds here; KinesisTopicSource converts to the epoch-millis
    // unit that KCL and the public Spark Kinesis connectors expect.
    startingTimestampMicros: Option[Long] = None) {
  require(maxBufferSize > 0 && maxBatchSize > 0, "buffer/batch sizes must be positive")
  require(Set("TRIM_HORIZON", "LATEST", "AT_TIMESTAMP").contains(startingPosition),
    s"invalid starting position $startingPosition")
  require(startingPosition != "AT_TIMESTAMP" || startingTimestampMicros.isDefined,
    "AT_TIMESTAMP requires startingTimestampMicros")
}

final case class ProducerConfig(role: Option[String] = None)

/** Consumer-group identity = checkpoint path identity. Reference rejects
  * 15 reserved characters in group ids (ScaladslKinesisSubscriber.scala:
  * 168-181); we enforce the same because the id becomes a filesystem
  * checkpoint directory. */
object GroupId {
  private val invalidChars: Set[Char] = "/\\,.*<>:|?'\"` ".toSet + ';' + '\t'

  def validate(groupId: String): String = {
    require(groupId.nonEmpty, "groupId must not be empty")
    val bad = groupId.filter(invalidChars.contains)
    require(bad.isEmpty, s"groupId contains reserved characters: $bad")
    groupId
  }
}
