package graft.javadsl

import java.util.{Optional, Set => JSet}
import java.util.function.{Function => JFunction}

import scala.jdk.CollectionConverters._

import org.apache.spark.api.java.function.VoidFunction2
import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.connector.{FileTopicSource, KinesisTopicSource, TopicSink, TopicSource}
import graft.delivery.Delivery
import graft.engine.GraftEngine
import graft.model.{ConsumerConfig, ProducerConfig}

/** Java-facing facade over the one Scala engine (reference javadsl
  * parity: the reference ships a second, Java DSL around the same broker
  * core — `KinesisTopicFactory.java:34-48`,
  * `JavadslKinesisSubscriber.scala:30-60`,
  * `JavadslRegisterTopicProducers.scala` — and SURVEY.md §2a #23 maps
  * both DSLs onto one engine).
  *
  * Spark-first this facade is THIN by design: Spark's Java API already
  * shares `Dataset<Row>` with Scala, so parity costs only the
  * Java-ergonomic edges — `java.util.Optional` instead of `Option`,
  * Java functional interfaces (`java.util.function.Function`, Spark's
  * own `VoidFunction2`) instead of Scala lambdas, `java.util.Set` for
  * node roles, and a `@FunctionalInterface` sender factory
  * ([[RecordSenderFactory]]) that Java lambdas can implement. Every
  * method delegates to the exact Scala object the scaladsl uses — no
  * second implementation to drift. */
object GraftTopics {

  private def toOption[T](o: Optional[T]): Option[T] =
    if (o.isPresent) Some(o.get) else None

  /** Consumer config with the reference defaults
    * (`reference.conf:39-40`); timestamps in epoch MICROseconds as the
    * config carries them (the source converts at the connector
    * boundary). */
  def consumerConfig(applicationName: Optional[String],
                     maxBufferSize: Int, maxBatchSize: Int,
                     startingPosition: String,
                     startingTimestampMicros: Optional[java.lang.Long]): ConsumerConfig =
    ConsumerConfig(toOption(applicationName), maxBufferSize, maxBatchSize,
      startingPosition, toOption(startingTimestampMicros).map(_.longValue()))

  /** Defaults-everything consumer config (TRIM_HORIZON, reference batch
    * caps). */
  def consumerConfig(applicationName: Optional[String]): ConsumerConfig =
    ConsumerConfig(toOption(applicationName))

  /** Dev/test file-backed topic — replays from the beginning like
    * TRIM_HORIZON; `maxBatchSize` is the per-trigger admission cap. */
  def fileSource(topicId: String, path: String, format: String,
                 schema: StructType, consumer: ConsumerConfig): TopicSource =
    FileTopicSource(topicId, path, format, schema, consumer)

  /** Production Kinesis topic (option passthrough to a Structured
    * Streaming Kinesis connector). */
  def kinesisSource(topicId: String, consumer: ConsumerConfig,
                    endpointUrl: Optional[String],
                    region: Optional[String]): TopicSource =
    KinesisTopicSource(topicId, consumer, toOption(endpointUrl), toOption(region))

  /** JSON payload decode (§2a #3 deserialize map). */
  def decodeJson(inbound: Dataset[Row], payloadSchema: StructType): Dataset[Row] =
    TopicSource.decodeJson(inbound, payloadSchema)

  /** Envelope encode (§2a #4-#5; empty `partitionKeyCol` = row-hash key,
    * the reference's fallback). */
  def encodeJson(df: Dataset[Row], partitionKeyCol: Optional[String]): Dataset[Row] =
    TopicSource.encodeJson(df, toOption(partitionKeyCol))

  /** Envelope encode with the order column carried alongside, ready for
    * [[writeOrdered]]. */
  def encodeJsonOrdered(df: Dataset[Row], seqCol: String,
                        partitionKeyCol: Optional[String]): Dataset[Row] =
    TopicSource.encodeJsonOrdered(df, seqCol, toOption(partitionKeyCol))

  /** Per-key ordered micro-batch publish (§2a #6). */
  def writeOrdered(batch: Dataset[Row], seqCol: String,
                   senderFactory: RecordSenderFactory, numPartitions: Int): Unit =
    TopicSink.writeOrdered(batch, seqCol, () => senderFactory.create(), numPartitions)

  /** At-least-once runner (§2a #14): `process` may see a batch twice
    * after failure, never miss one. */
  def atLeastOnce(df: Dataset[Row], groupId: String, checkpointRoot: String,
                  process: VoidFunction2[Dataset[Row], java.lang.Long]): StreamingQuery =
    Delivery.atLeastOnce(df, groupId, checkpointRoot) { (batch, id) =>
      process.call(batch, java.lang.Long.valueOf(id))
    }

  /** At-most-once runner (§2a #12): the durable ledger marks the batch
    * BEFORE the user function runs. */
  def atMostOnce(df: Dataset[Row], groupId: String, checkpointRoot: String,
                 ledgerRoot: String,
                 process: VoidFunction2[Dataset[Row], java.lang.Long]): StreamingQuery =
    Delivery.atMostOnce(df, groupId, checkpointRoot,
      graft.delivery.FileLedger(ledgerRoot)) { (batch, id) =>
      process.call(batch, java.lang.Long.valueOf(id))
    }

  /** Subscription for the registry (§2a #22-#23): Java functional
    * interfaces in, the engine's Scala case class out. */
  def subscription(source: TopicSource, groupId: String,
                   transform: JFunction[Dataset[Row], Dataset[Row]],
                   process: VoidFunction2[Dataset[Row], java.lang.Long]): GraftEngine.Subscription =
    GraftEngine.Subscription(source, groupId,
      df => transform.apply(df),
      (batch, id) => process.call(batch, java.lang.Long.valueOf(id)))

  /** Role-gated publication (§2a #18: a producer with a role runs only
    * on engine instances carrying that role). */
  def publication(topicId: String, role: Optional[String],
                  start: java.util.concurrent.Callable[StreamingQuery]): GraftEngine.Publication =
    GraftEngine.Publication(topicId, ProducerConfig(toOption(role)), () => start.call())

  /** Topic/query registry bound to this engine instance's roles. */
  def registry(spark: SparkSession, checkpointRoot: String,
               nodeRoles: JSet[String]): GraftEngine.TopicRegistry =
    new GraftEngine.TopicRegistry(spark, checkpointRoot, nodeRoles.asScala.toSet)
}
