package graft.engine

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.connector.TopicSource
import graft.delivery.Delivery
import graft.functions.VectorFunctions

/** Engine bootstrap + topic/query registry (SURVEY.md §2a #22-#23).
  *
  * The reference eagerly walks service descriptors and starts one producer
  * per topic at startup (ScaladslRegisterTopicProducers.scala:33-101,
  * LagomKinesisComponents.scala:29-31). Spark-first, the registry holds
  * declared subscriptions (topic source + user batch function) and starts
  * them as streaming queries on demand; "cluster distribution" of the work
  * is Spark's own task scheduling.
  */
object GraftEngine {

  /** Session with the scale-sane defaults this engine assumes: AQE on
    * (runtime shuffle coalescing + skew-join splitting), 32 shuffle
    * partitions for local[32] (a real cluster sets ~2-3× total cores). */
  def sessionBuilder(master: String = "local[32]",
                     shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // typed-aggregate buffers here are small (≤ 0.5 KB signature
      // arrays), so keep ObjectHashAggregate in hash mode well past the
      // 128-group default; 64k groups/task ≈ 34 MB of buffers
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")

  /** Create the session and register the engine's SQL functions. */
  def start(master: String = "local[32]"): SparkSession = {
    val spark = sessionBuilder(master).getOrCreate()
    VectorFunctions.register(spark)
    spark
  }

  final case class Subscription(
      source: TopicSource,
      groupId: String,
      transform: DataFrame => DataFrame,
      process: (DataFrame, Long) => Unit)

  /** Registry of declared subscriptions; `startAll` mirrors the eager
    * producer registration of the reference. */
  final class TopicRegistry(spark: SparkSession, checkpointRoot: String) {
    private val subs = TrieMap.empty[String, Subscription]
    private val running = TrieMap.empty[String, StreamingQuery]

    def register(sub: Subscription): Unit =
      subs.put(s"${sub.source.topicId}/${sub.groupId}", sub)

    def startAll(): Seq[StreamingQuery] =
      subs.toSeq.sortBy(_._1).map { case (key, sub) =>
        val q = Delivery.atLeastOnce(
          sub.transform(sub.source.load(spark)), sub.groupId, checkpointRoot)(sub.process)
        running.put(key, q)
        q
      }

    def stopAll(): Unit = { running.values.foreach(_.stop()); running.clear() }
    def queries: Map[String, StreamingQuery] = running.toMap
  }
}
