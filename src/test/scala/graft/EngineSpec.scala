package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.functions._

import graft.connector.{FileTopicSource, KinesisTopicSource, TopicSink}
import graft.delivery.Supervision
import graft.engine.GraftEngine
import graft.model.{ClientConfig, ConsumerConfig}
import graft.testkit.{FakeKinesis, FakeKinesisSender}

import scala.concurrent.duration._

/** Engine registry (eager topic subscriptions) + backoff supervision. */
class EngineSpec extends SparkSpec {

  test("topic registry starts registered subscriptions and processes data") {
    val dir = Files.createTempDirectory("graft-engine").toString
    graft.ops.Tables.table(spark, sf, "events")
      .write.mode("overwrite").parquet(s"$dir/topic")
    val seen = new ConcurrentLinkedQueue[Long]()
    val registry = new GraftEngine.TopicRegistry(spark, s"$dir/ckpt")
    registry.register(GraftEngine.Subscription(
      source = FileTopicSource("events", s"$dir/topic",
        schema = graft.ops.Tables.table(spark, sf, "events").schema),
      groupId = "engine-test",
      transform = df => df.filter(col("event_type") === "click"),
      process = (batch, _) => seen.add(batch.count())))
    val queries = registry.startAll()
    assert(queries.size == 1)
    queries.foreach(_.awaitTermination()) // AvailableNow drains and stops
    registry.stopAll()
    import scala.jdk.CollectionConverters._
    assert(seen.size() >= 1 && seen.asScala.sum > 0,
      "click events must have been processed")
  }

  test("engine end-to-end: kinesis subscription consumes, processes, republishes") {
    // the reference's full lifecycle in one loop: registry-declared
    // subscription reads a (fake) kinesis stream through the production
    // KinesisTopicSource.load(), the processing function relays through
    // the ordered sink into a second stream
    FakeKinesis.createStream("e2e-in", 2)
    FakeKinesis.createStream("e2e-out", 2)
    (0 until 12).foreach(i =>
      FakeKinesis.putRecord("e2e-in", s"k${i % 3}", s"""{"v":$i}""".getBytes("UTF-8")))
    val dir = Files.createTempDirectory("graft-e2e").toString
    val seen = new ConcurrentLinkedQueue[Long]()
    val registry = new GraftEngine.TopicRegistry(spark, s"$dir/ckpt")
    registry.register(GraftEngine.Subscription(
      source = KinesisTopicSource("e2e-in", ConsumerConfig(Some("app"), maxBatchSize = 100)),
      groupId = "g-e2e",
      transform = identity,
      process = (batch, _) => {
        batch.select("sequenceNumber").collect()
          .foreach(r => seen.add(r.getString(0).toLong))
        val env = batch.select(col("data"), col("partitionKey"),
          lit(null).cast("string").as("explicitHashKey"),
          col("sequenceNumber").cast("long").as("seq"))
        TopicSink.writeOrdered(env, "seq", () => new FakeKinesisSender("e2e-out"), 2)
      }))
    val queries = registry.startAll()
    queries.foreach(_.awaitTermination())
    registry.stopAll()
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSet == (0L until 12L).toSet,
      s"subscription must consume every record exactly once: ${seen.asScala.toSet}")
    val out = (0 until 2).flatMap(s => FakeKinesis.slice("e2e-out", s, 0L, 12L))
    assert(out.size == 12, s"republished stream incomplete: ${out.size}")
    for ((k, recs) <- out.groupBy(_.partitionKey)) {
      val vals = recs.sortBy(_.seq).map(r => new String(r.data, "UTF-8"))
      val expected = (0 until 12).filter(i => s"k${i % 3}" == k).map(i => s"""{"v":$i}""")
      assert(vals == expected, s"per-key order broken in republished stream for $k")
    }
  }

  test("producer role gates publication placement (reference parity)") {
    val dir = Files.createTempDirectory("graft-pub").toString
    graft.ops.Tables.table(spark, sf, "region")
      .write.mode("overwrite").parquet(s"$dir/topic")
    val started = new ConcurrentLinkedQueue[String]()
    def pub(id: String, role: Option[String]) =
      GraftEngine.Publication(id, graft.model.ProducerConfig(role), { () =>
        started.add(id)
        graft.delivery.Delivery.atLeastOnce(
          spark.readStream
            .schema(graft.ops.Tables.table(spark, sf, "region").schema)
            .parquet(s"$dir/topic"),
          s"pub-$id", s"$dir/ckpt")((batch, _) => batch.count())
      })
    val registry = new GraftEngine.TopicRegistry(spark, s"$dir/ckpt",
      nodeRoles = Set("writer"))
    registry.register(pub("roleless", None))
    registry.register(pub("gated-match", Some("writer")))
    registry.register(pub("gated-other", Some("reader")))
    val queries = registry.startProducers()
    queries.foreach(_.awaitTermination())
    registry.stopAll()
    import scala.jdk.CollectionConverters._
    assert(started.asScala.toSet == Set("roleless", "gated-match"),
      s"role gating placed the wrong producers: ${started.asScala.toSet}")
    assert(queries.size == 2)
  }

  test("GraftExtensions injects the as-of strategy and working SQL functions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext)
    val strategies = org.apache.spark.sql.GraftSqlShim.plannerStrategies(ext, spark)
    assert(strategies.contains(graft.plans.AsOfJoinStrategy),
      s"as-of strategy missing from injected set: $strategies")
    // every injected builder must produce a usable expression
    val builders = GraftExtensions.functions.toMap
    val cos = builders("graft_cosine")
    val lit = org.apache.spark.sql.catalyst.expressions.Literal.create(
      Array(1.0f, 0.0f), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType))
    assert(cos(Seq(lit, lit)).eval(null) == 1.0)
    val mh = builders("graft_minhash")
    val toks = org.apache.spark.sql.catalyst.expressions.Literal.create(
      Array("a", "b"), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType))
    val eight = org.apache.spark.sql.catalyst.expressions.Literal(8)
    assert(mh(Seq(toks, eight)).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].numElements() == 8)
  }

  test("recommended conf posture is applied by the builder and settable at runtime") {
    // the builder path: every recommended key must be baked into the
    // builder's options (the session under test was built elsewhere, so
    // assert on the builder rather than a second context)
    val opts = org.apache.spark.sql.GraftSqlShim.builderOptions(
      GraftEngine.sessionBuilder("local[2]", shufflePartitions = 2))
    GraftEngine.recommendedConfs.foreach { case (k, v) =>
      assert(opts.get(k).contains(v), s"builder must pin $k=$v, got ${opts.get(k)}")
    }
    assert(opts.get("spark.sql.shuffle.partitions").contains("2"))
    // the retrofit path: every key is a runtime-settable SQL conf
    val before = GraftEngine.recommendedConfs.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      GraftEngine.applyRecommendedConfs(spark)
      GraftEngine.recommendedConfs.foreach { case (k, v) =>
        assert(spark.conf.get(k) == v, s"applyRecommendedConfs must set $k=$v")
      }
    } finally before.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("backoff supervision restarts a failing query with growing delays") {
    val dir = Files.createTempDirectory("graft-sup").toString
    graft.ops.Tables.table(spark, sf, "region")
      .write.mode("overwrite").parquet(s"$dir/topic")
    val delays = scala.collection.mutable.ListBuffer[Long]()
    @volatile var failures = 2
    val restarts = Supervision.superviseSync(
        ClientConfig(None, None, None, None,
          minBackoff = 10.millis, maxBackoff = 80.millis),
        maxRestarts = 5,
        sleeper = d => delays += d)(() =>
      graft.delivery.Delivery.atLeastOnce(
        spark.readStream
          .schema(graft.ops.Tables.table(spark, sf, "region").schema)
          .parquet(s"$dir/topic"),
        "sup-test", s"$dir/ckpt-${System.nanoTime()}") { (batch, _) =>
        if (failures > 0) { failures -= 1; sys.error("boom") }
        batch.count()
      })
    assert(restarts == 2, s"expected 2 restarts, got $restarts")
    assert(delays.size == 2 && delays(1) >= delays.head,
      s"backoff must not shrink: $delays")
  }

  test("nextBackoff follows min * 2^attempt capped at max") {
    val cfg = ClientConfig(None, None, None, None,
      minBackoff = 3.seconds, maxBackoff = 30.seconds, randomFactor = 0.0)
    val rnd = new scala.util.Random(1)
    assert(Supervision.nextBackoff(cfg, 0, rnd) == 3.seconds)
    assert(Supervision.nextBackoff(cfg, 1, rnd) == 6.seconds)
    assert(Supervision.nextBackoff(cfg, 2, rnd) == 12.seconds)
    assert(Supervision.nextBackoff(cfg, 5, rnd) == 30.seconds) // capped
  }
}
