package graft.javadsl.examples;

import java.util.Optional;

import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.streaming.StreamingQuery;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.sql.types.StructType;

import graft.connector.TopicSink;
import graft.connector.TopicSource;
import graft.javadsl.GraftTopics;
import graft.model.ConsumerConfig;

import static org.apache.spark.sql.functions.col;

/**
 * The reference's javadsl consumer-producer relay, written in plain Java
 * against {@link GraftTopics}: file topic source (TRIM_HORIZON replay,
 * admission-capped) &rarr; JSON decode &rarr; envelope re-encode &rarr;
 * per-key ordered sends, under the at-least-once runner. Exercised
 * end-to-end by JavadslSpec — this class is the compiled proof that the
 * Java surface is usable without writing any Scala (reference:
 * service/javadsl/kinesis/client/.../KinesisTopicFactory.java:34-48,
 * JavadslKinesisSubscriber.scala:30-60).
 */
public final class JavaRelayExample {

    private JavaRelayExample() {}

    /** Envelope rows staged on disk: (data binary, partitionKey string, seq long). */
    public static StructType envelopeSchema() {
        return new StructType()
            .add("data", DataTypes.BinaryType)
            .add("partitionKey", DataTypes.StringType)
            .add("seq", DataTypes.LongType);
    }

    /** Decoded payload: {"k": ..., "v": ...}. */
    public static StructType payloadSchema() {
        return new StructType()
            .add("k", DataTypes.StringType)
            .add("v", DataTypes.LongType);
    }

    public static StreamingQuery run(SparkSession spark, String stageDir,
                                     String checkpointRoot, int maxBatchFiles) {
        ConsumerConfig consumer = GraftTopics.consumerConfig(
            Optional.of("java-relay"), 10, maxBatchFiles, "TRIM_HORIZON",
            Optional.empty());
        TopicSource source = GraftTopics.fileSource(
            "java-relay-topic", stageDir, "parquet", envelopeSchema(), consumer);
        Dataset<Row> inbound = source.load(spark);
        return GraftTopics.atLeastOnce(inbound, "java-relay-group", checkpointRoot,
            (batch, batchId) -> {
                Dataset<Row> decoded = GraftTopics.decodeJson(batch, payloadSchema());
                Dataset<Row> flowed = decoded.select(
                    col("payload.k").alias("k"),
                    col("payload.v").alias("v"),
                    col("seq"));
                Dataset<Row> env = GraftTopics.encodeJsonOrdered(
                    flowed, "seq", Optional.of("k"));
                GraftTopics.writeOrdered(env, "seq",
                    () -> new TopicSink.CollectingSender(), 4);
            });
    }
}
