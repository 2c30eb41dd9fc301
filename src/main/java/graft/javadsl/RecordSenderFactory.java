package graft.javadsl;

import graft.connector.RecordSender;

/**
 * Java-facing factory for per-partition {@link RecordSender}s — the
 * javadsl analogue of the Scala {@code () => RecordSender} thunk that
 * {@code TopicSink.writeOrdered} takes. Serializable because the factory
 * ships to executors and is invoked once per partition (reference javadsl
 * surface: service/javadsl/kinesis/client/.../KinesisTopicFactory.java:34-48;
 * one engine under both DSLs, per SURVEY.md §2a #23).
 */
@FunctionalInterface
public interface RecordSenderFactory extends java.io.Serializable {
    RecordSender create();
}
