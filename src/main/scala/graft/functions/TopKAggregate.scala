package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.util.PriorityQueue

import org.apache.spark.sql.{GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Exact top-k values as a Catalyst TypedImperativeAggregate (SURVEY.md
  * §7.3's "TypedImperativeAggregate ... sketches" slot).
  *
  * State is a k-bounded min-heap, so the aggregation buffer is O(k)
  * regardless of group size, partials combine associatively (map-side
  * combine works), and the result — the k largest values, sorted
  * descending — is independent of row order: deterministic across
  * partitionings and engines, hence oracle-checkable, unlike sampling
  * sketches. Serialization between partial and final is k doubles.
  */
case class TopKValues(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PriorityQueue[Double]]
  with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def prettyName: String = "graft_topk"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): PriorityQueue[Double] =
    new PriorityQueue[Double](k + 1)

  override def update(buf: PriorityQueue[Double], input: InternalRow): PriorityQueue[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (buf.size < k) buf.add(d)
      else if (buf.peek() < d) { buf.poll(); buf.add(d) }
    }
    buf
  }

  override def merge(a: PriorityQueue[Double], b: PriorityQueue[Double]): PriorityQueue[Double] = {
    val it = b.iterator()
    while (it.hasNext) {
      val d = it.next()
      if (a.size < k) a.add(d)
      else if (a.peek() < d) { a.poll(); a.add(d) }
    }
    a
  }

  override def eval(buf: PriorityQueue[Double]): Any = {
    val arr = new Array[Double](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    // descending
    val out = new Array[Any](arr.length)
    i = 0
    while (i < arr.length) { out(i) = arr(arr.length - 1 - i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: PriorityQueue[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeDouble(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): PriorityQueue[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(in.readDouble()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKValues =
    copy(child = newChild)
}

object TopKValues {
  /** Register `graft_topk(col, k)` as a SQL aggregate (idempotent). */
  def register(spark: SparkSession): Unit =
    GraftSqlShim.registerFunction(spark, "graft_topk", { es =>
      val k = es(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
          v.toString.toInt
        case other =>
          throw new IllegalArgumentException(s"graft_topk k must be a literal, got $other")
      }
      // return the bare AggregateFunction — the analyzer wraps it in an
      // AggregateExpression, same as the built-in registry entries
      TopKValues(
        org.apache.spark.sql.catalyst.expressions.Cast(es(0), DoubleType), k)
    })
}
