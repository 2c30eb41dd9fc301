package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** First-fit-decreasing bin packing over one shard's items, as ONE
  * compiled expression (the [[GramAnchors]] reference-object
  * discipline): input is the shard's (len, id) structs in ANY order —
  * `collect_list` order is partition-nondeterministic, so the
  * expression sorts internally by (len DESC, id ASC) and then places
  * each item into the LOWEST-indexed bin whose fill + len ≤ capacity,
  * opening a new bin when none fits. Deterministic: the sort key is
  * total, so output is a pure function of the item SET.
  *
  * Oversize items (len > capacity) each get a bin of their own,
  * flagged — the training-batch builder's contract (a document longer
  * than the context either truncates upstream or rides alone); they
  * participate in the same decreasing order, so bins stay a pure
  * function of the set.
  *
  * Output: array<struct<id, len, bin, oversize>> in placement order.
  * Cost: O(n log n) sort + O(n · bins) first-fit scan per shard — the
  * shard is the unit of parallelism and is sized (numShards) to keep
  * n bounded; at 100 TB the shards fan out across the cluster while
  * each stays a single in-memory pack.
  */
case class FfdPack(child: Expression, capacity: Long) extends UnaryExpression {

  require(capacity >= 1, s"capacity must be positive, got $capacity")

  override def prettyName: String = "graft_ffd_pack"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("len", LongType, nullable = false),
      StructField("bin", IntegerType, nullable = false),
      StructField("oversize", BooleanType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable

  def compute(items: ArrayData): ArrayData = {
    val n = items.numElements()
    val lens = new Array[Long](n)
    val ids = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = items.getStruct(i, 2)
      lens(i) = row.getLong(0)
      ids(i) = row.getLong(1)
      i += 1
    }
    val order = Array.tabulate(n)(identity)
    // len DESC, id ASC — total order, so any input permutation packs
    // identically
    val ord = new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val c = java.lang.Long.compare(lens(b), lens(a))
        if (c != 0) c else java.lang.Long.compare(ids(a), ids(b))
      }
    }
    val boxed = order.map(Integer.valueOf)
    java.util.Arrays.sort(boxed, ord)
    val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
    val out = new Array[Any](n)
    var k = 0
    while (k < n) {
      val it = boxed(k).intValue()
      val len = lens(it)
      val bin =
        if (len > capacity) { fills += len; fills.length - 1 } // own bin
        else {
          var b = 0
          var found = -1
          while (found < 0 && b < fills.length) {
            if (fills(b) + len <= capacity) found = b else b += 1
          }
          if (found < 0) { fills += len; fills.length - 1 }
          else { fills(found) += len; found }
        }
      out(k) = InternalRow(ids(it), len, bin + 1, len > capacity)
      k += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("ffdPack", this, classOf[FfdPack].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): FfdPack =
    copy(child = newChild)
}

object FfdPack {
  /** Column API over an array<struct<len:long, id:long>> column. */
  def pack(items: Column, capacity: Long): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(FfdPack(GraftSqlShim.expression(items), capacity))
  }
}

/** ORDER-PRESERVING greedy sentence packing — the RAG/context-window
  * chunking shape [[FfdPack]] deliberately is not: retrieval chunks
  * must keep prose in reading order and never split a sentence, so the
  * greedy rule is "append the next sentence while the chunk stays ≤
  * maxChars (joined by `sep`), else start a new chunk". One compiled
  * reference-object node per document (the [[FfdPack]] discipline) —
  * row-local, O(total chars), rides the scan's codegen stage.
  *
  * A single sentence longer than maxChars becomes its own oversize
  * chunk (the caller truncates upstream or lets it ride — same
  * contract as FfdPack's oversize bins). Lengths are CODEPOINT counts
  * (Spark `length`/DuckDB `len` semantics), so the greedy boundary is
  * engine-portable. Deterministic: output is a pure function of the
  * sentence SEQUENCE.
  *
  * Output: array<string> of chunk texts in document order. */
case class SentencePack(child: Expression, maxChars: Int, sep: String)
    extends UnaryExpression {

  require(maxChars >= 1, s"maxChars must be positive, got $maxChars")
  require(sep != null, "sep must not be null")

  override def prettyName: String = "graft_sentence_pack"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val sepUtf =
    org.apache.spark.unsafe.types.UTF8String.fromString(sep)
  @transient private lazy val sepChars = sepUtf.numChars()

  def compute(sents: ArrayData): ArrayData = {
    val n = sents.numElements()
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Any]
    var cur: java.lang.StringBuilder = null
    var curLen = 0L
    var i = 0
    while (i < n) {
      val s = sents.getUTF8String(i)
      val sLen = s.numChars().toLong
      if (cur == null) {
        cur = new java.lang.StringBuilder(s.toString)
        curLen = sLen
      } else if (curLen + sepChars + sLen <= maxChars) {
        cur.append(sep).append(s.toString)
        curLen += sepChars + sLen
      } else {
        chunks += org.apache.spark.unsafe.types.UTF8String.fromString(cur.toString)
        cur = new java.lang.StringBuilder(s.toString)
        curLen = sLen
      }
      i += 1
    }
    if (cur != null)
      chunks += org.apache.spark.unsafe.types.UTF8String.fromString(cur.toString)
    new GenericArrayData(chunks.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("sentencePack", this, classOf[SentencePack].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SentencePack =
    copy(child = newChild)
}

object SentencePack {
  /** Column API over an array<string> sentence column. */
  def pack(sentences: Column, maxChars: Int, sep: String = " "): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(
      SentencePack(GraftSqlShim.expression(sentences), maxChars, sep))
  }
}
