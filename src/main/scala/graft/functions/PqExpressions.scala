package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization (PQ) expressions — the billion-scale ANN
  * compression step (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011): a D-dim vector becomes `m` one-byte
  * codes, one per D/m-dim subspace, each the index of the nearest
  * subspace centroid; search scores candidates with an
  * asymmetric-distance (ADC) table lookup — O(m) per candidate instead
  * of O(D), and the index is 4·D/m× smaller than the float corpus (64
  * floats → 4 bytes at m=4), which at 100 TB turns a bandwidth-bound
  * float scan into a byte scan.
  *
  * Same design rules as [[NearestCentroids]]: the codebook rides the
  * generated code as ONE reference object, per-row work is a tight JVM
  * loop, codegen size is constant in m·ksub.
  *
  * Bit-compatibility contract (the q115 oracle replays all of it in
  * SQL): encode distance is Σ (x−c)² accumulated in index order
  * (float→double promotion per element, fold from 0.0 — IEEE-equal to
  * DuckDB's `list_reduce` fold from the first term); argmin ties to the
  * SMALLER code; ADC table entries are index-order inner products; the
  * candidate score sums the m table entries in subspace order
  * (left-assoc, mirrored by explicit parentheses in the oracle). */

/** PQ codebook: `codebook(j)(c)` is subspace j's centroid c (dsub
  * floats). Built by [[graft.ops.Similarity.pqModelPortable]] from the
  * md5-ordered portable seed rows, so an external engine re-derives it
  * verbatim. */
case class PqModel(m: Int, dsub: Int, codebook: Array[Array[Array[Float]]])
    extends Serializable {
  require(m >= 1 && codebook.length == m, s"codebook must have m=$m subspaces")
  val ksub: Int = codebook(0).length

  /** The shared encode loop: per subspace, the argmin-L2² centroid
    * index (index-order accumulation, strict < so ties go to the
    * smaller code). Missing input elements read as 0.0. */
  def encode(arr: ArrayData): Array[Int] = {
    val out = new Array[Int](m)
    val xn = arr.numElements()
    var j = 0
    while (j < m) {
      val off = j * dsub
      val cands = codebook(j)
      var best = 0
      var bestD = java.lang.Double.POSITIVE_INFINITY
      var c = 0
      while (c < cands.length) {
        val cv = cands(c)
        var d2 = 0.0
        var i = 0
        while (i < dsub) {
          val x = if (off + i < xn) arr.getFloat(off + i).toDouble else 0.0
          val diff = x - cv(i).toDouble
          d2 += diff * diff
          i += 1
        }
        if (java.lang.Double.compare(d2, bestD) < 0) { bestD = d2; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    out
  }
}

/** vec → m-byte PQ code array (BinaryType). */
case class PqEncode(child: Expression, model: PqModel)
    extends UnaryExpression with ExpectsInputTypes {

  override def prettyName: String = "graft_pq_encode"
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable

  def compute(arr: ArrayData): Array[Byte] = {
    val codes = model.encode(arr)
    val out = new Array[Byte](codes.length)
    var j = 0
    while (j < codes.length) { out(j) = codes(j).toByte; j += 1 }
    out
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** vec → m PQ codes as array<int> — the training-loop form of
  * [[PqEncode]] (Spark columns can slice/group ints where binary would
  * need byte-twiddling). Same shared argmin loop, same ties. */
case class PqEncodeCodes(child: Expression, model: PqModel)
    extends UnaryExpression with ExpectsInputTypes {

  override def prettyName: String = "graft_pq_encode_codes"
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  def compute(arr: ArrayData): ArrayData =
    new GenericArrayData(model.encode(arr).map(_.asInstanceOf[Any]))

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncodeCodes", this, classOf[PqEncodeCodes].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeCodes =
    copy(child = newChild)
}

/** query vec → flat ADC table (ArrayType(Double), length m·ksub):
  * entry j·ksub+c is the inner product of the query's subspace-j slice
  * with codebook(j)(c), accumulated in index order. */
case class PqDistTable(child: Expression, model: PqModel)
    extends UnaryExpression with ExpectsInputTypes {

  override def prettyName: String = "graft_pq_dist_table"
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable

  def compute(arr: ArrayData): ArrayData = {
    val xn = arr.numElements()
    val out = new Array[Any](model.m * model.ksub)
    var j = 0
    while (j < model.m) {
      val off = j * model.dsub
      val cands = model.codebook(j)
      var c = 0
      while (c < cands.length) {
        val cv = cands(c)
        var ip = 0.0
        var i = 0
        while (i < model.dsub) {
          val x = if (off + i < xn) arr.getFloat(off + i).toDouble else 0.0
          ip += x * cv(i).toDouble
          i += 1
        }
        out(j * model.ksub + c) = ip
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqDistTable", this, classOf[PqDistTable].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqDistTable =
    copy(child = newChild)
}

/** (codes: binary, adcTable: array<double>) → approximate inner
  * product: Σ_j table[j·ksub + codes[j]], left-assoc in subspace
  * order. The O(m) ADC lookup that replaces the O(D) float dot. */
case class PqAdcScore(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression with ExpectsInputTypes {

  override def prettyName: String = "graft_pq_adc"
  override def inputTypes: Seq[DataType] = Seq(BinaryType, ArrayType(DoubleType))
  override def dataType: DataType = DoubleType

  def compute(codes: Array[Byte], table: ArrayData): Double = {
    var acc = 0.0
    var j = 0
    while (j < codes.length) {
      acc += table.getDouble(j * ksub + (codes(j) & 0xff))
      j += 1
    }
    acc
  }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[Array[Byte]], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdcScore].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}
