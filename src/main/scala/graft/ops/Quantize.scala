package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization — the storage/bandwidth lever for vector
  * corpora at 100 TB scale: int8 symmetric quantization cuts an
  * `array<float>` column 4× (and a downstream ANN scan's memory traffic
  * with it) at a recall cost small enough for candidate generation;
  * exact re-ranking then reads the float vectors for the survivors only.
  *
  * Everything here is per-row column expressions (transform /
  * array_max — codegen'd, no UDF, no shuffle), so quantization
  * parallelizes embarrassingly and composes with any scan.
  *
  * Determinism: scale extraction (max |v|) is exact float comparison;
  * the quantized lane is `floor(v * 127 / maxabs + 0.5)` — multiply,
  * divide and floor are all correctly-rounded IEEE ops, so the integer
  * codes are bit-reproducible across engines and partitionings.
  */
object Quantize {

  /** Per-vector max-|v| in double precision (exact promotion from float). */
  def maxAbs(vecCol: Column): Column =
    array_max(transform(vecCol, x => abs(x.cast("double"))))

  /** Symmetric int8 codes: round-half-up of v scaled to [-127, 127].
    * A zero vector quantizes to all zeros (scale 0 sentinel). */
  def int8Codes(vecCol: Column, maxAbsCol: Column): Column =
    transform(vecCol, x =>
      when(maxAbsCol === 0d, lit(0L)).otherwise(
        greatest(lit(-127L), least(lit(127L),
          floor(x.cast("double") * lit(127.0) / maxAbsCol + lit(0.5))))))

  /** Quantize an embedding column: (idCol, scale, q) where
    * `v ≈ q * scale`. `scale = maxabs / 127` (double).
    *
    * The per-row max is materialized in its own projection BEFORE the
    * code lambda references it: higher-order-function lambdas evaluate
    * interpreted, and an expression nested inside one re-evaluates per
    * ELEMENT — inlining maxAbs (itself an O(dim) array fold) into the
    * per-element clamp made quantization O(dim²) interpreted ops per
    * row (measured 64× overhead at dim=64). Two projections keep the
    * lambda's captured input a plain attribute. CollapseProject leaves
    * this alone: the alias is referenced more than once and is not
    * cheap, so the optimizer does not re-inline it. */
  def int8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), maxAbs(col(vecCol)).as("__ma"), col(vecCol).as("__v"))
      .select(col(idCol),
        (col("__ma") / lit(127.0)).as("scale"),
        int8Codes(col("__v"), col("__ma")).as("q"))

  /** Dequantized reconstruction (array<double>), for error analysis. */
  def dequantize(qCol: Column, scaleCol: Column): Column =
    transform(qCol, q => q.cast("double") * scaleCol)

  /** Max absolute reconstruction error per vector — the quantization
    * quality metric (bounded by scale/2 for in-range lanes). */
  def maxError(vecCol: Column, qCol: Column, scaleCol: Column): Column =
    array_max(zip_with(vecCol, qCol,
      (v, q) => abs(v.cast("double") - q.cast("double") * scaleCol)))

  // --- signed random projection (JL dimensionality reduction) -----------

  /** PORTABLE ±1 sign matrix for [[srpProject]]: sign(j, i) comes from
    * the parity of md5's first hex nibble over "seed:j:i" — computed
    * once driver-side (outDim·dim md5s), and recomputable verbatim by
    * any engine with md5, which is what lets the projection itself
    * carry a full differential oracle (the xxhash64-seeded LSH planes
    * in [[Similarity]] cannot). */
  def srpSigns(dim: Int, outDim: Int, seed: Long = 42L): Array[Array[Float]] = {
    require(dim >= 1 && outDim >= 1, s"bad dims: $dim -> $outDim")
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(outDim) { j =>
      Array.tabulate(dim) { i =>
        val hex = md.digest(s"$seed:$j:$i".getBytes("UTF-8"))
        md.reset()
        // first hex nibble = high nibble of byte 0
        if ((((hex(0) >> 4) & 0xf) % 2) == 0) 1.0f else -1.0f
      }
    }
  }

  /** Johnson-Lindenstrauss-style dimensionality reduction with a ±1
    * (Achlioptas) projection: out(j) = Σ_i sign(j,i)·x(i). Distances
    * and cosines are preserved in expectation with variance ~1/outDim —
    * the cheap pre-filter/storage lever when even int8 at full `dim` is
    * too wide (a 64-dim float vector becomes outDim doubles, and the
    * downstream LSH/dedup/ANN stages run on the short vectors).
    * Row-local codegen expression, no shuffle; the sign matrix rides
    * the plan as one reference object. */
  def srpProject(df: DataFrame, idCol: String, vecCol: String,
                 outDim: Int, dim: Int, seed: Long = 42L): DataFrame =
    df.select(col(idCol),
      graft.functions.VectorFunctions.signedProject(col(vecCol),
        srpSigns(dim, outDim, seed)).as("proj"))
}
