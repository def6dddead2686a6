package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Custom codegen'd Catalyst expressions for the pairwise hot loops.
  *
  * The built-in formulations (`array_intersect`, `zip_with` +
  * `aggregate`) are correct but pay per-pair set allocations or
  * interpreted lambda dispatch — at millions of candidate pairs that
  * dominates the dedup/similarity operators. These expressions stay
  * inside whole-stage codegen: a two-pointer merge and a fused
  * dot/norm loop, no allocation per row.
  */

/** Intersection size of two SORTED long arrays (two-pointer merge).
  * Callers must sort (`array_sort`) when building the sets — done once
  * per document, not per pair — and pass `array<long>` exactly (no
  * implicit input casts: `AbstractDataType` is private[sql], so this
  * expression skips `ExpectsInputTypes`). */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    val nx = x.numElements(); val ny = y.numElements()
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |while ($i < $nx && $j < $ny) {
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity of two double arrays in one fused pass
  * (dot product and both norms, sequential element order — the same
  * fold order as the `zip_with`/`aggregate` formulation, so results
  * are bit-identical). Zero-norm inputs yield 0.0. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    var na = 0.0; i = 0
    while (i < x.numElements()) { val v = x.getDouble(i); na += v * v; i += 1 }
    var nb = 0.0; i = 0
    while (i < y.numElements()) { val v = y.getDouble(i); nb += v * v; i += 1 }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val v = ctx.freshName("v"); val denom = ctx.freshName("denom")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  final double $v = $a.getDouble($i); $na += $v * $v;
         |}
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  final double $v = $b.getDouble($i); $nb += $v * $v;
         |}
         |final double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** 60-bit SimHash from a word-hash array in one fused pass: bit j of
  * the result is set iff the sum of ±1 votes (sign of bit j of each
  * hash) is positive — identical semantics to the 60
  * `aggregate`-fold formulation it replaces (all-integer, exact). */
case class SimHashFromHashes(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private val Bits = 60
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "simhash_from_hashes"

  override def nullSafeEval(h: Any): Any = {
    val arr = h.asInstanceOf[ArrayData]
    val votes = new Array[Int](Bits)
    var i = 0
    while (i < arr.numElements()) {
      val v = arr.getLong(i)
      var j = 0
      while (j < Bits) {
        votes(j) += (if (((v >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < Bits) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val v = ctx.freshName("v"); val out = ctx.freshName("out")
      s"""
         |final int[] $votes = new int[$Bits];
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  final long $v = $a.getLong($i);
         |  for (int $j = 0; $j < $Bits; $j++) {
         |    $votes[$j] += ((($v >> $j) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < $Bits; $j++) {
         |  if ($votes[$j] > 0) $out |= (1L << $j);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashFromHashes =
    copy(child = newChild)
}

/** Full MinHash signature in ONE fused pass: for base hashes
  * h ∈ child (already reduced mod P) and j ∈ [0, n), out[j] =
  * min_h (h·a_j + b_j) mod P with the universal-hash coefficients of
  * `TextFunctions.minHashCoeff` baked in. Replaces n interpreted
  * `array_min(transform(...))` HOF passes (n array traversals, each
  * with per-element lambda dispatch) with a single codegen'd loop —
  * elements outer, the n running minima inner. Input must be
  * non-empty (shingle arrays always are: short texts fall back to one
  * whole-text shingle); a null/absent input yields null. */
case class MinHashSignatureFused(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private val P = 1073741789L // TextFunctions.MinHashP
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "minhash_signature_fused"

  // coeff arrays precomputed once per expression instance (driver) and
  // shipped in the closure / embedded in generated code
  private lazy val coeffA: Array[Long] = Array.tabulate(n) { j =>
    val a = (2654435761L * (j + 1)) % P
    if (a == 0) 1L else a
  }
  private lazy val coeffB: Array[Long] =
    Array.tabulate(n)(j => (1779033703L * (j + 13)) % P)

  override def nullSafeEval(h: Any): Any = {
    val arr = h.asInstanceOf[ArrayData]
    val mins = Array.fill(n)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val v = arr.getLong(i)
      var j = 0
      while (j < n) {
        val g = (v * coeffA(j) + coeffB(j)) % P
        if (g < mins(j)) mins(j) = g
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val as = ctx.addReferenceObj("minhashA", coeffA, "long[]")
      val bs = ctx.addReferenceObj("minhashB", coeffB, "long[]")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val v = ctx.freshName("v"); val g = ctx.freshName("g")
      s"""
         |final long[] $mins = new long[$n];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  final long $v = $a.getLong($i);
         |  for (int $j = 0; $j < $n; $j++) {
         |    final long $g = ($v * $as[$j] + $bs[$j]) % ${P}L;
         |    if ($g < $mins[$j]) $mins[$j] = $g;
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSignatureFused = copy(child = newChild)
}

/** Session registration for the custom expressions, so operators can
  * reach them via `call_function` on any session (idempotent; no
  * dependence on how the session was built). */
object GraftFunctions {
  val IntersectSizeSorted = "graft_intersect_size_sorted"
  val Cosine = "graft_cosine"
  val SimHash = "graft_simhash"
  val MinHashSig = "graft_minhash_sig"
  val Normalize = "graft_text_normalize"

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(IntersectSizeSorted,
      exprs => SortedIntersectSize(exprs.head, exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction(Cosine,
      exprs => CosineSimilarity(exprs.head, exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction(SimHash,
      exprs => SimHashFromHashes(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction(MinHashSig,
      exprs => MinHashSignatureFused(exprs.head,
        exprs(1).eval().asInstanceOf[Int]), "scala_udf")
    reg.createOrReplaceTempFunction(Normalize,
      exprs => TextNormalize(exprs.head), "scala_udf")
  }
}
