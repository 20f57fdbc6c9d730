package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for vector math on `array<double>` columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) is
  * interpreted — closure-per-element, boxed doubles. These expressions stay
  * inside whole-stage codegen: a tight primitive loop over `ArrayData`, no
  * allocation per row. At 2M candidate pairs × 64 dims the difference is
  * ~40× end-to-end (measured on the embedding near-dup query).
  *
  * Semantics: dot over the common prefix length; null if either side is
  * null (NullIntolerant via BinaryExpression default).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<double> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Static helper the generated code calls for sign-LSH band keys — the
  * whole B×r-hyperplane projection runs as one JVM loop per row (the
  * declarative formulation would be a ~12k-node expression tree that
  * Catalyst re-inlines per band).
  *
  * Hyperplane family: pseudo-random ±1 weights derived from md5 — weight
  * w(j, i) for hyperplane j, 0-based dimension i is +1 iff the first hex
  * digit of md5("j:i") is even, else −1. Fully deterministic and
  * engine-independent: the DuckDB oracle rebuilds the identical matrix
  * from the same md5 parity rule (SimilarityQueries' weight CTE). Band b
  * (0-based) is the r-character '0'/'1' string of signs of hyperplanes
  * j ∈ [b·r, b·r+r).
  */
object SignLshOps {

  // weight matrices are a function of (nbits, dim) only — cache per shape
  // (one per executor JVM; a 192×64 matrix is ~100 KB)
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def md5FirstNibbleEven(s: String): Boolean = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((d(0) >> 4) & 0xf) % 2 == 0
  }

  private def weights(nbits: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((nbits, dim), { _ =>
      Array.tabulate(nbits, dim)((j, i) =>
        if (md5FirstNibbleEven(s"$j:$i")) 1.0 else -1.0)
    })

  /** All `bands` sign-LSH band keys for one vector (see scaladoc above).
    * Returns NULL (not a key) for vectors containing a null element: a
    * null slot would silently read as 0.0 and yield a plausible-looking
    * but arbitrary band key — the same any-null-in → null-out policy the
    * scalar vector expressions follow.
    */
  def bandKeys(vec: ArrayData, bands: Int, r: Int): ArrayData = {
    val dim = vec.numElements()
    val w = weights(bands * r, dim)
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return null
      v(i) = vec.getDouble(i); i += 1
    }
    val out = new Array[AnyRef](bands)
    var b = 0
    while (b < bands) {
      val key = new Array[Char](r)
      var jj = 0
      while (jj < r) {
        val wj = w(b * r + jj)
        var s = 0.0
        var d = 0
        while (d < dim) { s += v(d) * wj(d); d += 1 }
        key(jj) = if (s >= 0) '1' else '0'
        jj += 1
      }
      out(b) = UTF8String.fromString(new String(key))
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Johnson-Lindenstrauss projection of one vector onto the first `k`
    * md5-parity hyperplanes, scaled by 1/sqrt(k). Same null policy as
    * bandKeys: any null element → null result. The weights cache is keyed
    * (k, dim), and row j of weights(k, dim) is identical to row j of the
    * band-key matrix — one deterministic hyperplane family serves both
    * hashing and projection.
    */
  def project(vec: ArrayData, k: Int): ArrayData = {
    val dim = vec.numElements()
    val w = weights(k, dim)
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return null
      v(i) = vec.getDouble(i); i += 1
    }
    val inv = 1.0 / math.sqrt(k.toDouble)
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      val wj = w(j)
      var s = 0.0
      var d = 0
      while (d < dim) { s += v(d) * wj(d); d += 1 }
      out(j) = s * inv
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** sign_lsh_band_keys(vec: array<double>, bands, r): array<string> —
  * OR-amplified random-hyperplane LSH keys for cosine near-dup search.
  */
case class SignLshBandKeys(child: Expression, bands: Int, r: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"sign_lsh_band_keys requires array<double>, got ${dt.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "sign_lsh_band_keys"
  // a non-null input vector can still produce a null result (any null
  // ELEMENT → null output, see SignLshOps.bandKeys), so the expression
  // is nullable regardless of the child and the codegen must branch on
  // the helper's result instead of assuming it non-null
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any): Any =
    SignLshOps.bandKeys(a.asInstanceOf[ArrayData], bands, r)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("keys")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.functions.SignLshOps.bandKeys($c, $bands, $r);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Johnson-Lindenstrauss random projection to `k` dimensions using the
  * SAME md5-parity ±1 hyperplane family as sign-LSH (projection j is
  * hyperplane j), scaled by 1/sqrt(k) so expected pairwise distances and
  * norms are preserved. The dimensionality-reduction step a 100-TB ANN
  * pipeline runs before indexing: a 64→16 projection cuts index size and
  * distance cost 4× at a bounded cosine distortion. Deterministic and
  * engine-independent — an external SQL engine rebuilds the identical
  * matrix from the md5 parity rule.
  */
case class RandomProject(child: Expression, k: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckFailure(
      s"random_project requires k > 0, got $k")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"random_project requires array<double>, got ${dt.catalogString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "random_project"
  // any null ELEMENT → null output (same policy as sign_lsh_band_keys)
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any): Any =
    SignLshOps.project(a.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("proj")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.functions.SignLshOps.project($c, $k);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object VectorExpressions {
  /** `vec_dot(a, b)` as a Column — codegen'd dot product. */
  def vecDot(a: Column, b: Column): Column =
    GraftSqlBridge.column(VecDot(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** `sign_lsh_band_keys(v, bands, r)` as a Column. */
  def signLshBandKeys(v: Column, bands: Int, r: Int): Column =
    GraftSqlBridge.column(SignLshBandKeys(
      GraftSqlBridge.expression(v), bands, r))

  /** `random_project(v, k)` as a Column. */
  def randomProject(v: Column, k: Int): Column =
    GraftSqlBridge.column(RandomProject(GraftSqlBridge.expression(v), k))
}
