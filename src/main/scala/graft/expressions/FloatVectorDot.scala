package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Σ aᵢ·bᵢ over two `Array[Float]` columns, accumulated left-to-right
  * in doubles — the embedding-similarity hot path as a native Catalyst
  * expression with whole-stage codegen.
  *
  * Semantically identical (bit-for-bit) to the composable form
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
  * 0.0, _ + _)`, but that form is an interpreted higher-order function:
  * per element it allocates lambda bindings and boxes the accumulator.
  * Inside an O(n²) pair join the dot product dominates, which is the
  * one place the engine drops from built-in functions to a custom
  * `Expression` (preference order: compose built-ins → custom
  * expression → custom plan node).
  *
  * Mismatched lengths use the shorter array (well-formed embedding
  * tables are fixed-dimension; the zip_with form yields null there —
  * callers on ragged data should validate dimensions upstream).
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

/** Σ embᵢ·wᵢ against a CONSTANT double-weight vector (the hyperplane
  * projection of Ann.bucket), compiled: the weights ride into the
  * generated code as a reference `double[]`, so per row the work is
  * one tight fused loop instead of an interpreted
  * `aggregate(zip_with(emb, lit(w), …))` fold — which is
  * CodegenFallback and was the last interpreted HOF in a gated query
  * hot path (round-6 plan audit; Ann's scaladoc already promised
  * codegen).
  *
  * Bit-parity with the HOF form (pinned by FloatVectorDotSpec):
  * left-to-right double accumulation of `(double) emb(i) * w(i)`;
  * null when the input array is null, contains a null element, or its
  * length differs from the weight vector (zip_with pads the shorter
  * side with nulls, nulling the whole fold — same observable). */
case class FloatVectorDotConst(child: Expression, weights: Seq[Double])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got ${other.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "float_vector_dot_const"

  @transient private lazy val w: Array[Double] = weights.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() != w.length) null
    else {
      var s = 0.0
      var i = 0
      while (i < w.length) {
        if (x.isNullAt(i)) return null
        s += x.getFloat(i).toDouble * w(i)
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val wRef = ctx.addReferenceObj("weights", w, "double[]")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $wRef.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $wRef.length; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += (double) $a.getFloat($i) * $wRef[$i];
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): FloatVectorDotConst = copy(child = newChild)
}

/** Σ_s table[s·c + codes[s]] over a packed PQ-codes column against a
  * CONSTANT flattened ADC table — the product-quantization scan kernel
  * (ProductQuant.adcScoreLit). Per corpus row the work is m array
  * lookups into a reference `double[]` in one fused loop; the
  * interpreted `aggregate(zip_with(codes, sequence(...), …))` twin is
  * CodegenFallback and measured ~40% slower than even the brute-force
  * FloatVectorDot scan at 200k×64 (tools/ProbePq), which would defeat
  * PQ's entire purpose.
  *
  * Null when the input array is null, its length disagrees with
  * table.length / c, any element is null, or a code falls outside
  * [0, c) (a corrupt code is a data error — surfaced as null, not an
  * exception, matching element_at-out-of-range-under-try semantics the
  * HOF twin would produce as an ANSI error; ProductQuantSpec pins
  * kernel-vs-join-form score parity). */
case class AdcLookupSum(child: Expression, table: Seq[Double], c: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) =>
        if (c > 0 && table.nonEmpty && table.length % c == 0)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a non-empty table with length divisible by c=$c")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> codes, got ${other.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_lookup_sum"

  @transient private lazy val t: Array[Double] = table.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val m = x.numElements()
    if (m * c != t.length) null
    else {
      var s = 0.0
      var i = 0
      while (i < m) {
        if (x.isNullAt(i)) return null
        val code = x.getLong(i)
        if (code < 0 || code >= c) return null
        s += t(i * c + code.toInt)
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tRef = ctx.addReferenceObj("adcTable", t, "double[]")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val code = ctx.freshName("code")
      s"""
         |if ($a.numElements() * $c != $tRef.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $code = $a.getLong($i);
         |    if ($code < 0 || $code >= $c) { ${ev.isNull} = true; break; }
         |    $s += $tRef[$i * $c + (int) $code];
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): AdcLookupSum = copy(child = newChild)
}

object FloatVectorDot {
  /** Column-API entry point. */
  def dot(a: Column, b: Column): Column =
    Shim.column(FloatVectorDot(Shim.expression(a), Shim.expression(b)))

  /** Dot against a constant weight vector (codegen'd). */
  def dotConst(emb: Column, weights: Seq[Double]): Column =
    Shim.column(FloatVectorDotConst(Shim.expression(emb), weights))

  /** PQ ADC lookup-sum against a constant flattened table (codegen'd). */
  def adcLookup(codes: Column, table: Seq[Double], c: Int): Column =
    Shim.column(AdcLookupSum(Shim.expression(codes), table, c))
}
