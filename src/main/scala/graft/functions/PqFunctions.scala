package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}

/** Product-quantization kernels as native expressions, with the codebook
  * riding INSIDE the expression (serialized with the plan, one array per
  * executor — the [[BpeEncode]] broadcast-small-model shape). The
  * composed-expression formulation ([[graft.pipeline.SimilarityPq]]'s
  * original m×k battery of `graft_sqdist` + `array_min` structs) is
  * semantically identical but costs the OPTIMIZER, not the executor: a
  * ~2000-node literal tree per encode that Catalyst re-analyzes and
  * Janino re-compiles per distinct codebook. One expression node keeps
  * plan size constant at any (m, k) — the form that survives a
  * production 256-entry codebook.
  */

/** `q: array<long>` → `struct(codes: array<int>, err: long)`: per
  * subspace, the argmin codebook entry (ties → lowest code, same
  * contract as the struct-battery form) and the summed exact
  * reconstruction error. Null on length mismatch or null element.
  */
case class PqEncodeExpr(child: Expression, cb: Array[Array[Array[Long]]])
  extends UnaryExpression with ImplicitCastInputTypes {

  private val m = cb.length
  private val k = cb(0).length
  private val ds = cb(0)(0).length

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("err", LongType, nullable = false)))
  override def prettyName: String = "graft_pq_encode"
  override def nullable: Boolean = true

  def encodeVec(qa: ArrayData): Any = {
    if (qa.numElements() != m * ds) return null
    val codes = new Array[Any](m)
    var err = 0L
    var s = 0
    while (s < m) {
      var bestD = Long.MaxValue
      var bestC = 0
      var c = 0
      while (c < k) {
        val cent = cb(s)(c)
        var d = 0L
        var j = 0
        while (j < ds) {
          if (qa.isNullAt(s * ds + j)) return null
          val diff = qa.getLong(s * ds + j) - cent(j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; bestC = c }
        c += 1
      }
      codes(s) = bestC
      err += bestD
      s += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(codes), err))
  }

  override def nullSafeEval(q: Any): Any = encodeVec(q.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
       |Object r = $ref.encodeVec($c);
       |if (r == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) r; }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** Asymmetric PQ distance: full-precision query subvectors vs the
  * centroids a `codes` array names — `Σ_s ‖q_s − cb_s[code_s]‖²`, an
  * exact long. Null on length mismatch, null element, or out-of-range
  * code.
  */
case class PqAdcDistExpr(left: Expression, right: Expression,
                         cb: Array[Array[Array[Long]]])
  extends BinaryExpression with ImplicitCastInputTypes {

  private val m = cb.length
  private val k = cb(0).length
  private val ds = cb(0)(0).length

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(IntegerType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_pq_adc"
  override def nullable: Boolean = true

  def adc(qa: ArrayData, codes: ArrayData): Any = {
    if (qa.numElements() != m * ds || codes.numElements() != m) return null
    var tot = 0L
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val c = codes.getInt(s)
      if (c < 0 || c >= k) return null
      val cent = cb(s)(c)
      var j = 0
      while (j < ds) {
        if (qa.isNullAt(s * ds + j)) return null
        val diff = qa.getLong(s * ds + j) - cent(j)
        tot += diff * diff
        j += 1
      }
      s += 1
    }
    tot
  }

  override def nullSafeEval(q: Any, c: Any): Any =
    adc(q.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdcDistExpr].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
       |Object r = $ref.adc($a, $b);
       |if (r == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = ((java.lang.Long) r).longValue(); }
     """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PqAdcDistExpr =
    copy(left = newLeft, right = newRight)
}

object PqFunctions {

  private def cbKey(cb: Array[Array[Array[Long]]]): String =
    (java.util.Arrays.deepHashCode(cb.asInstanceOf[Array[AnyRef]]).toLong
      & 0xffffffffL).toHexString

  /** Register both kernels for this codebook (idempotent, name keyed by a
    * codebook hash like [[BpeEncode.register]]) and return the
    * `(encodeName, adcName)` to `call_function` with.
    */
  def register(spark: SparkSession,
               cb: Array[Array[Array[Long]]]): (String, String) = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    val key = cbKey(cb)
    val encName = s"graft_pq_encode_$key"
    val adcName = s"graft_pq_adc_$key"
    val encId = FunctionIdentifier(encName)
    if (!reg.functionExists(encId)) {
      reg.registerFunction(encId,
        new ExpressionInfo(classOf[PqEncodeExpr].getName, encName),
        (children: Seq[Expression]) => PqEncodeExpr(children.head, cb))
    }
    val adcId = FunctionIdentifier(adcName)
    if (!reg.functionExists(adcId)) {
      reg.registerFunction(adcId,
        new ExpressionInfo(classOf[PqAdcDistExpr].getName, adcName),
        (children: Seq[Expression]) => PqAdcDistExpr(children.head, children(1), cb))
    }
    (encName, adcName)
  }
}
