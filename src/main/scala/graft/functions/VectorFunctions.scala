package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}

/** Sequential-fold dot product of two `array<double>` columns as a native
  * Catalyst expression with codegen.
  *
  * Semantics are EXACTLY `aggregate(zip_with(a, b, (x,y) => x*y), 0.0d,
  * (acc,v) => acc+v)` — a strict left-to-right IEEE fold, so results are
  * bit-identical to the higher-order-function formulation (and to DuckDB's
  * `list_reduce(list_transform(...))` oracle twin). The difference is purely
  * physical: HOFs are interpreted per-row with lambda allocation and never
  * enter whole-stage codegen; this compiles to a tight Java loop inside the
  * generated code. On the all-pairs similarity queries that's the entire
  * hot path (12.5M × 64-element folds at sf0.1).
  *
  * Null semantics mirror the HOF fold: length mismatch (zip_with pads with
  * null → null product) or any null element poisons the sum → null.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  // AbstractDataType is private[sql] in Spark 4 — let the covariant Seq
  // of the concrete subtype conform to the abstract member's type
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  // null on length mismatch / null element even when the child ARRAYS are
  // non-nullable — without this the engine coerces our nulls to 0.0 and
  // the `isNull = true` assignment doesn't even compile under codegen
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Fused cosine similarity: `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))`
  * with all three accumulators advanced in ONE pass over the arrays —
  * bit-identical to three separate [[DotProduct]] folds (independent
  * accumulators, each seeing the same addition order), at a third of the
  * array traversals. Null semantics identical to [[DotProduct]].
  */
case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      ab += xv * yv; aa += xv * xv; bb += yv * yv
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (ab, aa, bb) = (ctx.freshName("ab"), ctx.freshName("aa"), ctx.freshName("bb"))
      val (i, n, xv, yv) = (ctx.freshName("i"), ctx.freshName("n"), ctx.freshName("xv"), ctx.freshName("yv"))
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $xv = $a.getDouble($i); final double $yv = $b.getDouble($i);
         |    $ab += $xv * $yv; $aa += $xv * $xv; $bb += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $ab / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb)); }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance of two `array<long>` columns — the integer twin of
  * [[DotProduct]], for math over quantized vectors ([[graft.pipeline
  * .SimilarityPq]], [[graft.pipeline.KMeansCluster]]): with integer
  * components every distance is an EXACT long (no fold-order concerns at
  * all), so results are trivially engine-invariant. Codegen'd to a tight
  * Java loop inside whole-stage codegen; the HOF formulation
  * `aggregate(zip_with(...))` it replaces is interpreted per row.
  * Null semantics identical to [[DotProduct]]: length mismatch or any
  * null element → null. Caller owns overflow: |aᵢ−bᵢ|² summed over the
  * array must stay under 2⁶³ (true for any 2²⁰-scaled unit vectors).
  */
case class IntSqDist(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sqdist"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (acc, d) = (ctx.freshName("acc"), ctx.freshName("d"))
      val (i, n) = (ctx.freshName("i"), ctx.freshName("n"))
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IntSqDist =
    copy(left = newLeft, right = newRight)
}

/** Exact integer dot product of two long-array columns — the quantized
  * twin of [[DotProduct]] and the scoring core of semantic dedup /
  * quantized cosine: with int8-quantized components the accumulator
  * stays exact (|aᵢ·bᵢ| ≤ 127² summed over ≤ 2⁴⁴ elements fits a long),
  * so downstream ratios are deterministic doubles. Codegen'd tight loop,
  * no higher-order-function interpretation on the hot path.
  * Length mismatch → null, null element → null.
  */
case class IntDot(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_doti"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val (i, n) = (ctx.freshName("i"), ctx.freshName("n"))
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IntDot =
    copy(left = newLeft, right = newRight)
}

/** Intersection COUNT of two arrays that are both SORTED ascending with
  * distinct elements — a two-pointer merge walk instead of
  * `size(array_intersect(a, b))`'s per-row hash-set build. Accepts
  * `array<string>` (binary UTF-8 order) or `array<bigint>` (numeric
  * order — the hashed-shingle spine); mixed or other element types cast
  * to the string form. Semantically identical to `array_intersect` on
  * inputs meeting the contract (sortedness never changes a set
  * intersection's cardinality); the caller owns the contract —
  * [[graft.pipeline.Dedup.docShingleSets]]'s `sorted` column is produced
  * by `sort_array`, which is exactly these orderings. On the
  * prefix-filter verify stage (171k candidate pairs × ~52-element arrays
  * at sf0.1) the merge walk does ~100 compares per pair with zero
  * allocation, vs two hash-set builds + ~52 probes; measured ~2.5 s
  * → ~0.3 s for strings, and the long form replaces each UTF8String
  * compare with one branch on two register-width loads. Null array →
  * null; null ELEMENT cannot occur under the contract (shingles are
  * non-null) but would simply never compare equal.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  private def longMode: Boolean = Seq(left, right).forall(_.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  })

  override def inputTypes =
    if (longMode) Seq(ArrayType(LongType), ArrayType(LongType))
    else Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    val longs = longMode
    var i = 0
    var j = 0
    var c = 0L
    while (i < nx && j < ny) {
      val cv =
        if (longs) java.lang.Long.compare(x.getLong(i), y.getLong(j))
        else x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cv == 0) { c += 1; i += 1; j += 1 }
      else if (cv < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val cv = ctx.freshName("cv")
      val cmp =
        if (longMode) s"Long.compare($a.getLong($i), $b.getLong($j))"
        else s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  final int $cv = $cmp;
         |  if ($cv == 0) { $c++; $i++; $j++; }
         |  else if ($cv < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Rabin-Karp rolling hashes of a string: one polynomial hash per
  * `window`-byte window, `h = (Σ bᵢ·Bᵏ⁻ⁱ) mod M` with B=257,
  * M=1e9+7, advanced in O(1) per position (subtract the leading byte's
  * `B^(w-1)` term, shift, add the trailing byte) — O(len) total, vs the
  * O(len·window) of recomputing each window. Residues are exact integer
  * math, so any engine computing the per-window fold directly gets
  * identical values (the DuckDB oracle does `list_reduce` per window).
  * Shorter-than-window strings give an empty array; null gives null.
  */
case class RollingHash(child: Expression, window: Int)
  extends UnaryExpression with ImplicitCastInputTypes
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(window >= 1, "window must be >= 1")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_rolling_hash"

  private val B = 257L
  private val M = 1000000007L

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val n = bytes.length
    if (n < window) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val out = new Array[Long](n - window + 1)
    var h = 0L
    var i = 0
    while (i < window) { h = (h * B + (bytes(i) & 0xffL)) % M; i += 1 }
    out(0) = h
    // B^(window-1) mod M for the leading-byte removal
    var pow = 1L
    i = 1
    while (i < window) { pow = pow * B % M; i += 1 }
    i = window
    while (i < n) {
      val drop = (bytes(i - window) & 0xffL) * pow % M
      h = (((h - drop) % M + M) * B + (bytes(i) & 0xffL)) % M
      out(i - window + 1) = h
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** Porter-stem one lowercase word (see [[Porter]]) as a codegen'd native
  * expression: the generated code calls the static stemmer directly — no
  * UDF serialization, no per-row lambda, stays inside whole-stage codegen.
  * Null → null; non-word inputs pass through unchanged (Porter.stem's
  * contract).
  */
case class PorterStem(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_stem"

  override def nullSafeEval(input: Any): Any =
    Porter.stemUtf8(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Porter.stemUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): PorterStem =
    copy(child = newChild)
}

/** `SparkSessionExtensions` hook so cluster deployments can register the
  * graft expressions declaratively:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * (or `.withExtensions(new GraftExtensions)`), instead of the programmatic
  * [[VectorFunctions.register]].
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    VectorFunctions.allFunctions.foreach { case (name, clazz, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(clazz, name), builder))
    }
    e.injectOptimizerRule(_ => graft.plans.BandJoinRewrite)
    e.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}

object VectorFunctions {

  /** The single source of truth for every graft function — both
    * registration paths ([[register]] and [[GraftExtensions]]) iterate
    * this list, so they cannot drift apart.
    */
  private[graft] val allFunctions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", classOf[DotProduct].getName,
      (children: Seq[Expression]) => DotProduct(children.head, children(1))),
    ("graft_cosine", classOf[CosineSim].getName,
      (children: Seq[Expression]) => CosineSim(children.head, children(1))),
    ("graft_sqdist", classOf[IntSqDist].getName,
      (children: Seq[Expression]) => IntSqDist(children.head, children(1))),
    // CONTRACT (mirrored from IntDot scaladoc for SQL callers): exact only
    // while Σ xᵢ·yᵢ fits a signed long — guaranteed under the int8
    // quantization the library emits (|xᵢ|,|yᵢ| ≤ 127), NOT for arbitrary
    // long arrays, where the accumulator wraps silently (no overflow check
    // on the codegen hot path by design).
    ("graft_doti", classOf[IntDot].getName,
      (children: Seq[Expression]) => IntDot(children.head, children(1))),
    // CONTRACT: both arrays sorted ascending (UTF8 binary) with distinct
    // elements — unsorted input silently undercounts
    ("graft_sorted_intersect_count", classOf[SortedIntersectCount].getName,
      (children: Seq[Expression]) => SortedIntersectCount(children.head, children(1))),
    // Text.rollingFingerprint's default window; other windows register
    // dynamically via registerRolling
    ("graft_rolling_hash_16", classOf[RollingHash].getName,
      (children: Seq[Expression]) => RollingHash(children.head, 16)),
    ("graft_stem", classOf[PorterStem].getName,
      (children: Seq[Expression]) => PorterStem(children.head)),
    ("graft_bpe_merge_pair", classOf[BpeMergePair].getName,
      (children: Seq[Expression]) =>
        BpeMergePair(children.head, children(1), children(2))))

  /** Idempotently register graft expressions in the session's function
    * registry, so `call_function` / SQL can resolve them. Works on any
    * session handed to us (the driver builds its own for the smoke check).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    allFunctions.foreach { case (name, clazz, builder) =>
      val id = FunctionIdentifier(name)
      if (!reg.functionExists(id)) {
        reg.registerFunction(id, new ExpressionInfo(clazz, name), builder)
      }
    }
    // the programmatic twin of GraftExtensions' injectOptimizerRule —
    // experimental.extraOptimizations runs in the optimizer's
    // user-provided batch (idempotent add; the rule itself is marker-
    // guarded against fixed-point re-application)
    if (!spark.experimental.extraOptimizations.contains(graft.plans.BandJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.BandJoinRewrite
    if (!spark.experimental.extraStrategies.contains(graft.plans.TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKPerKeyStrategy
  }

  /** Column-level dot product; requires [[register]] on the session first
    * (resolution happens at analysis time against the registry).
    */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Fused single-pass cosine; same registration requirement. */
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  /** Exact integer squared-L2 distance of two long-array columns; same
    * registration requirement.
    */
  def sqDistL(a: Column, b: Column): Column = call_function("graft_sqdist", a, b)

  /** Exact integer dot product of two long-array columns, registry-free
    * (direct expression wrap) — safe in library code called before
    * [[register]].
    */
  def dotL(a: Column, b: Column): Column =
    org.apache.spark.sql.classic.GraftPlanBridge.column(
      IntDot(org.apache.spark.sql.classic.GraftPlanBridge.expr(a),
        org.apache.spark.sql.classic.GraftPlanBridge.expr(b)))

  /** Registry-free sorted-array intersection count (see [[dotL]]);
    * contract: both arrays sorted ascending in UTF-8 binary order,
    * distinct elements.
    */
  def sortedIntersectCount(a: Column, b: Column): Column =
    org.apache.spark.sql.classic.GraftPlanBridge.column(
      SortedIntersectCount(org.apache.spark.sql.classic.GraftPlanBridge.expr(a),
        org.apache.spark.sql.classic.GraftPlanBridge.expr(b)))

  /** Registry-free exact integer squared-L2 distance (see [[dotL]]). */
  def sqDistLExpr(a: Column, b: Column): Column =
    org.apache.spark.sql.classic.GraftPlanBridge.column(
      IntSqDist(org.apache.spark.sql.classic.GraftPlanBridge.expr(a),
        org.apache.spark.sql.classic.GraftPlanBridge.expr(b)))

  /** Porter stem of a lowercase word column; same registration requirement. */
  def stem(c: Column): Column = call_function("graft_stem", c)

  /** Rolling hashes with a fixed window. The window is a constructor
    * parameter, not a child expression, so each window size registers
    * under its own function name; [[register]] covers the default (16),
    * other sizes need [[registerRolling]] on the session first.
    */
  def rollingHashes(c: Column, window: Int): Column =
    call_function(s"graft_rolling_hash_$window", c)

  private[graft] def registerRolling(spark: SparkSession, window: Int): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    val id = FunctionIdentifier(s"graft_rolling_hash_$window")
    if (!reg.functionExists(id)) {
      reg.registerFunction(id,
        new ExpressionInfo(classOf[RollingHash].getName, s"graft_rolling_hash_$window"),
        (children: Seq[Expression]) => RollingHash(children.head, window))
    }
  }
}
