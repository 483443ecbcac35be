package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, BitwiseCount, BitwiseXor, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** cosine_sim(a, b): native Catalyst expression for cosine similarity
  * over `array<double>` — one fused loop computing dot product and both
  * norms with NO intermediate array allocation, participating in
  * whole-stage codegen. This is the hot scalar of every similarity
  * join; the `zip_with + aggregate` composition it replaces allocates
  * two arrays and a lambda frame per row.
  *
  * Numerics: sequential left-to-right double accumulation — exactly
  * the fold order of `aggregate(zip_with(...))` and of DuckDB's
  * `list_dot_product` — so results are bit-identical to both (the
  * correctness gate hashes raw doubles).
  *
  * Edge case: a ZERO vector (or empty array) has norm 0, so the
  * result is NaN (0/0) — deliberately matching IEEE semantics and
  * DuckDB's `list_dot_product / (norm * norm)` oracle rather than
  * masking it. Cosine similarity is mathematically undefined for the
  * zero vector; callers that want a sentinel should wrap with
  * `nanvl(cosine_sim(a, b), lit(0.0))` (or filter zero-norm rows
  * upstream), which keeps the choice explicit in the query plan.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be array<double>; callers cast explicitly (Spark 4
  // keeps AbstractDataType private[sql], so no ExpectsInputTypes —
  // checkInputDataTypes carries the contract instead, at analysis
  // time with an actionable message rather than a runtime cast error)
  override def checkInputDataTypes(): TypeCheckResult = {
    def isDoubleArray(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires two array<double> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}; " +
          "cast float embeddings explicitly, e.g. col(\"embedding\").cast(\"array<double>\")")
  }

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i); double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** SQL-function registry for the graft native expressions. Register
  * once per session; all queries reach them via `expr("cosine_sim(...)")`
  * or plain SQL. `hamming64` composes existing codegen'd nodes
  * (bit_count(a XOR b)) — no custom class needed.
  */
object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[CosineSim].getName, null, name, usage, "", "", "", "", "", "", "built-in")

  private val cosineSim = (
    FunctionIdentifier("cosine_sim"),
    info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two double arrays"),
    (children: Seq[Expression]) => CosineSim(children(0), children(1)))

  private val hamming64 = (
    FunctionIdentifier("hamming64"),
    info("hamming64", "hamming64(a, b) - hamming distance between two 64-bit signatures"),
    (children: Seq[Expression]) => BitwiseCount(BitwiseXor(children(0), children(1))))

  /** Imperative registration into an existing session. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    Seq(cosineSim, hamming64).foreach { case (id, fi, b) => reg.registerFunction(id, fi, b) }
  }

  /** Extension-point registration (builder.withExtensions /
    * spark.sql.extensions=graft.functions.GraftExtensions). */
  def inject(ext: SparkSessionExtensions): Unit =
    Seq(cosineSim, hamming64).foreach(ext.injectFunction)
}

/** `SparkSessionExtensions` hook: makes the graft native functions part
  * of every session built with
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * (or `builder.withExtensions`), the deployment-grade registration
  * path for a shared cluster. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftFunctions.inject(ext)
}
