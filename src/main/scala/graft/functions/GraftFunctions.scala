package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, BitwiseCount, BitwiseXor, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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

/** md5_hi32/md5_lo32/md5_p60(s): native md5 hash words — the same
  * values as `conv(substring(md5(s), …), 16, 10)` (and DuckDB's
  * `('0x'||substr(md5(s),…))::BIGINT`), computed directly from the
  * digest bytes. This is the hot scalar of every signature pipeline
  * (winnowing fingerprints, MinHash, SimHash): the hex-string
  * composition allocates a 32-char string per gram and re-parses it
  * through conv; this expression reuses a thread-local MessageDigest
  * and does two shifts. Bit-identical by construction (hex chars 1–8 =
  * digest bytes 0–3; 9–16 = bytes 4–7; 1–15 = the first 60 bits), so
  * the DuckDB oracle replay is unchanged — FunctionsSpec asserts
  * equality against the conv composition.
  *
  * `mode`: 0 = hi32 (bytes 0–3), 1 = lo32 (bytes 4–7), 2 = p60
  * (first 60 bits — fits a signed long, never negative). */
case class Md5Long(child: Expression, mode: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5 word functions require a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(input: Any): Any =
    Md5Long.word(input.asInstanceOf[UTF8String], mode)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Long$$.MODULE$$.word($c, $mode)")

  override protected def withNewChildInternal(newChild: Expression): Md5Long =
    copy(child = newChild)
}

object Md5Long {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The selected word of md5(UTF-8 bytes of `s`); see [[Md5Long]]. */
  def word(s: UTF8String, mode: Int): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    def be(from: Int, to: Int): Long = {
      var v = 0L; var i = from
      while (i < to) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      v
    }
    mode match {
      case 0 => be(0, 4)        // hex chars 1–8
      case 1 => be(4, 8)        // hex chars 9–16
      case _ => be(0, 8) >>> 4  // hex chars 1–15 = first 60 bits
    }
  }
}

/** pq_encode(u): native product-quantization encoder — for each of
  * the M subspaces of a unit vector, the index of the L2-nearest
  * codeword from the committed [[graft.dedup.PqCodebook]] artifact.
  * One fused loop over a FLAT double[] codebook (no per-row array
  * allocations, no lambda frames), participating in whole-stage
  * codegen. This is the corpus-wide pass of the PQ pipeline — the
  * higher-order-function composition it replaces
  * (transform ∘ aggregate ∘ array_position) walks an interpreted
  * expression tree per element.
  *
  * Numerics: per-codeword distance is the same sequential
  * `a + (x-c)*(x-c)` left fold as the HOF form and the DuckDB oracle;
  * argmin keeps the FIRST minimum (strict `<`) = `array_position(d,
  * array_min(d))`. Codes are therefore bit-identical to both — the
  * gate's hash replay is unchanged (FunctionsSpec asserts equality
  * against the composition). */
case class PqEncode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<double>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType, false)
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      PqNative.encode(input.asInstanceOf[ArrayData]))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.PqNative$$.MODULE$$.encode($c))")

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** pq_adc(uq, codes): native asymmetric-distance computation — the
  * scan-side twin of [[PqEncode]]: sum over subspaces of
  * ||q_sub − codeword(code_j)||², reading only the code column of the
  * target. Same fold order as the HOF form / DuckDB, bit-identical. */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(org.apache.spark.sql.types.IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc requires (array<double>, array<int>), got ${l.simpleString}, ${r.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(a: Any, b: Any): Any =
    PqNative.adc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.PqNative$$.MODULE$$.adc($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
}

/** Flat-codebook kernels behind [[PqEncode]]/[[PqAdc]]. The committed
  * codebook is flattened once per JVM to `double[M*K*DSub]` (index
  * `(j*K + cc)*DSub + i`) so the hot loops are pure array arithmetic. */
object PqNative {
  import graft.dedup.PqCodebook.{DSub, K, M, codebook}
  private val flat: Array[Double] = {
    val a = new Array[Double](M * K * DSub)
    for (j <- 0 until M; cc <- 0 until K; i <- 0 until DSub)
      a((j * K + cc) * DSub + i) = codebook(j)(cc)(i)
    a
  }

  /** Per-subspace argmin codes of a unit vector; see [[PqEncode]]. */
  def encode(u: ArrayData): Array[Int] = {
    val codes = new Array[Int](M)
    var j = 0
    while (j < M) {
      var best = 0; var bd = Double.PositiveInfinity
      var cc = 0
      while (cc < K) {
        var d = 0.0; var i = 0
        val base = (j * K + cc) * DSub
        while (i < DSub) {
          val t = u.getDouble(j * DSub + i) - flat(base + i)
          d += t * t
          i += 1
        }
        if (d < bd) { bd = d; best = cc }
        cc += 1
      }
      codes(j) = best
      j += 1
    }
    codes
  }

  /** ADC distance of a query against a code word; see [[PqAdc]]. */
  def adc(uq: ArrayData, codes: ArrayData): Double = {
    var acc = 0.0
    var j = 0
    while (j < M) {
      val base = (j * K + codes.getInt(j)) * DSub
      var inner = 0.0
      var i = 0
      while (i < DSub) {
        val t = uq.getDouble(j * DSub + i) - flat(base + i)
        inner += t * t
        i += 1
      }
      acc += inner
      j += 1
    }
    acc
  }
}

/** ivf_assign(u): native IVF coarse-quantizer assignment — the index
  * of the L2-nearest centroid from the committed
  * [[graft.dedup.IvfCentroids]] artifact (the corpus-wide pass of
  * `sim_ann_ivf`). One fused loop over a FLAT double[] centroid
  * array, participating in whole-stage codegen — the
  * higher-order-function composition it replaces
  * (transform ∘ aggregate ∘ array_position over a k×d literal) walks
  * an interpreted expression tree per element, ~k·d evals per ROW.
  *
  * Numerics: per-centroid distance is the same sequential
  * `a + (x-c)*(x-c)` left fold as the HOF reference form and the
  * DuckDB oracle; argmin keeps the FIRST minimum (strict `<`) =
  * `array_position(d, array_min(d))`. Assignments are therefore
  * bit-identical to both (FunctionsSpec asserts equality against the
  * composition). */
case class IvfAssign(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ivf_assign requires array<double>, got ${t.simpleString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(input: Any): Any =
    IvfNative.assign(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.IvfNative$$.MODULE$$.assign($c)")

  override protected def withNewChildInternal(newChild: Expression): IvfAssign =
    copy(child = newChild)
}

/** Flat-centroid kernel behind [[IvfAssign]] — committed centroids
  * flattened once per JVM to `double[K*D]` (index `cc*D + i`). */
object IvfNative {
  import graft.dedup.IvfCentroids.{D, K, centroids}
  private val flat: Array[Double] = {
    // fail loudly on a mis-regenerated artifact (K/D out of step with
    // the centroid table would otherwise silently truncate the index)
    require(centroids.length == K && centroids.forall(_.length == D),
      s"IvfCentroids shape ${centroids.length}x${centroids.headOption.fold(0)(_.length)} != declared ${K}x$D")
    val a = new Array[Double](K * D)
    for (cc <- 0 until K; i <- 0 until D) a(cc * D + i) = centroids(cc)(i)
    a
  }

  /** First-minimum L2 centroid index of a unit vector; see [[IvfAssign]]. */
  def assign(u: ArrayData): Int = {
    var best = 0; var bd = Double.PositiveInfinity
    var cc = 0
    while (cc < K) {
      var d = 0.0; var i = 0
      val base = cc * D
      while (i < D) {
        val t = u.getDouble(i) - flat(base + i)
        d += t * t
        i += 1
      }
      if (d < bd) { bd = d; best = cc }
      cc += 1
    }
    best
  }
}

/** interleave16(a, b): native Morton (Z-order) interleave of two
  * 16-bit quantized coordinates — `a`'s bits land on odd positions,
  * `b`'s on even, via the classic branch-free mask-spread (5 shift/
  * mask steps per coordinate, no loop), inside whole-stage codegen.
  * Z-ordering is the LAYOUT primitive for multi-dimensional locality:
  * sorting by z co-locates spatial neighbors in the same files, so
  * min/max file statistics prune 2-D range queries that a single-
  * column sort cannot. Bit-identical to the 32-term shift-and-or
  * composition (FunctionsSpec asserts), which is how the DuckDB
  * oracle replays it. Inputs beyond 16 bits are masked. */
case class Interleave16(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"interleave16 requires two bigint arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(a: Any, b: Any): Any =
    Interleave16.morton(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.Interleave16$$.MODULE$$.morton($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Interleave16 =
    copy(left = l, right = r)
}

object Interleave16 {
  /** 16 bits → every other of 32 (Morton spread). */
  def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }
  def morton(a: Long, b: Long): Long = (spread(a) << 1) | spread(b)
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

  private def md5Word(name: String, mode: Int) = (
    FunctionIdentifier(name),
    info(name, s"$name(s) - md5 hash word of a string (native, hex-composition-identical)"),
    (children: Seq[Expression]) => Md5Long(children.head, mode))

  private val pqEncode = (
    FunctionIdentifier("pq_encode"),
    info("pq_encode", "pq_encode(u) - product-quantization codes of a unit vector (committed codebook)"),
    (children: Seq[Expression]) => PqEncode(children.head))

  private val pqAdc = (
    FunctionIdentifier("pq_adc"),
    info("pq_adc", "pq_adc(uq, codes) - asymmetric PQ distance of a query to a code word"),
    (children: Seq[Expression]) => PqAdc(children(0), children(1)))

  private val interleave16 = (
    FunctionIdentifier("interleave16"),
    info("interleave16", "interleave16(a, b) - Morton/Z-order interleave of two 16-bit coordinates"),
    (children: Seq[Expression]) => Interleave16(children(0), children(1)))

  private val ivfAssign = (
    FunctionIdentifier("ivf_assign"),
    info("ivf_assign", "ivf_assign(u) - nearest committed IVF centroid index of a unit vector"),
    (children: Seq[Expression]) => IvfAssign(children.head))

  private val all = Seq(
    cosineSim, hamming64, pqEncode, pqAdc, interleave16, ivfAssign,
    md5Word("md5_hi32", 0), md5Word("md5_lo32", 1), md5Word("md5_p60", 2))

  /** Imperative registration into an existing session. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    all.foreach { case (id, fi, b) => reg.registerFunction(id, fi, b) }
  }

  /** Extension-point registration (builder.withExtensions /
    * spark.sql.extensions=graft.functions.GraftExtensions). */
  def inject(ext: SparkSessionExtensions): Unit =
    all.foreach(ext.injectFunction)
}

/** `SparkSessionExtensions` hook: makes the graft native functions part
  * of every session built with
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * (or `builder.withExtensions`), the deployment-grade registration
  * path for a shared cluster. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftFunctions.inject(ext)
}
