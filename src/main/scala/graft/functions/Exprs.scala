package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (with whole-stage codegen) for graft's hot
  * paths — per SURVEY §4.7: no UDFs in hot loops; a codegen'd Expression
  * keeps the similarity joins inside WholeStageCodegen where a Scala UDF
  * would box every row.
  */

/** Exact integer dot product of two ArrayType(LongType) columns — the inner
  * kernel of the quantized-embedding similarity operators (SURVEY §2.5
  * #39-41). Inputs are embeddings quantized to integer units (round(x·10⁴)),
  * so the product is exact, order-independent, and bit-identical to the
  * DuckDB oracle's list_dot_product at any parallelism.
  */
case class DotQ(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  /** Mismatched lengths return null — a truncated "plausible" dot product
    * would mask malformed vectors (and DuckDB's list_dot_product errors on
    * the same input, so silence here would also split the engines). Null
    * ELEMENTS remain a precondition: graft quantizes from non-null floats.
    */
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      var acc = 0L
      var i = 0
      while (i < x.numElements()) { acc += x.getLong(i) * y.getLong(i); i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotQ =
    copy(left = newLeft, right = newRight)
}

/** Polynomial rolling hash over the bytes of an (ASCII-normalized) string:
  * h = fold(0, b => (h·31 + b) mod 1e9+7). Document fingerprinting kernel
  * (SURVEY §2.5 #45; reference deep_analysis duplicate detection works on
  * whole-content equality — the rolling hash is the scale-friendly stand-in
  * that also supports windowed/chunked fingerprints). The DuckDB oracle
  * mirrors it with list_reduce over ascii codes, so it is exactly checkable.
  */
case class RollingHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31L + (bytes(i) & 0xffL)) % 1000000007L
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $acc = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $acc = ($acc * 31L + ($bytes[$i] & 0xffL)) % 1000000007L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** 64-bit SimHash fingerprint of a token-hash array (SURVEY §2.5 #38):
  * bit b of the result is set iff more input hashes have bit b set than
  * clear (ties → 0, matching `sum(±1) > 0`). As a per-row expression over
  * `array_distinct(transform(tokens, xxhash64))`, the whole fingerprint
  * stage is embarrassingly parallel — no token explode, no distinct
  * shuffle, no 64-column aggregate; only the band join that follows
  * shuffles, which is the shape that scales to 100 TB. Equivalent by spec
  * to the 64-aggregate DataFrame formulation it replaced.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = a.numElements()
    val cnt = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = a.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) cnt(b) += 1 else cnt(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (cnt(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      s"""
         |int[] $cnt = new int[64];
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $cnt[$b] += (($h >>> $b) & 1L) == 1L ? 1 : -1;
         |  }
         |}
         |long $fp = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($cnt[$b] > 0) $fp |= (1L << $b);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Exact integer matrix–vector product: the dot of `vec`
  * (ArrayType(LongType)) against EVERY row of a foldable matrix literal
  * (ArrayType(ArrayType(LongType))) in one codegen'd pass, returning
  * array<long> of the row dots. This is the bulk form of [[DotQ]] for
  * model-against-row evaluation (LSH hyperplane banks, centroid tables):
  * shipping a K-row model as K separate array literals with one DotQ each
  * makes the analyzed tree O(K·D) nodes — at K=256, D=64 that cost tens
  * of seconds of driver-side analysis + codegen per plan. Here the model
  * folds ONCE into a primitive long[][] held in the codegen references
  * array, the generated code is two short loops, and the per-row work is
  * identical arithmetic to K DotQ calls (exact, order-independent,
  * bit-identical to the oracle at any parallelism).
  *
  * Null vec → null (like DotQ); a vec whose length differs from the
  * matrix row width → null (a truncated "plausible" result would mask
  * malformed vectors). The matrix argument must be foldable and uniform —
  * enforced at first evaluation, since a jagged model is a construction
  * bug, not a data condition.
  */
case class MatVecQ(mat: Expression, vec: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def left: Expression = mat
  override def right: Expression = vec
  override def inputTypes =
    Seq(ArrayType(ArrayType(LongType)), ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  /** The folded model: evaluated once at plan time, shared by every row.
    * A foldable NULL matrix folds to an EMPTY model instead of NPE-ing:
    * doGenCode forces this lazy while building the codegen references
    * array, BEFORE the per-row null check runs — the interpreted path
    * null-propagates first and never sees the hazard, and a crash that
    * exists only under codegen is the worst kind of divergence. Rows
    * with a null matrix never reach the kernel either way (nullSafeEval
    * / nullSafeCodeGen propagate), so the empty model is inert.
    */
  @transient private lazy val model: Array[Array[Long]] = {
    require(mat.foldable, "graft_matvec_q: matrix argument must be foldable")
    val raw = mat.eval()
    if (raw == null) Array.empty
    else {
      val m = raw.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val rows = Array.tabulate(m.numElements())(j => m.getArray(j).toLongArray())
      require(rows.isEmpty || rows.forall(_.length == rows(0).length),
        "graft_matvec_q: matrix rows must have uniform length")
      rows
    }
  }
  @transient private lazy val dim: Int =
    if (model.isEmpty) 0 else model(0).length

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (model.nonEmpty && x.numElements() != dim) null
    else {
      val out = new Array[Long](model.length)
      var j = 0
      while (j < model.length) {
        val row = model(j)
        var acc = 0L
        var i = 0
        while (i < row.length) { acc += row(i) * x.getLong(i); i += 1 }
        out(j) = acc
        j += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("matvecModel", model, "long[][]")
    nullSafeCodeGen(ctx, ev, (_, b) => {
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val row = ctx.freshName("row")
      s"""
         |if ($modelRef.length > 0 && $b.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $out = new long[$modelRef.length];
         |  for (int $j = 0; $j < $modelRef.length; $j++) {
         |    long[] $row = $modelRef[$j];
         |    long $acc = 0L;
         |    for (int $i = 0; $i < $row.length; $i++) {
         |      $acc += $row[$i] * $b.getLong($i);
         |    }
         |    $out[$j] = $acc;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MatVecQ =
    copy(mat = newLeft, vec = newRight)
}

/** Repeated-character-run detector (SURVEY §2.3 #26): true iff the string
  * contains ≥ [[RepeatedRun.MinRun]] CONSECUTIVE occurrences of one
  * enumerated ASCII character — exactly the language of the oracle's
  * backref-free alternation `a{5,}|b{5,}|…` (built from the same
  * [[RepeatedRun.Alnum]]/[[RepeatedRun.Punct]] definition, so the two
  * cannot drift). The regex form costs an 87-branch alternation NFA per
  * row on the Spark side (~7× the pre-promotion scan, the one real r3
  * bench regression); this kernel is ONE O(len) byte scan with early
  * exit, codegen'd into the whole-stage pipeline.
  *
  * Scanning UTF-8 BYTES is exact for an ASCII character class: a
  * multi-byte code point's bytes are all ≥ 0x80, so an enumerated ASCII
  * byte can only occur as that ASCII character, and a 5-byte run of it is
  * precisely a 5-char run in the decoded string.
  */
case class RepeatedRun(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  override protected def nullSafeEval(input: Any): Any = {
    val bs = input.asInstanceOf[UTF8String].getBytes
    val allowed = RepeatedRun.Allowed
    var run = 1
    var i = 1
    while (i < bs.length) {
      if (bs(i) == bs(i - 1)) {
        run += 1
        if (run >= RepeatedRun.MinRun && allowed(bs(i) & 0xff)) return true
      } else run = 1
      i += 1
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val allowed = ctx.addReferenceObj("repeatedRunAllowed", RepeatedRun.Allowed,
      "boolean[]")
    nullSafeCodeGen(ctx, ev, c => {
      val bs = ctx.freshName("bs")
      val i = ctx.freshName("i")
      val run = ctx.freshName("run")
      val found = ctx.freshName("found")
      s"""
         |byte[] $bs = $c.getBytes();
         |boolean $found = false;
         |int $run = 1;
         |for (int $i = 1; $i < $bs.length && !$found; $i++) {
         |  if ($bs[$i] == $bs[$i - 1]) {
         |    $run++;
         |    if ($run >= ${RepeatedRun.MinRun} && $allowed[$bs[$i] & 0xff]) {
         |      $found = true;
         |    }
         |  } else {
         |    $run = 1;
         |  }
         |}
         |${ev.value} = $found;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RepeatedRun =
    copy(child = newChild)
}

object RepeatedRun {
  /** Run length that flags (the reference's `(.)\1{4,}` = 5 total). */
  val MinRun = 5

  /** Characters whose regex form is the bare `c{5,}` branch. */
  val Alnum: Seq[Char] = ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++ Seq(' ')

  /** Characters embedded as single-char classes `[c]{5,}` ('[', ']', '^',
    * '\' stay out: their class form is itself structural; the two quote
    * chars stay out because the oracle pattern embeds in a single-quoted
    * SQL literal).
    */
  val Punct: String = "!?.,;:-_*#@$%&+=/()<>~`|"

  /** Byte-indexed membership of the enumerated set (non-ASCII all false). */
  val Allowed: Array[Boolean] = {
    val a = new Array[Boolean](256)
    (Alnum ++ Punct).foreach(c => a(c.toInt) = true)
    a
  }
}

/** Bloom-filter membership test against a FOLDABLE serialized
  * `org.apache.spark.util.sketch.BloomFilter` (BinaryType literal): the
  * map-side prefilter of the scale-adaptive joins. A bloom over K items at
  * 1% false positives is ~1.2 bytes/item — ~50× smaller than broadcasting
  * the item strings themselves — so an existence prefilter stays
  * broadcastable long after the exact set outgrows an executor. False
  * positives are expected (callers follow with an exact join on the
  * survivors); false negatives are impossible, which is what makes the
  * prefilter semantics-preserving.
  *
  * The sketch deserializes ONCE at plan time and rides the codegen
  * references array (same pattern as [[MatVecQ]]'s model). Bytes are
  * matched with `mightContainBinary(utf8)`, which is bit-identical to the
  * builder's `putString`/UTF-8 path.
  */
case class BloomContains(bloom: Expression, item: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def left: Expression = bloom
  override def right: Expression = item
  override def inputTypes = Seq(org.apache.spark.sql.types.BinaryType, StringType)
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  /** A foldable NULL bloom folds to an inert empty filter instead of
    * NPE-ing in readFrom at codegen time (the MatVecQ null-model rule):
    * rows never reach it — nullSafeCodeGen propagates the null bloom —
    * but doGenCode forces this lazy while registering the reference
    * object, before any row runs.
    */
  @transient private lazy val filter: org.apache.spark.util.sketch.BloomFilter = {
    require(bloom.foldable, "graft_bloom_contains: bloom argument must be foldable")
    val raw = bloom.eval()
    if (raw == null) org.apache.spark.util.sketch.BloomFilter.create(1)
    else org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(raw.asInstanceOf[Array[Byte]]))
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    filter.mightContainBinary(b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, b) =>
      s"${ev.value} = $ref.mightContainBinary($b.getBytes());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(bloom = newLeft, item = newRight)
}

/** Runtime registration of graft's native expressions so operators can use
  * them via `call_function` on any already-built session (Verify, Bench,
  * specs). Idempotent — re-registering replaces the same builder.
  * [[graft.plans.GraftExtensions]] consumes the same [[GraftFunctions.all]]
  * list for the session-build path, so the two cannot drift.
  */
object GraftFunctions {
  private def info(name: String, clazz: Class[_]) =
    new ExpressionInfo(clazz.getCanonicalName, name)

  /** Builder with arity validation — a wrong-arity SQL call must surface
    * as a clear analysis-time error naming the function, not an opaque
    * IndexOutOfBoundsException from inside the registry.
    */
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    children => {
      if (children.size != n) throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> name, "expectedNum" -> n.toString,
          "actualNum" -> children.size.toString, "docroot" -> ""))
      build(children)
    }

  /** The single source of truth for graft's native function surface. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("graft_dot_q"), info("graft_dot_q", classOf[DotQ]),
        arity("graft_dot_q", 2)(c => DotQ(c(0), c(1)))),
      (FunctionIdentifier("graft_rolling_hash"),
        info("graft_rolling_hash", classOf[RollingHash]),
        arity("graft_rolling_hash", 1)(c => RollingHash(c.head))),
      (FunctionIdentifier("graft_simhash64"),
        info("graft_simhash64", classOf[SimHash64]),
        arity("graft_simhash64", 1)(c => SimHash64(c.head))),
      (FunctionIdentifier("graft_matvec_q"),
        info("graft_matvec_q", classOf[MatVecQ]),
        arity("graft_matvec_q", 2)(c => MatVecQ(c(0), c(1)))),
      (FunctionIdentifier("graft_bloom_contains"),
        info("graft_bloom_contains", classOf[BloomContains]),
        arity("graft_bloom_contains", 2)(c => BloomContains(c(0), c(1)))),
      (FunctionIdentifier("graft_repeated_run"),
        info("graft_repeated_run", classOf[RepeatedRun]),
        arity("graft_repeated_run", 1)(c => RepeatedRun(c.head))))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    all.foreach { case (id, inf, builder) =>
      reg.registerFunction(id, inf, builder)
    }
  }
}
