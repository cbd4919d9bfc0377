package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the dedup hot paths. The higher-order-function
  * formulations (`transform` + `array_min` for MinHash, `array_intersect`
  * / `array_union` for Jaccard) evaluate interpreted, per element, per
  * row — measured at ~30 s/query at sf0.1. These expressions do the same
  * math in one compiled pass and splice into whole-stage codegen.
  */

/** k-slot MinHash signature in ONE pass over the shingle array.
  * Per element: two XXH64 draws, slot i uses the Kirsch–Mitzenmacher
  * double-hashing family h1 + i·h2 (standard Bloom/MinHash construction)
  * — 2 hashes instead of k per element, same independence guarantees in
  * practice. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    TextKernels.minhashSig(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.minhashSig($c, $k)")

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashSig = copy(child = newChild)
}

/** Jaccard similarity of two SORTED, DISTINCT string arrays via a merge
  * walk — O(n+m), no allocation. Callers sort+distinct once per row
  * upstream (amortized across all pairs the row participates in). */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_jaccard requires two array<string>, got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.sortedJaccard(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextKernels.sortedJaccard($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedJaccard = copy(newLeft, newRight)
}

/** Sorted, distinct word-n-gram shingle set in ONE compiled pass.
  * The compositional formulation — `array_sort(array_distinct(
  * transform(sequence(...), i -> concat_ws(' ', slice(toks, i, n)))))` —
  * runs every lambda through interpreted eval: measured 2.0 s of a 2.4 s
  * dedup query at sf0.1 (5k docs) was just building shingle arrays. This
  * kernel is the same semantics (docs shorter than n collapse to one
  * whole-doc shingle) at array-copy speed. */
case class SortedShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sorted_shingles requires array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    TextKernels.sortedShingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.sortedShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression)
      : SortedShingles = copy(child = newChild)
}

/** Count of tokens (occurrences, not distinct) that appear in a fixed
  * word set. The compositional form — `size(filter(toks,
  * array_contains(lit(words), _)))` — evaluates the lambda interpreted
  * per token AND scans the literal array linearly per probe; this kernel
  * is one compiled pass with an O(1) hash probe. It backs the language-ID
  * argmax (4 profiles × every doc) and the stopword-ratio quality
  * feature. The set is built lazily per JVM and shipped into generated
  * code as a referenced object. */
case class TokensInSet(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"tokens_in_set requires array<string>, got ${other.catalogString}")
    }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.countInSet(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set,
      classOf[java.util.HashSet[UTF8String]].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.countInSet($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : TokensInSet = copy(child = newChild)
}

/** Count of pre-tokenizer tokens — semantically `size(regexp_extract_all(
  * text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))` (maximal lowercase runs, maximal
  * digit runs, every other non-space code point as its own token) as ONE
  * UTF-8 byte walk with no regex machinery and no token-array
  * materialization. The counting paths (`text_token_counts`, the
  * fertility denominator) only ever take the SIZE of that array; at the
  * 100× bench tier the regex formulation was the single most linear cost
  * in the inventory (21× for 100× characters), all of it allocation +
  * java.util.regex overhead this kernel avoids. The regex form stays in
  * place where the tokens themselves are consumed (`explode`).
  *
  * Byte-walk correctness: the three classes are pure ASCII, and every
  * non-ASCII code point falls in `[^a-z0-9 ]` — so continuation bytes
  * are skipped via UTF8String.numBytesForFirstByte and each multi-byte
  * code point counts exactly once, matching code-point-aware regex
  * engines (java.util.regex here, RE2 in the DuckDB oracle). */
case class PreTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pre_token_count requires string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    TextKernels.preTokenCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.preTokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : PreTokenCount = copy(child = newChild)
}

object TextKernels {

  private val Space = UTF8String.fromString(" ")

  def sortedShingles(tokens: ArrayData, n: Int): ArrayData = {
    val nt = tokens.numElements()
    val count = if (nt < n) 1 else nt - n + 1
    val window = if (nt < n) nt else n
    val out = new Array[UTF8String](count)
    val parts = new Array[UTF8String](window)
    var i = 0
    while (i < count) {
      var j = 0
      while (j < window) {
        val t = tokens.getUTF8String(i + j)
        parts(j) = if (t == null) UTF8String.EMPTY_UTF8 else t
        j += 1
      }
      out(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    java.util.Arrays.sort(out.asInstanceOf[Array[AnyRef]])
    // dedup in place over the sorted run
    var w = 0
    i = 0
    while (i < count) {
      if (w == 0 || out(i).compareTo(out(w - 1)) != 0) {
        out(w) = out(i); w += 1
      }
      i += 1
    }
    val res: Array[Any] =
      if (w == count) out.asInstanceOf[Array[Any]]
      else {
        val trimmed = new Array[Any](w)
        System.arraycopy(out, 0, trimmed, 0, w)
        trimmed
      }
    new GenericArrayData(res)
  }

  def sorted_shingles(tokens: Column, n: Int): Column =
    column(SortedShingles(expression(tokens), n))

  def minhashSig(tokens: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s: UTF8String = tokens.getUTF8String(i)
        val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, 42L)
        val h2 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, 77L) | 1L // odd → full-period stride
        var j = 0
        var h = h1
        while (j < k) {
          if (h < mins(j)) mins(j) = h
          h += h2
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def sortedJaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { inter += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }

  /** Static kernel for [[TokensInSet]] — shared by interpreted eval and
    * generated code. */
  def countInSet(tokens: ArrayData,
      set: java.util.HashSet[UTF8String]): Int = {
    val n = tokens.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i) && set.contains(tokens.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** Static kernel for [[PreTokenCount]] — shared by interpreted eval
    * and generated code. Single pass; state is which run class the walk
    * is inside (0 = none/space, 1 = lowercase run, 2 = digit run). */
  def preTokenCount(s: UTF8String): Long = {
    val n = s.numBytes
    var count = 0L
    var cls = 0
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if ((b & 0x80) == 0) { // ASCII
        if (b >= 'a' && b <= 'z') {
          if (cls != 1) { count += 1; cls = 1 }
        } else if (b >= '0' && b <= '9') {
          if (cls != 2) { count += 1; cls = 2 }
        } else if (b == ' ') cls = 0
        else { count += 1; cls = 0 }
        i += 1
      } else { // any non-ASCII code point is one [^a-z0-9 ] token
        count += 1
        cls = 0
        i += UTF8String.numBytesForFirstByte(b)
      }
    }
    count
  }

  def pre_token_count(text: Column): Column =
    column(PreTokenCount(expression(text)))

  def minhash_sig(tokens: Column, k: Int): Column =
    column(MinHashSig(expression(tokens), k))

  def sorted_jaccard(a: Column, b: Column): Column =
    column(SortedJaccard(expression(a), expression(b)))

  def tokens_in_set(tokens: Column, words: Seq[String]): Column =
    column(TokensInSet(expression(tokens), words))
}
