package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array (Charikar 2002, "Similarity
  * estimation techniques from rounding algorithms" — public algorithm).
  *
  * Near-duplicate docs differ in few bits, so candidate pairs can be
  * found by exact-matching 16-bit bands (pigeonhole: Hamming ≤ 3 ⇒ ≥1 of
  * 4 bands equal) and verified with `bit_count(a ^ b)` — both ends stay
  * inside whole-stage codegen.
  *
  * Implementation note: a native Catalyst expression (not a Scala UDF) so
  * the per-row path is a static call with no serialization, null-handling
  * is inherited, and codegen splices it into the stage
  * (SURVEY §2.12 extension surface; preference order (b) of the build
  * brief).
  *
  * Token hashing is the first 8 bytes of MD5, little-endian — a
  * deliberate cross-engine choice: DuckDB's `md5_number_upper` computes
  * the identical 64-bit value, so the full signature (and therefore the
  * near-dup pair set) is replayable in the oracle bit-for-bit, upgrading
  * `dedup_simhash` from rows-only to value-exact. MD5 costs ~5× XXH64
  * per token, but the fingerprint is computed once per document behind
  * its own exchange (never per pair), so hashing is a vanishing fraction
  * of the query; exactness across engines is worth it.
  */
case class SimHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash requires array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    SimHashImpl.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHashImpl.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

/** Static kernel shared by interpreted eval and generated code. */
object SimHashImpl {

  private val md5Local: ThreadLocal[MessageDigest] =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest =
        MessageDigest.getInstance("MD5")
    }

  /** First 8 bytes of MD5(token), little-endian — equals DuckDB's
    * `md5_number_upper(token)` reinterpreted as a signed long. */
  def tokenHash(s: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    (d(0) & 0xffL) | ((d(1) & 0xffL) << 8) | ((d(2) & 0xffL) << 16) |
      ((d(3) & 0xffL) << 24) | ((d(4) & 0xffL) << 32) |
      ((d(5) & 0xffL) << 40) | ((d(6) & 0xffL) << 48) |
      ((d(7) & 0xffL) << 56)
  }

  def compute(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = tokenHash(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column-API entry: `simhash(tokens)`. */
  def simhash(tokens: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      SimHash(org.apache.spark.sql.GraftSqlBridge.expression(tokens)))
}
