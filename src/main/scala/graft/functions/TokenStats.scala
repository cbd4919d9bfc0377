package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass token statistics over a space-separated text column:
  * chars, tokens, distinct tokens, stopword occurrences — the quality-
  * feature denominators — in a single scan of the string.
  *
  * The compositional formulation (split + size/array_distinct/filter per
  * feature) re-evaluates `split` once per feature because CollapseProject
  * inlines the shared projection, and each HOF runs interpreted; this
  * kernel computes all four counters in one compiled pass. Token
  * semantics match `split(text, ' ')`: segments between single spaces,
  * so empty text yields one empty token — keeping the DuckDB
  * string_split oracle bit-identical. */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TokenStats.schema

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"token_stats requires string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    TokenStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : TokenStats = copy(child = newChild)
}

object TokenStats {

  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("stopword_hits", LongType, nullable = false)))

  private val stopwords: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    TextOps.EnglishStopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  def compute(text: UTF8String): InternalRow = {
    // byte-walk split on 0x20 (single-byte in UTF-8, so no multi-byte
    // sequence can contain it): no regex, no java.lang.String round
    // trip, token views share the input's byte array. Semantics match
    // split(text, ' '): N separators → N+1 tokens, empties included.
    val bytes = text.getBytes
    val seen = new java.util.HashSet[UTF8String](64)
    var nTokens = 0L
    var stop = 0L
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' '.toByte) {
        val tok = UTF8String.fromBytes(bytes, start, i - start)
        nTokens += 1
        seen.add(tok)
        if (stopwords.contains(tok)) stop += 1
        start = i + 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      text.numChars().toLong, nTokens, seen.size().toLong, stop))
  }

  def token_stats(text: Column): Column =
    column(TokenStats(expression(text)))
}
