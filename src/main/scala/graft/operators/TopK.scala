package graft.operators

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, SortOrder}

import graft.plans.{TopKPerGroupNode, TopKStrategy}

/** User-facing entry for the native per-group top-k operator
  * ([[graft.plans.TopKPerGroupNode]] — see its scaladoc for the
  * two-phase bounded-heap physical design and why it beats the window
  * `row_number` plan at scale).
  *
  * {{{
  *   TopK.perGroup(lineitem, 2,
  *     Seq("l_orderkey"),
  *     Seq(TopK.desc("l_extendedprice"), TopK.asc("l_linenumber")))
  * }}}
  *
  * Names are resolved against the input's schema up front (the
  * `dropDuplicates(colNames)` precedent), so the custom logical node is
  * born fully resolved — no reliance on analyzer rules reaching inside a
  * node they don't know. Null ordering matches the window default
  * (ASC → NULLS FIRST, DESC → NULLS LAST).
  *
  * `order` must be a TOTAL order within each group (tiebreak on a unique
  * column) for a deterministic result — the same contract the window
  * formulation has.
  */
object TopK {

  /** One sort key of the per-group ordering. */
  final case class Key(name: String, descending: Boolean)

  def asc(name: String): Key = Key(name, descending = false)
  def desc(name: String): Key = Key(name, descending = true)

  def perGroup(df: DataFrame, k: Int, groupCols: Seq[String],
      order: Seq[Key]): DataFrame = {
    val spark = df.sparkSession
    // Runtime strategy registration: makes the operator work in ANY
    // session (the round driver builds its own SparkSession without
    // spark.sql.extensions). Idempotent; GraftExtensions also injects
    // the strategy for the config-driven path.
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    val child = GraftSqlBridge.analyzedPlan(df)
    def attr(name: String): Attribute =
      child.output.find(_.name == name)
        .orElse(child.output.find(_.name.equalsIgnoreCase(name)))
        .getOrElse(throw new IllegalArgumentException(
          s"topKPerGroup: no column '$name' in [" +
            child.output.map(_.name).mkString(", ") + "]"))
    val ordering = order.map { key =>
      SortOrder(attr(key.name),
        if (key.descending) Descending else Ascending)
    }
    GraftSqlBridge.ofRows(spark,
      TopKPerGroupNode(k, groupCols.map(attr), ordering, child))
  }
}
