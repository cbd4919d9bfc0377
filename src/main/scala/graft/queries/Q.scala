package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query: a Spark DataFrame builder parameterized by the
  * scale-factor directory, plus (when SQL-expressible) the equivalent ANSI
  * SQL a DuckDB oracle runs over the same parquet tables.
  *
  * Oracle-parity rules (SURVEY §5.2.4, §7.4 risk register):
  *  - column names identical on both sides (driver sorts columns by name);
  *  - every query ends in a total ORDER BY (driver hash is row-ordered);
  *  - Spark ASC sorts NULLS FIRST → oracle SQL says NULLS FIRST explicitly
  *    (DuckDB defaults to NULLS LAST);
  *  - no raw SUM over doubles (order-dependent fp addition): cast operands
  *    to DECIMAL, sum exactly, cast the result back to DOUBLE;
  *  - DuckDB SUM(integer) returns HUGEINT: use COUNT(CASE ...) or wrap in
  *    CAST(... AS BIGINT) so both sides are int64;
  *  - events.ts is ns-precision parquet (Spark truncates to µs): project
  *    dates/strings derived from it, never the raw timestamp.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))

  /** Non-SQL-expressible op → driver records a weaker rows-only check. */
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}
