package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface of the custom expressions: a session built with
  * GraftExtensions answers them from plain SQL text. Separate session
  * (extensions bind at build time). */
class GraftExtensionsSpec extends AnyFunSuite {

  // getOrCreate reuses any active session and would silently skip the
  // extensions — force a fresh build regardless of suite ordering
  private lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    newSessionWithExtensions
  }

  private def newSessionWithExtensions: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-ext-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .withExtensions(new GraftExtensions)
    .getOrCreate()

  test("simhash / minhash_sig / sorted_jaccard / vector_dot from SQL") {
    spark.sparkContext.setLogLevel("WARN")
    val row = spark.sql(
      """SELECT
        |  simhash(array('a','b','c')) AS sh,
        |  size(minhash_sig(array('a','b','c'), 16)) AS k,
        |  sorted_jaccard(array('a','b','c'), array('b','c','d')) AS j,
        |  vector_dot(cast(array(1.0,2.0) as array<float>),
        |             cast(array(3.0,4.0) as array<float>)) AS d,
        |  vector_l2sq(cast(array(1.0,2.0) as array<float>),
        |              cast(array(3.0,4.0) as array<double>)) AS l2
        |""".stripMargin).head()
    assert(row.getLong(0) != 0L)
    assert(row.getInt(1) == 16)
    assert(row.getDouble(2) == 0.5)
    assert(row.getDouble(3) == 11.0)
    assert(row.getDouble(4) == 8.0) // (1-3)² + (2-4)²
  }

  test("heavy_hitters works as a SQL aggregate") {
    val got = spark.sql(
      """SELECT heavy_hitters(w, 4) AS cand
        |FROM VALUES ('a'),('a'),('a'),('b'),('b'),('c') AS t(w)
        |""".stripMargin).head().getSeq[String](0)
    assert(got.contains("a") && got.contains("b"))
    assert(got.size <= 4)
  }

  test("tdigest / tdigest_merge / tdigest_quantile work from SQL") {
    val est = spark.sql(
      """SELECT tdigest_quantile(tdigest_merge(sk), 0.5D) AS p50 FROM (
        |  SELECT g, tdigest(CAST(v AS DOUBLE)) AS sk
        |  FROM VALUES (0,1),(0,2),(0,3),(1,4),(1,5),(1,6),(1,7) AS t(g, v)
        |  GROUP BY g)
        |""".stripMargin).head().getDouble(0)
    assert(est >= 1.0 && est <= 7.0 && math.abs(est - 4.0) <= 1.0,
      s"merged p50 estimate $est")
  }

  test("SQL and Column API agree on simhash") {
    import org.apache.spark.sql.functions._
    val viaSql = spark.sql("SELECT simhash(array('x','y')) AS s").head().getLong(0)
    val viaCol = spark.range(1)
      .select(graft.functions.TextOps.simhash(array(lit("x"), lit("y"))).as("s"))
      .head().getLong(0)
    assert(viaSql == viaCol)
  }
}
