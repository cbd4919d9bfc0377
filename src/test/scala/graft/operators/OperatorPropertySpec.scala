package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests for the round-2 operators: each must be
  * result-equivalent to its naive/plain formulation on arbitrary
  * generated inputs — the operators only change the PLAN, never the
  * answer. (Raw ScalaCheck Gen with fixed seeds, same bridge-free
  * pattern as DqPropertySpec.)
  */
class OperatorPropertySpec extends SparkSpec {

  private def forAll[A](g: Gen[A], trials: Int = 8)(f: A => Unit): Unit =
    (1 to trials).foreach { i =>
      f(g.pureApply(Gen.Parameters.default.withSize(60), Seed(i.toLong)))
    }

  private val pointsGen: Gen[List[Double]] =
    Gen.listOf(Gen.choose(-50.0, 250.0))

  private val intervalsGen: Gen[List[(Double, Double)]] =
    Gen.listOf(for {
      lo <- Gen.choose(-60.0, 240.0)
      span <- Gen.choose(0.0, 80.0)
    } yield (lo, lo + span))

  test("RangeJoin ≡ naive theta join for arbitrary points/intervals/widths") {
    val s = spark
    import s.implicits._
    forAll(for {
      ps <- pointsGen; ivs <- intervalsGen
      w <- Gen.oneOf(0.7, 10.0, 33.3, 500.0)
    } yield (ps, ivs, w)) { case (ps, ivs, w) =>
      val pts = ps.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("pid", "v")
      val bands = ivs.zipWithIndex.map { case ((lo, hi), i) =>
        (i.toLong, lo, hi)
      }.toDF("band_id", "lo", "hi")
      val fast = RangeJoin.pointInInterval(pts, bands, "v", "lo", "hi", w)
        .select("pid", "band_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val naive = pts
        .join(bands, col("v") >= col("lo") && col("v") < col("hi"))
        .select("pid", "band_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(fast == naive, s"w=$w fast=$fast naive=$naive")
    }
  }

  private val skewedRows: Gen[List[(String, Long)]] =
    Gen.listOf(for {
      hot <- Gen.frequency(4 -> Gen.const("hot"),
        1 -> Gen.oneOf("a", "b", "c", "d"))
      user <- Gen.choose(0L, 30L)
    } yield (hot, user))

  test("saltedCounts ≡ plain groupBy for arbitrary skew and salt counts") {
    val s = spark
    import s.implicits._
    forAll(for { rows <- skewedRows; n <- Gen.oneOf(1, 2, 8, 64) }
        yield (rows, n)) { case (rows, nSalts) =>
      if (rows.nonEmpty) {
        val df = rows.toDF("key", "user_id")
        val salted = Salting.saltedCounts(df, Seq("key"), "user_id", nSalts)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          .sorted.toSeq
        val plain = df.groupBy("key")
          .agg(count(lit(1)).as("n"),
            count_distinct(col("user_id")).as("u"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          .sorted.toSeq
        assert(salted == plain, s"nSalts=$nSalts")
      }
    }
  }

  private val tokensGen: Gen[List[String]] =
    Gen.listOf(Gen.oneOf("w1", "w2", "w3", "aa", "zz", "m", "longword"))

  test("sorted_shingles ≡ array_sort(array_distinct(shingles)) for any n") {
    val s = spark
    import s.implicits._
    import graft.functions.{TextKernels, TextOps}
    forAll(for { ts <- tokensGen; n <- Gen.oneOf(1, 2, 3, 5) }
        yield (ts, n)) { case (ts, n) =>
      val df = Seq(ts.mkString(" ")).toDF("text")
      val toks = split(col("text"), " ")
      val r = df.select(
        TextKernels.sorted_shingles(toks, n).as("fast"),
        array_sort(array_distinct(TextOps.shingles(toks, n))).as("ref"))
        .head()
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"n=$n tokens=$ts")
    }
  }

  test("TopK.perGroup ≡ window row_number for arbitrary groups, values, k") {
    val s = spark
    import s.implicits._
    val rowsGen: Gen[List[(String, Double)]] =
      Gen.listOf(for {
        g <- Gen.oneOf("a", "b", "c", "d")
        v <- Gen.choose(0, 9).map(_.toDouble) // coarse values → many ties
      } yield (g, v))
    forAll(for { rs <- rowsGen; k <- Gen.choose(1, 4) } yield (rs, k)) {
      case (rs, k) =>
        val df = rs.zipWithIndex
          .map { case ((g, v), i) => (g, i.toLong, v) }
          .toDF("g", "id", "v").repartition(3, col("id"))
        val native = TopK.perGroup(df, k, Seq("g"),
            Seq(TopK.desc("v"), TopK.asc("id")))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
          .sorted.toSeq
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("g")).orderBy(col("v").desc, col("id"))
        val naive = df.withColumn("rn", row_number().over(w))
          .where(col("rn") <= k).drop("rn")
          .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
          .sorted.toSeq
        assert(native == naive, s"k=$k native=$native naive=$naive")
    }
  }
}
