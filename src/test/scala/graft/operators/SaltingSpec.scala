package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SaltingSpec extends SparkSpec {

  private def skewed = {
    val s = spark
    import s.implicits._
    // hot key: 900 of 1000 rows share key "hot"; users repeat across salts
    (0 until 1000).map { i =>
      (if (i < 900) "hot" else s"k${i % 7}", (i % 43).toLong, i.toLong)
    }.toDF("key", "user_id", "row_id")
  }

  test("saltedCounts equals plain groupBy counts, incl. count-distinct") {
    val df = skewed
    val salted = Salting.saltedCounts(df, Seq("key"), "user_id", nSalts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    val plain = df.groupBy("key")
      .agg(count(lit(1)).as("n"), count_distinct(col("user_id")).as("u"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(salted.sameElements(plain),
      s"salted ${salted.toSeq} != plain ${plain.toSeq}")
  }

  test("saltedCounts really spreads a hot key over multiple salt buckets") {
    val n = Salting.withSalt(skewed.where(col("key") === "hot"),
        col("user_id"), 8)
      .select("__salt").distinct().count()
    assert(n >= 4, s"hot key only hit $n salt buckets")
  }

  test("saltedJoin equals the plain equi-join") {
    val s = spark
    import s.implicits._
    val dim = Seq(("hot", "H"), ("k0", "A"), ("k3", "B")).toDF("key", "tag")
    val fact = skewed
    val salted = Salting.saltedJoin(fact, dim, "key", col("row_id"), nSalts = 4)
      .select("row_id", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    val plain = fact.join(dim, "key").select("row_id", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(salted.sameElements(plain))
  }
}
