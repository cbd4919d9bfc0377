package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BloomPruneSpec extends SparkSpec {

  private def fact = {
    val s = spark
    import s.implicits._
    (0L until 10000L).map(i => (i, s"v$i")).toDF("k", "payload")
  }

  private def keys = {
    val s = spark
    import s.implicits._
    // 1% selective key side
    (0L until 10000L by 100).map(i => (i, s"dim$i")).toDF("key", "tag")
  }

  test("prune keeps every true match (zero false negatives)") {
    val bloom = BloomPrune.buildFilter(keys, "key", expectedItems = 1000L)
    val pruned = BloomPrune.prune(fact, "k", bloom)
    val keptKeys = pruned.select("k").collect().map(_.getLong(0)).toSet
    val trueKeys = keys.select("key").collect().map(_.getLong(0)).toSet
    assert(trueKeys.subsetOf(keptKeys))
  }

  test("prune actually removes most non-matching rows") {
    val bloom = BloomPrune.buildFilter(keys, "key", expectedItems = 1000L)
    val kept = BloomPrune.prune(fact, "k", bloom).count()
    // 100 true matches; allow bloom false positives but demand >90% pruning
    assert(kept >= 100 && kept < 1000, s"kept $kept of 10000")
  }

  test("prunedJoin is identical to the plain join") {
    val (f, ks) = (fact, keys)
    val plain = f.join(ks, f("k") === ks("key"))
      .select("k", "payload", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    val pruned = BloomPrune.prunedJoin(fact, keys, "k", "key", 1000L)
      .select("k", "payload", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(pruned.sameElements(plain))
  }

  test("prunedJoin resolves colliding column names across sides") {
    val s = spark
    import s.implicits._
    // Key side reuses the fact's column names — including one literally
    // named like the fact key — which breaks bare col() resolution.
    val ks = (0L until 10000L by 100)
      .map(i => (i, s"dim$i", i + 1)).toDF("key", "payload", "k")
    val out = BloomPrune.prunedJoin(fact, ks, "k", "key", 1000L)
    assert(out.count() == 100)
    // the join bound fact.k to keys.key (not to keys' own "k" column)
    val cols = out.columns.count(_ == "payload")
    assert(cols == 2, "both payload columns survive, scoped by alias")
  }

  test("empty key side prunes everything") {
    val none = BloomPrune.buildFilter(keys.where(lit(false)), "key")
    assert(none.isEmpty)
    assert(BloomPrune.prune(fact, "k", none).count() == 0)
  }
}
