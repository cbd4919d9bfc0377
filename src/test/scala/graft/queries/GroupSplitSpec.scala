package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** The group-split claims its aggregate output cannot state: the split
  * is a pure function of `source` (no provenance group ever spans the
  * train/val line), while the doc-hash split it complements DOES leak
  * sources across splits — the contamination the group split exists to
  * close.
  */
class GroupSplitSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("a source never spans two splits under the group split") {
    val h = pmod(
      conv(substring(md5(col("source")), 1, 15), 16, 10).cast("long"),
      lit(100L))
    val assign = Tables.documents(spark, dir)
      .select(col("source"),
        when(h < 90, "train").when(h < 95, "val").otherwise("test")
          .as("split"))
      .distinct()
    val spanning = assign.groupBy(col("source")).count()
      .where(col("count") > 1).count()
    assert(spanning == 0L, s"$spanning sources span multiple splits")
  }

  test("the doc-hash split does leak sources across splits") {
    val perSource = SparkEntry.queries("pipe_train_val_split")(spark, dir)
      .groupBy(col("source")).count().where(col("count") > 1).count()
    assert(perSource > 0L,
      "expected at least one source split across train/val/test under " +
        "doc-id hashing — the leak pipe_group_split closes")
  }

  test("group split partitions the corpus exactly") {
    val docs = Tables.documents(spark, dir)
    val out = SparkEntry.queries("pipe_group_split")(spark, dir).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs.count())
    assert(out.map(_.getAs[Long]("n_sources")).sum ==
      docs.select(col("source")).distinct().count())
  }
}
