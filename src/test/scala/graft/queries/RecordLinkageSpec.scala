package graft.queries

import graft.SparkSpec

/** The recall theorem behind q_record_linkage's segment blocking: a
  * single-substitution corruption leaves >= 2 of 3 segments intact, at
  * least one of which is a uniform (under-cap) low-order-digit segment —
  * so EVERY planted dirty record must surface its source (or an exact
  * dist-0 collision) among candidates, cap or no cap. */
class RecordLinkageSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def run() = DedupQueries.all.find(_.name == "q_record_linkage").get
    .run(spark, dir).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))

  test("every planted dirty record is linked at distance <= 1") {
    val out = run()
    val planted = graft.Tables.customer(spark, dir)
      .where(org.apache.spark.sql.functions.expr("c_custkey % 7 = 0"))
      .count()
    assert(out.length == planted,
      s"${out.length} linked of $planted planted dirty records")
    // the source pair (dist 1) is always a candidate, so the best match
    // can never be worse than 1
    assert(out.forall(_._3 <= 1),
      s"best-match above dist 1: ${out.filter(_._3 > 1).take(5).mkString}")
    // and when the best is the source itself the distance is exactly 1
    assert(out.filter(t => t._1 == t._2).forall(_._3 == 1))
  }

  test("linkage is deterministic across runs") {
    assert(run().toSeq == run().toSeq)
  }
}
