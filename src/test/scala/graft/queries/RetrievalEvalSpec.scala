package graft.queries

import graft.SparkSpec

/** Definitional invariants for the retrieval-eval family (the oracles
  * replay the same arithmetic, so only invariants catch a formula
  * miss): DCG can never exceed the ideal ordering's DCG, every ppm
  * metric stays in [0, 1e6], and IVF recall must be monotone in the
  * number of probed lists and perfect when every list is probed. */
class RetrievalEvalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("retr_ndcg: dcg <= idcg and ndcg in [0, 1e6]") {
    val rows = graft.SparkEntry.queries("retr_ndcg")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dcg, idcg, ndcg) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(dcg <= idcg, s"term ${r.get(0)}: DCG $dcg > IDCG $idcg")
      assert(ndcg >= 0 && ndcg <= 1000000L,
        s"term ${r.get(0)}: ndcg $ndcg outside [0, 1e6]")
      assert(idcg == 0 || ndcg == dcg * 1000000L / idcg,
        s"term ${r.get(0)}: ndcg inconsistent with dcg/idcg")
    }
  }

  test("emb_ivf_nprobe_curve: recall monotone, perfect at nprobe=k") {
    val rows = graft.SparkEntry.queries("emb_ivf_nprobe_curve")(
      spark, sf).collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L, 8L))
    val recalls = rows.map(_.getLong(3))
    recalls.sliding(2).foreach { case Array(a, b) =>
      assert(b >= a, s"recall fell from $a to $b as nprobe grew")
    }
    assert(recalls.last == 1000000L,
      s"nprobe = k = 8 probes every list; recall must be 1e6, " +
        s"got ${recalls.last}")
    rows.foreach(r => assert(r.getLong(1) <= r.getLong(2),
      "hits exceed ground-truth size"))
  }
}
