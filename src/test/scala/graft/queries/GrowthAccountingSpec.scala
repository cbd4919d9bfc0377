package graft.queries

import graft.SparkSpec

/** q_growth_accounting's oracle replays the same joins, so only an
  * invariant spec can catch a state-classification miss. The growth
  * accounting identities, proven on sf0.01:
  *   - every active user is exactly one of new/retained/resurrected:
  *     n_active = n_new + n_retained + n_resurrected on every row;
  *   - the earliest week has no history: all users are NEW and none
  *     churned INTO it;
  *   - conservation across consecutive weeks: retained(w) + churned(w)
  *     = active(w−7) — last week's actives either stayed or churned. */
class GrowthAccountingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("growth accounting identities hold") {
    val q = graft.SparkEntry.queries("q_growth_accounting")
    val rows = q(spark, sf).collect()
    assert(rows.length > 1, "need at least two active weeks")

    rows.foreach { r =>
      val (active, nw, ret, res) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(active == nw + ret + res,
        s"week ${r.get(0)}: $active != $nw + $ret + $res")
    }

    val first = rows.head
    assert(first.getLong(2) == first.getLong(1),
      "earliest week must be all-new")
    assert(first.getLong(3) == 0 && first.getLong(4) == 0,
      "earliest week cannot retain or resurrect")

    // conservation on consecutive weeks (wk spine is Monday dates)
    val byWeek = rows.map(r =>
      r.getDate(0).toLocalDate -> r).toMap
    rows.foreach { r =>
      val prev = byWeek.get(r.getDate(0).toLocalDate.minusDays(7))
      prev.foreach { p =>
        assert(r.getLong(3) + r.getLong(5) == p.getLong(1),
          s"week ${r.get(0)}: retained ${r.getLong(3)} + churned " +
            s"${r.getLong(5)} != prev active ${p.getLong(1)}")
      }
    }
  }
}
