package graft.io

import graft.SparkSpec
import graft.io.Snapshots.{FileEntry, StatRange}

/** Pins the bounded-driver manifest planning (verdict r6 #4): pruning
  * runs INSIDE the manifest plan, so over a synthetic 100k-file
  * manifest the driver materializes only the handful of surviving
  * entries — and the plan-side DECIMAL(38,18) comparison matches the
  * old driver-side BigDecimal logic exactly, including beyond-2^53
  * longs where double arithmetic would collapse adjacent values.
  */
class ManifestScaleSpec extends SparkSpec {

  /** Synthetic manifest: file i covers cents [i·100, i·100+99]; every
    * 1000th file has all-null stats (must be conservatively kept);
    * `day` carries a lexicographic string range. No data files exist —
    * these tests exercise PLANNING only. */
  private def mkTable(n: Int, extras: Seq[FileEntry] = Nil): String = {
    val t = tmpDir("manifest-scale")
    import spark.implicits._
    val entries = (0 until n).map { i =>
      val stats =
        if (i % 1000 == 999) Map("cents" -> StatRange("long", null, null))
        else Map(
          "cents" -> StatRange("long",
            (i * 100L).toString, (i * 100L + 99).toString),
          "day" -> StatRange("string",
            f"2026-01-${i % 28 + 1}%02d", f"2026-01-${i % 28 + 1}%02d"))
      FileEntry(s"data/c1/p=x/f$i.parquet", "x", 10L, stats)
    } ++ extras
    entries.toDS().coalesce(1).write.parquet(s"$t/_manifests/v1")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(t, "_CURRENT"), "v1")
    t
  }

  test("100k-file manifest: a selective range materializes only the " +
      "surviving entries on the driver") {
    val n = 100000
    val t = mkTable(n)
    val hit = Snapshots.prunedFiles(spark, t, 1, "cents",
      "500000", "500250")
    // true overlaps: i in [5000, 5002]; plus the n/1000 all-null-stat
    // files that can never be pruned
    assert(hit.size == 3 + n / 1000, s"got ${hit.size}")
    val paths = hit.map(_.path).toSet
    (5000 to 5002).foreach(i =>
      assert(paths.contains(s"data/c1/p=x/f$i.parquet")))
    assert(hit.filter(_.stats("cents").lo != null).size == 3)
  }

  test("plan-side numeric compare is exact beyond 2^53 (decimal, not " +
      "double, semantics)") {
    val big = 9007199254740992L // 2^53: adjacent longs collapse as doubles
    val extras = Seq(
      FileEntry("data/c1/p=x/big0.parquet", "x", 1L,
        Map("cents" -> StatRange("long", big.toString, big.toString))),
      FileEntry("data/c1/p=x/big1.parquet", "x", 1L,
        Map("cents" -> StatRange("long",
          (big + 1).toString, (big + 1).toString))))
    val t = mkTable(0, extras)
    val hit = Snapshots.prunedFiles(spark, t, 1, "cents",
      (big + 1).toString, (big + 1).toString)
    assert(hit.map(_.path) == Seq("data/c1/p=x/big1.parquet"),
      s"2^53+1 must match only the exact file, got ${hit.map(_.path)}")
  }

  test("plan-side pruning equals the driver-side BigDecimal reference " +
      "on every file (numeric and string columns)") {
    val n = 5000
    val t = mkTable(n)
    def refKeep(e: FileEntry, c: String, lo: String, hi: String,
        numeric: Boolean): Boolean =
      e.stats.get(c) match {
        case Some(StatRange(_, flo, fhi)) if flo != null && fhi != null =>
          if (numeric)
            BigDecimal(fhi) >= BigDecimal(lo) &&
              BigDecimal(flo) <= BigDecimal(hi)
          else fhi.compareTo(lo) >= 0 && flo.compareTo(hi) <= 0
        case _ => true
      }
    val all = Snapshots.readManifest(spark, t, 1)
    for ((lo, hi) <- Seq(("0", "99"), ("123456", "130000"),
        ("499999", "499999"), ("99999999", "999999999"))) {
      val got = Snapshots.prunedFiles(spark, t, 1, "cents", lo, hi)
        .map(_.path).toSet
      val want = all.filter(refKeep(_, "cents", lo, hi, numeric = true))
        .map(_.path).toSet
      assert(got == want, s"cents [$lo,$hi]")
    }
    val gotDay = Snapshots.prunedFiles(spark, t, 1, "day",
      "2026-01-03", "2026-01-04").map(_.path).toSet
    val wantDay = all
      .filter(refKeep(_, "day", "2026-01-03", "2026-01-04",
        numeric = false)).map(_.path).toSet
    assert(gotDay == wantDay && gotDay.nonEmpty)
  }
}
