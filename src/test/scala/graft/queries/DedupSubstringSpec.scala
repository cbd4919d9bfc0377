package graft.queries

import graft.SparkSpec

/** Unit fixtures for the exact repeated-substring dedup
  * ([[DedupQueries.substringDedupSpans]]) — keep-first attribution,
  * island merging of overlapping windows, gap splitting, and internal
  * (same-doc) repetition, on hand-built corpora where the expected
  * maximal spans are enumerable. L=3 keeps fixtures readable; the
  * registered query (L=8) is oracle-checked at both SFs. */
class DedupSubstringSpec extends SparkSpec {

  import spark.implicits._

  private def run(docs: (Long, String)*): Map[Long, (Long, Long)] =
    DedupQueries
      .substringDedupSpans(docs.toDF("doc_id", "text"), L = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("cross-doc shared span: later doc drops it, first keeps it") {
    val out = run(
      10L -> "a1 a2 a3 a4 a5 u1 u2",
      11L -> "v1 a1 a2 a3 a4 a5 v2")
    // doc 10 is the first occurrence of every shared gram -> untouched
    assert(!out.contains(10L))
    // doc 11: grams at p=2,3,4 repeat -> one merged island [2..6] = 5 toks
    assert(out(11L) == ((1L, 5L)))
  }

  test("full-copy doc collapses to ONE island covering the whole doc") {
    val out = run(
      20L -> "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10",
      21L -> "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10")
    assert(!out.contains(20L))
    assert(out(21L) == ((1L, 10L)))
  }

  test("same-doc internal repetition drops only the later occurrence") {
    val out = run(30L -> "c1 c2 c3 u1 u2 c1 c2 c3 u3")
    // p=6 gram "c1 c2 c3" repeats p=1 -> island [6..8]
    assert(out(30L) == ((1L, 3L)))
  }

  test("two separated shared spans stay two islands") {
    val out = run(
      40L -> "d1 d2 d3 x1 d4 d5 d6",
      41L -> "d1 d2 d3 y1 d4 d5 d6")
    assert(!out.contains(40L))
    assert(out(41L) == ((2L, 6L))) // [1..3] and [5..7]
  }

  test("docs shorter than L produce no grams and never appear") {
    val out = run(50L -> "e1 e2", 51L -> "e1 e2")
    assert(out.isEmpty)
  }
}
