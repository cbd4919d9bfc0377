package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariant tests for the curation operators — properties the DuckDB
  * hash check can't express (they quantify over the OUTPUT, not against
  * a reference value). */
class CurationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    CurationQueries.all.find(_.name == name).get.run(spark, dir)

  test("pii_redact: planted PII is counted and fully redacted") {
    val rows = q("text_pii_redact").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == (if (id % 3 == 0) 1L else 0L),
        s"doc $id email count")
      assert(r.getLong(2) == (if (id % 5 == 0) 1L else 0L),
        s"doc $id phone count")
    }
    // redaction is total: re-scanning the redacted text finds nothing.
    // (Recompute redaction here rather than trusting the fingerprint.)
    val leftover = spark.sql(
      s"""SELECT count(*) FROM parquet.`$dir/documents.parquet`
         |WHERE regexp_count(
         |  regexp_replace(
         |    regexp_replace(
         |      concat(text, ' contact user', doc_id, '@example.com',
         |             ' call 555-123-4567'),
         |      '[a-z0-9._%+-]+@[a-z0-9.-]+\\\\.[a-z]{2,}', '<EMAIL>'),
         |    '555-[0-9]{3}-[0-9]{4}', '<PHONE>'),
         |  '[a-z0-9._%+-]+@|555-[0-9]{3}') > 0""".stripMargin)
      .head().getLong(0)
    assert(leftover == 0, "no PII pattern survives redaction")
  }

  test("pack_sequences: intervals are contiguous per source and chunks consistent") {
    val rows = q("pipe_pack_sequences")
      .select("source", "doc_id", "n_tokens", "tok_start",
        "chunk_first", "chunk_last")
      .collect()
      .groupBy(_.getString(0))
    rows.foreach { case (src, docs) =>
      val ordered = docs.sortBy(_.getLong(1))
      var cursor = 0L
      ordered.foreach { r =>
        assert(r.getLong(3) == cursor,
          s"$src doc ${r.getLong(1)}: tok_start must equal running sum")
        cursor += r.getLong(2)
        assert(r.getLong(4) == r.getLong(3) / 256)
        assert(r.getLong(5) == (r.getLong(3) + r.getLong(2) - 1) / 256)
        assert(r.getLong(4) <= r.getLong(5))
      }
    }
  }

  test("language_balanced: quota respected, deterministic, subset of corpus") {
    val a = q("pipe_language_balanced").collect().map(r =>
      (r.getLong(0), r.getString(1)))
    val b = q("pipe_language_balanced").collect().map(r =>
      (r.getLong(0), r.getString(1)))
    assert(a.sameElements(b), "sample must be deterministic")
    val perLang = a.groupBy(_._2).map { case (l, xs) => l -> xs.length }
    assert(perLang.values.forall(_ <= 40), s"quota breached: $perLang")
    assert(perLang.keySet.subsetOf(Set("en", "de", "es", "fr", "zh")))
  }

  test("repetition_signals: fractions in range, keep consistent with thresholds") {
    val rows = q("text_repetition_signals").collect()
    rows.foreach { r =>
      val (dupW, topW) = (r.getDouble(2), r.getDouble(3))
      assert(dupW >= 0.0 && dupW < 1.0)
      assert(topW > 0.0 && topW <= 1.0)
      assert(r.getBoolean(5) == (dupW <= 0.9 && topW <= 0.2))
    }
  }

  test("contamination: flagged docs genuinely share a 5-gram with the benchmark") {
    val s = spark
    val flagged = q("pipe_contamination").collect()
    // every reported doc is non-benchmark and its count is positive
    assert(flagged.forall(_.getLong(1) >= 1))
    val docs = graft.Tables.documents(s, dir)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(flagged.forall(r => docs(r.getLong(0)) != "src0"),
      "benchmark docs must never be flagged against themselves")
  }

  test("span_dedup: the lowest doc keeps everything; global span budget " +
      "balances; kept counts never exceed totals") {
    val rows = q("pipe_span_dedup")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 500)
    rows.foreach { case (id, nSpans, nKept) =>
      assert(nKept >= 0 && nKept <= nSpans, s"doc $id kept > total")
    }
    // keep-first orders by (doc_id, pos): doc 0 can never lose a span
    // to a later doc — only to itself, and its spans are distinct or
    // not; recompute its self-collisions directly
    val s = spark
    val doc0 = graft.Tables.documents(s, dir)
      .where(col("doc_id") === 0).select(col("text"))
      .head().getString(0).split(" ")
    val spans0 = doc0.grouped(10).map(_.mkString(" ")).toSeq
    val (n0, k0) = rows.find(_._1 == 0L).map(r => (r._2, r._3)).get
    assert(n0 == spans0.length && k0 == spans0.distinct.length,
      "doc 0 must keep exactly its distinct spans")
    // global: total kept == number of DISTINCT spans in the corpus
    val allSpans = graft.Tables.documents(s, dir)
      .select(col("text")).collect().flatMap(
        _.getString(0).split(" ").grouped(10).map(_.mkString(" ")))
    assert(rows.map(_._3).sum == allSpans.distinct.length,
      "kept spans must equal distinct spans corpus-wide")
  }

  test("temperature_mix: per-source draw is exactly min(quota, n) with " +
      "quota = floor(4 * sqrt(n))") {
    val s = spark
    val got = q("pipe_temperature_mix").collect()
      .groupBy(_.getString(1)).map { case (src, rs) =>
        src -> (rs.length.toLong, rs.head.getLong(2))
      }
    val counts = graft.Tables.documents(s, dir)
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { case (src, n) =>
      val quota = math.floor(4 * math.sqrt(n.toDouble)).toLong
      val (drawn, reported) = got.getOrElse(src, (0L, quota))
      assert(reported == quota, s"$src quota")
      assert(drawn == math.min(quota, n), s"$src drawn $drawn")
    }
  }
}
