package graft.queries

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal pipeline entries. The binary payloads are synthesized from
  * documents.text (deterministic), so `mm_features`'s byte-length and
  * content-hash columns ARE oracle-able facts about the source table even
  * though the decode stage itself is a stub. */
object MultimodalQueries {

  val all: Seq[Q] = Seq(
    // n_bytes of the UTF-8 payload must equal strlen — checkable in SQL.
    Q(
      "mm_payload_audit",
      """SELECT CAST(doc_id AS BIGINT) AS media_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  COUNT(*) OVER () AS corpus_size
        |FROM documents
        |ORDER BY media_id NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val media = Multimodal.syntheticMedia(s, d)
      media.toDF()
        .select(col("media_id"),
          length(col("bytes")).cast("long").as("n_bytes"))
        .withColumn("corpus_size", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
        .orderBy(col("media_id"))
    },

    // full decode-stub feature extraction — rows-only (stub semantics)
    Q.noOracle("mm_features") { (s, d) =>
      Multimodal.extractFeatures(Multimodal.syntheticMedia(s, d))
        .toDF().orderBy(col("media_id"))
    },

    // frame sampling: variable-length explode per media row — rows-only
    Q.noOracle("mm_frame_samples") { (s, d) =>
      Multimodal.sampleFrames(Multimodal.syntheticMedia(s, d))
        .toDF().orderBy(col("media_id"), col("frame_idx"))
    }
  )
}
