package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Semantic checks of pipe_dsir_resample the oracle equality can't state:
  * on a corpus where the target slice uses a disjoint vocabulary, the
  * importance weights must actually steer selection toward that
  * vocabulary (the point of DSIR), and the ppm scores must sit on the
  * correct side of parity (1e6 = "as likely under target as under raw").
  */
class DsirSpec extends SparkSpec {

  private def q = CurationQueries.all.find(_.name == "pipe_dsir_resample").get

  /** 50-doc corpus: ids 0-19 are the target slice (lang=en, long, vocab
    * "alpha..epsilon"); ids 20-49 are off-target (lang=de, vocab
    * "eins..fuenf"). Disjoint vocabularies make the expected selection
    * exact, not statistical. */
  private lazy val corpusDir: String = {
    val dir = tmpDir("dsir-corpus")
    val vocabA = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val vocabB = Seq("eins", "zwei", "drei", "vier", "fuenf")
    def text(vocab: Seq[String], seed: Int): String =
      (0 until 60).map(i => vocab((i * 7 + seed) % vocab.size)).mkString(" ")
    val rows = (0 until 50).map { id =>
      val target = id < 20
      val t = if (target) text(vocabA, id) else text(vocabB, id)
      Row(id.toLong, t, if (target) "en" else "de", s"src${id % 4}",
        t.length.toLong)
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("selection is exactly the target-vocabulary slice, above parity") {
    // 60 tokens x 5+ chars ≥ 300 chars, so every vocab-A doc passes the
    // target predicate; k = 50/5 = 10 docs must all come from it.
    val out = q.run(spark, corpusDir).collect()
    assert(out.length == 10)
    assert(out.forall(_.getLong(0) < 20L),
      s"off-target doc selected: ${out.map(_.getLong(0)).mkString(",")}")
    // target-vocab tokens are ~2.5x likelier under the target LM than
    // under the pooled raw LM (20 of 50 docs): scores clear parity
    val scores = out.map(_.getLong(2))
    assert(scores.forall(_ > 1000000L),
      s"selected score at/below 1e6 ppm parity: ${scores.min}")
  }

  test("selection size is floor(n/5) and the run is deterministic") {
    val a = q.run(spark, "/root/testdata/sf0.001").collect()
    val n = graft.Tables.documents(spark, "/root/testdata/sf0.001").count()
    assert(a.length == (n / 5).toInt)
    val b = q.run(spark, "/root/testdata/sf0.001").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("final selection is a TakeOrderedAndProject, not a global sort") {
    val plan = q.run(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected distributed top-k in:\n$plan")
  }
}
