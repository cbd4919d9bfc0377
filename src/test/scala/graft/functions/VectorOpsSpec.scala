package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorOpsSpec extends SparkSpec {

  private def vecs(rows: (Long, Seq[Float])*) = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  test("dot: exact on known vectors, codegen and interpreted agree") {
    val df = vecs((1L, Seq(1f, 2f, 3f)), (2L, Seq(4f, 5f, 6f)))
    val pair = df.as("a").join(df.as("b"),
      col("a.vec_id") < col("b.vec_id"))
      .select(VectorOps.dot(col("a.embedding"), col("b.embedding")).as("d"))
    assert(pair.head().getDouble(0) == 32.0) // 4+10+18
    withInterpretedEval {
      assert(pair.head().getDouble(0) == 32.0)
    }
  }

  test("cosine: 1 for parallel, 0 for orthogonal, -1 for opposite") {
    val df = vecs(
      (1L, Seq(1f, 0f)), (2L, Seq(2f, 0f)),
      (3L, Seq(0f, 1f)), (4L, Seq(-1f, 0f)))
    val m = df.as("a").join(df.as("b"), col("a.vec_id") === 1)
      .select(col("b.vec_id"),
        VectorOps.cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(m(2L) - 1.0) < 1e-12)
    assert(math.abs(m(3L)) < 1e-12)
    assert(math.abs(m(4L) + 1.0) < 1e-12)
  }

  test("null inputs propagate (expression null-safety)") {
    val df = vecs((1L, Seq(1f, 2f)))
      .select(VectorOps.dot(col("embedding"), lit(null).cast("array<float>"))
        .as("d"))
    assert(df.head().isNullAt(0))
  }

  test("lshBucket: deterministic, identical vectors share a bucket") {
    val df = vecs(
      (1L, Seq.fill(8)(0.5f)), (2L, Seq.fill(8)(0.5f)),
      (3L, Seq.tabulate(8)(i => if (i % 2 == 0) 1f else -1f)))
      .withColumn("bucket", VectorOps.lshBucket(col("embedding"), 8, 8))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(m(1L) == m(2L))
    val again = df.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(m == again)
  }

  test("lshBucket recall: cosine-near vectors usually collide") {
    val rnd = new scala.util.Random(1)
    val base = Array.fill(64)(rnd.nextGaussian().toFloat)
    val near = base.map(v => v + 0.01f * rnd.nextGaussian().toFloat)
    val far = Array.fill(64)(rnd.nextGaussian().toFloat)
    val df = vecs((1L, base.toSeq), (2L, near.toSeq), (3L, far.toSeq))
      .withColumn("bucket", VectorOps.lshBucket(col("embedding"), 64, 8))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(m(1L) == m(2L), "near-identical vectors must share the bucket")
    assert(m(1L) != m(3L), "random vector should land elsewhere (8 bits)")
  }
}
