package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KMeansSpec extends SparkSpec {

  private def emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("fit is deterministic and produces k (or fewer) centroids") {
    val a = KMeans.fit(emb, k = 4, iters = 2)
    val b = KMeans.fit(emb, k = 4, iters = 2)
    assert(a == b, "training must be bit-deterministic")
    assert(a.nonEmpty && a.size <= 4)
    assert(a.map(_.cid) == a.map(_.cid).sorted)
    val dim = a.head.cvec.size
    assert(a.forall(_.cvec.size == dim))
  }

  test("one Lloyd iteration does not increase total within-cluster cost") {
    val e = emb
    def cost(cents: Seq[KMeans.Centroid]): Double = {
      val entries = array(cents.map(c =>
        struct(graft.functions.VectorOps.l2sq(col("embedding"),
          array(c.cvec.map(lit): _*)).as("d"), lit(c.cid).as("cid"))): _*)
      e.select(sum(array_min(entries).getField("d")).as("c"))
        .head().getDouble(0)
    }
    val it1 = KMeans.fit(e, k = 4, iters = 1)
    val it3 = KMeans.fit(e, k = 4, iters = 3)
    assert(cost(it3) <= cost(it1) + 1e-9,
      "Lloyd iterations must be non-increasing in k-means cost")
  }

  test("assignExpr picks the true argmin with lower-cid tie-break") {
    val s = spark
    import s.implicits._
    val cents = Seq(
      KMeans.Centroid(0, Seq(0.0, 0.0)),
      KMeans.Centroid(1, Seq(4.0, 0.0)),
      KMeans.Centroid(2, Seq(4.0, 0.0))) // duplicate of 1 → tie
    val df = Seq(
      (1L, Seq(0.5f, 0.0f)),  // nearest 0
      (2L, Seq(3.9f, 0.0f)),  // nearest 1 (ties with 2 → lower cid)
      (3L, Seq(2.0f, 0.0f)))  // exact midpoint 0 vs 1: d equal → cid 0
      .toDF("vec_id", "embedding")
    val out = df.select(col("vec_id"),
      KMeans.assignExpr(col("embedding"), cents).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 0))
  }

  test("assignment plan is a narrow map: no exchange, no join") {
    val assigned = emb.withColumn("cid",
      KMeans.assignExpr(col("embedding"),
        KMeans.fit(emb, k = 4, iters = 1)))
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment must not shuffle:\n$plan")
    assert(!plan.toLowerCase.contains("join"), "assignment must not join")
  }

  test("PQ invariant: winning sub-distances sum to the exact " +
      "vector-to-reconstruction distance") {
    // Product quantization trains one codebook per disjoint coordinate
    // slice, so Σ_s l2sq(v_s, centroid_s) must equal l2sq(v, concat of
    // the chosen sub-centroids) — exactly in real arithmetic, within one
    // rounding regrouping in floats (the slices sum as partial folds).
    val m = 4
    val sub = 16
    val books = (0 until m).map { i =>
      KMeans.fit(
        emb.select(col("vec_id"),
          slice(col("embedding"), i * sub + 1, sub).as("embedding")),
        k = 8, iters = 1)
    }
    val near = books.zipWithIndex.map { case (c, i) =>
      KMeans.nearestExpr(slice(col("embedding"), i * sub + 1, sub), c)
        .as(s"n$i")
    }
    val rows =
      emb.select(Seq(col("vec_id"), col("embedding")) ++ near: _*).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val vec = r.getSeq[Float](1)
      val recon = new Array[Double](m * sub)
      var dsum = 0.0
      (0 until m).foreach { i =>
        val st = r.getStruct(2 + i)
        dsum += st.getDouble(0)
        val cv = books(i).find(_.cid == st.getInt(1)).get.cvec
        cv.zipWithIndex.foreach { case (v, j) => recon(i * sub + j) = v }
      }
      val exact = vec.zip(recon)
        .map { case (a, b) => (a.toDouble - b) * (a.toDouble - b) }.sum
      assert(math.abs(dsum - exact) <= 1e-9 * math.max(1.0, exact),
        s"vec ${r.getLong(0)}: $dsum vs $exact")
    }
  }

  test("fitMulti is bit-identical to m independent per-slice fits") {
    val e = emb
    val m = 4; val subDim = 16
    val fused = KMeans.fitMulti(e, m = m, subDim = subDim, k = 5, iters = 2)
    val separate = (0 until m).map { i =>
      KMeans.fit(
        e.select(col("vec_id"),
          slice(col("embedding"), i * subDim + 1, subDim).as("embedding")),
        k = 5, iters = 2)
    }
    assert(fused == separate,
      "fusing the m trainings into one scan must not change any centroid")
  }

  test("PqNearestAll kernel is bit-identical to the compositional " +
      "slice+nearestExpr form, both modes") {
    val e = emb
    val m = 4; val subDim = 16
    val books = KMeans.fitMulti(e, m = m, subDim = subDim, k = 5, iters = 1)
    // compositional reference: m independent slice->nearestExpr structs
    val refCols = books.zipWithIndex.map { case (c, i) =>
      KMeans.nearestExpr(slice(col("embedding"), i * subDim + 1, subDim), c)
        .as(s"r$i")
    }
    val kernel = KMeans.nearestAllExpr(col("embedding"), subDim, books)
    val rows = e.select(
      Seq(col("vec_id"), kernel.as("pq")) ++ refCols: _*).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pq = r.getSeq[org.apache.spark.sql.Row](1)
      (0 until m).foreach { i =>
        val ref = r.getStruct(2 + i)
        assert(pq(i).getDouble(0) == ref.getDouble(0) &&
          pq(i).getInt(1) == ref.getInt(1),
          s"vec ${r.getLong(0)} subspace $i: ${pq(i)} vs $ref")
      }
    }
    // cid-only mode agrees with the struct mode
    val both = e.select(
      KMeans.nearestAllExpr(col("embedding"), subDim, books).as("pq"),
      graft.functions.VectorOps.pqAssignAll(col("embedding"), subDim,
        books.map(_.map(c => (c.cid, c.cvec.toArray)))).as("cids"))
      .collect()
    both.foreach { r =>
      val pq = r.getSeq[org.apache.spark.sql.Row](0).map(_.getInt(1))
      val cids = r.getSeq[Int](1)
      assert(pq == cids)
    }
  }
}
