package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** q_spatial_grid_join's oracle mirrors the SAME grid algorithm, so it
  * cannot catch an algorithmic miss (a pair outside the 3×3 cell
  * neighborhood, a double-emitted pair). This spec proves the grid
  * candidate generation against the O(n²) brute-force radius join on
  * the sf0.001 customer table: identical pair SETS, not just the
  * top-20 head the query serves. */
class SpatialJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def coords = {
    import graft.Tables
    Tables.customer(spark, sf)
      .select(col("c_custkey").as("id"),
        expr("(c_custkey * c_custkey + 3 * c_custkey) % 100000").as("x"),
        expr("(7 * c_custkey * c_custkey + 11 * c_custkey) % 100000")
          .as("y"))
  }

  test("grid-bucketed pairs equal the brute-force radius join") {
    val pt = coords.cache()
    try {
      // brute force: all pairs, exact filter
      val brute = pt.as("a").join(pt.as("b"), col("a.id") < col("b.id"))
        .where((col("a.x") - col("b.x")) * (col("a.x") - col("b.x"))
          + (col("a.y") - col("b.y")) * (col("a.y") - col("b.y"))
          <= 250000L)
        .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      // grid method: 3×3 neighborhood explode + home-cell equi-join
      val cells = pt
        .withColumn("gx", expr("x div 500"))
        .withColumn("gy", expr("y div 500"))
      val nb = cells
        .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
        .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
        .select(col("id"), col("x"), col("y"),
          (col("gx") + col("dx")).as("ngx"),
          (col("gy") + col("dy")).as("ngy"))
      val grid = nb.as("a")
        .join(cells.as("b"),
          col("a.ngx") === col("b.gx") && col("a.ngy") === col("b.gy")
            && col("a.id") < col("b.id"))
        .where((col("a.x") - col("b.x")) * (col("a.x") - col("b.x"))
          + (col("a.y") - col("b.y")) * (col("a.y") - col("b.y"))
          <= 250000L)
        .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toList

      assert(grid.size == grid.toSet.size,
        "grid join emitted a duplicate pair (home cell matched twice)")
      assert(grid.toSet == brute,
        s"grid=${grid.size} pairs, brute=${brute.size} pairs")
      assert(brute.nonEmpty, "degenerate fixture: zero close pairs")
    } finally pt.unpersist()
  }

  test("r=500 pairs never span more than one cell boundary per axis") {
    // the 3×3 neighborhood suffices iff cell size >= radius: any pair
    // within distance r differs by < 2 cells per axis
    val rows = coords.limit(200).collect()
    for (a <- rows; b <- rows if a.getLong(0) < b.getLong(0)) {
      val dx = a.getLong(1) - b.getLong(1)
      val dy = a.getLong(2) - b.getLong(2)
      if (dx * dx + dy * dy <= 250000L) {
        assert(math.abs(a.getLong(1) / 500 - b.getLong(1) / 500) <= 1)
        assert(math.abs(a.getLong(2) / 500 - b.getLong(2) / 500) <= 1)
      }
    }
  }
}
