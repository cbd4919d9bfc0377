package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract of the adaptive SimHash banding (Manku block combinations):
  * scheme choice by corpus size, exact-recall pigeonhole under every
  * scheme, legacy-band equivalence of the b=4 instance, and pair-set
  * invariance of the banded join across schemes. */
class SimHashBandingSpec extends SparkSpec {
  import SimHashBanding._

  test("choose: scheme steps up with corpus size, k fixed at 3") {
    assert(choose(5000).blocks == 4)
    assert(choose(1L << 19).blocks == 4)
    assert(choose((1L << 19) + 1).blocks == 5)
    assert(choose(1000000).blocks == 5)
    assert(choose(1L << 27).blocks == 5)
    assert(choose((1L << 27) + 1).blocks == 6)
    assert(choose(1L << 31).blocks == 6)
    assert(choose((1L << 31) + 1).blocks == 8)
    Seq(4L, 500000L, 1L << 40).foreach(n => assert(choose(n).k == 3))
  }

  test("scheme geometry: blocks tile 64 bits; key bits grow with blocks") {
    Seq(Scheme(4, 3), Scheme(5, 3), Scheme(6, 3), Scheme(8, 3)).foreach { s =>
      assert(s.widths.sum == 64)
      assert(s.offsets.head == 0)
      assert(s.combos.size ==
        (0 until s.blocks).combinations(s.blocks - 3).size)
    }
    assert(Scheme(4, 3).keyBits == 16)
    assert(Scheme(5, 3).keyBits == 26)
    assert(Scheme(6, 3).keyBits >= 32)
    assert(Scheme(8, 3).keyBits == 40)
  }

  /** JVM-side reference of the band math for one scheme. */
  private def refBands(sh: Long, s: Scheme): Seq[(Int, Long)] =
    s.combos.zipWithIndex.map { case (cmb, ci) =>
      val v = cmb.foldLeft(0L) { (acc, i) =>
        (acc << s.widths(i)) |
          ((sh >>> s.offsets(i)) & ((1L << s.widths(i)) - 1))
      }
      (ci, v)
    }

  test("b=4 instance reproduces the legacy 16-bit band values") {
    val sh = 0xDEADBEEFCAFEBABEL
    val legacy = (0 until 4).map(j => (sh >>> (16 * j)) & 0xFFFFL)
    val got = refBands(sh, Scheme(4, 3)).map(_._2)
    assert(got == legacy)
  }

  test("bands column agrees with the JVM reference (incl. sign bit set)") {
    val spark2 = spark
    import spark2.implicits._
    val sigs = Seq(0L, -1L, 0x8000000000000000L, 0xDEADBEEFCAFEBABEL,
      123456789L)
    Seq(Scheme(4, 3), Scheme(5, 3), Scheme(6, 3), Scheme(8, 3)).foreach { s =>
      val rows = sigs.toDF("sh")
        .select(col("sh"), bands(col("sh"), s).as("b"))
        .select(col("sh"), explode(col("b")).as("e"))
        .select(col("sh"), col("e.band"), col("e.band_val"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (sh, rs) =>
          sh -> rs.map(r => (r.getInt(1), r.getLong(2))).toSeq.sorted
        }
      sigs.foreach { sh =>
        assert(rows(sh) == refBands(sh, s).sorted, s"scheme b=${s.blocks}")
      }
    }
  }

  test("pigeonhole recall: every hamming<=3 pair collides on some band, " +
    "under every scheme") {
    val rnd = new scala.util.Random(7)
    Seq(Scheme(4, 3), Scheme(5, 3), Scheme(6, 3), Scheme(8, 3)).foreach { s =>
      (1 to 200).foreach { _ =>
        val a = rnd.nextLong()
        val flips = rnd.nextInt(4) // 0..3 bit flips
        val b = (1 to flips).foldLeft(a)((x, _) => x ^ (1L << rnd.nextInt(64)))
        val shared = refBands(a, s).toSet.intersect(refBands(b, s).toSet)
        assert(shared.nonEmpty,
          s"b=${s.blocks}: pair with hamming ${java.lang.Long
            .bitCount(a ^ b)} missed")
      }
    }
  }

  test("banded join pair set is scheme-invariant on a fingerprint corpus") {
    val spark2 = spark
    import spark2.implicits._
    // synthetic fingerprints with planted near-dups: pairs (2i, 2i+1)
    // differ by <=3 bits; everything else is random-far
    val rnd = new scala.util.Random(11)
    val base = (0 until 60).map(_ => rnd.nextLong())
    val rows = base.zipWithIndex.flatMap { case (sh, i) =>
      val near = (1 to rnd.nextInt(4)).foldLeft(sh)((x, _) =>
        x ^ (1L << rnd.nextInt(64)))
      Seq((2L * i, sh), (2L * i + 1, near))
    }
    val df = rows.toDF("doc_id", "sh")
    def pairs(s: Scheme): Set[(Long, Long)] = {
      val banded = df.select(col("doc_id"), col("sh"),
        explode(bands(col("sh"), s)).as("b"))
      val a = banded.select(col("b").as("ab"), col("doc_id").as("a_id"),
        col("sh").as("a_sh"))
      val bb = banded.select(col("b").as("bb"), col("doc_id").as("b_id"),
        col("sh").as("b_sh"))
      a.join(bb, col("ab") === col("bb") && col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          bit_count(col("a_sh").bitwiseXOR(col("b_sh"))).as("h"))
        .where(col("h") <= 3)
        .distinct()
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
    }
    val p4 = pairs(Scheme(4, 3))
    val p5 = pairs(Scheme(5, 3))
    val p6 = pairs(Scheme(6, 3))
    val p8 = pairs(Scheme(8, 3))
    assert(p4.nonEmpty, "fixture planted no near pairs")
    assert(p4 == p5 && p5 == p6 && p6 == p8)
    // and the planted pairs are all found
    (0 until 60).foreach { i =>
      assert(p4.contains((2L * i, 2L * i + 1)))
    }
  }
}
