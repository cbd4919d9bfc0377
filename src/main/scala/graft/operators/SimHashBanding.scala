package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Adaptive SimHash banding — the Manku–Jain–Das Sarma block-combination
  * scheme ("Detecting Near-Duplicates for Web Crawling", WWW 2007,
  * public) generalizing the fixed 4×16-bit bands `dedup_simhash`
  * shipped with.
  *
  * For Hamming radius k over a 64-bit fingerprint, partition the bits
  * into `b` blocks. A pair within distance k differs in at most k
  * blocks, so it agrees EXACTLY on at least `b − k` blocks — and in
  * particular on at least one specific (b − k)-subset. Emitting one
  * compound key per (b − k)-combination of blocks therefore finds every
  * ≤ k pair (recall 1 by pigeonhole, for ANY b ≥ k + 1); the b = 4,
  * k = 3 instance (4 single-block keys of 16 bits) is exactly the
  * original banding.
  *
  * Why adapt: a 16-bit key space saturates — at 500 000 docs each band
  * bucket holds ~8 docs and candidate volume turns superlinear (the
  * measured 45× residual at the ×100 tier, BASELINE.md). Moving to
  * b = 6 widens every key to ~32 bits (2³² buckets — empty until
  * billions of docs) at the cost of C(6,3) = 20 key tables instead of
  * 4: a 5× bigger explode buys a ~65 000× larger key space. b = 8
  * (56 keys × 40 bits) covers the regime beyond that. The scheme is
  * chosen from the corpus row count — the same stats-driven planning
  * as the broadcast-vs-SMJ dimension demotion — and changes only WHICH
  * equi-join keys are emitted, never the pair predicate, so the query
  * result (all Hamming ≤ 3 pairs) is identical under every scheme and
  * the DuckDB oracle needs no scheme knowledge at all.
  *
  * Derivation for the thresholds: expected bucket occupancy n / 2^bits
  * crosses 1 at n = 65 536 for 16-bit keys; we allow 2× that before
  * stepping up (band joins tolerate small buckets), hence 131 072.
  * 32-bit keys hold to ~2³¹ docs by the same slack.
  */
object SimHashBanding {

  /** One banding scheme: block widths/offsets over the 64-bit
    * fingerprint and the list of block combinations, each of which
    * becomes one compound equi-join key. */
  final case class Scheme(blocks: Int, k: Int) {
    val widths: Array[Int] =
      Array.tabulate(blocks)(i => 64 / blocks + (if (i < 64 % blocks) 1 else 0))
    val offsets: Array[Int] = widths.scanLeft(0)(_ + _).dropRight(1)
    val combos: Seq[Seq[Int]] =
      (0 until blocks).combinations(blocks - k).map(_.toSeq).toSeq
    def keyBits: Int = combos.head.map(widths).sum
  }

  /** Scheme choice by corpus size (see thresholds above). */
  def choose(nDocs: Long, k: Int = 3): Scheme =
    if (nDocs <= (1L << 17)) Scheme(4, k)
    else if (nDocs <= (1L << 31)) Scheme(6, k)
    else Scheme(8, k)

  /** Array of (band, band_val) structs for `sh` under `scheme` —
    * explode and equi-join on both fields. Each band_val concatenates
    * the bits of one block combination; masking after the (arithmetic)
    * shift makes the top block sign-safe. */
  def bands(sh: Column, scheme: Scheme): Column = {
    val entries = scheme.combos.zipWithIndex.map { case (cmb, ci) =>
      val v = cmb.foldLeft(lit(0L)) { (acc, i) =>
        shiftleft(acc, scheme.widths(i)).bitwiseOR(
          shiftright(sh, scheme.offsets(i))
            .bitwiseAND(lit((1L << scheme.widths(i)) - 1)))
      }
      struct(lit(ci).as("band"), v.as("band_val"))
    }
    array(entries: _*)
  }
}
