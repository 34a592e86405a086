package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Functions._

/** Broadcast-Bloom semi-join reduction — the explicit form of the classic
  * 100 TB join optimization. When a data-scale fact table joins a selective
  * build side (a filtered dim, a drop set, a holdout list), the fact side's
  * shuffle dominates the job; a Bloom bitset of the build keys (a few MB
  * for millions of keys) broadcasts to every fact partition and eliminates
  * non-joining rows AT THE SCAN, before they are ever shuffled.
  *
  * Result-identical by construction: the filter has no false negatives, and
  * false positives die in the exact join that follows — only the shuffle
  * volume changes, by the build side's key selectivity. This is what
  * `spark.sql.optimizer.runtime.bloomFilter` does for shapes the optimizer
  * recognizes; the explicit operator works on any plan, with an
  * engine-reproducible (md5-derived) filter the oracle can replay.
  */
object SemiJoinReduction {

  /** Inner-join `fact` to `dim` with a Bloom pre-filter on the fact side.
    * `numBits` sizes the bitset (multiple of 64; ~10 bits/key gives ~1% false
    * positives at numHashes=5, so the default carries ~100k build keys —
    * size it to the build side, it broadcasts either way). */
  def bloomJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
                numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    val bloom = dim.agg(bloom_agg(col(dimKey), numBits, numHashes).as("_bloom"))
    fact
      .crossJoin(broadcast(bloom))
      .filter(bloom_contains(col("_bloom"), col(factKey), numBits, numHashes))
      .drop("_bloom")
      .join(dim, col(factKey) === col(dimKey))
  }
}
