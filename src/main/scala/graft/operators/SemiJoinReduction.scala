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

  /** Anti-join `fact` against `build` with a Bloom FAST PATH: a fact row
    * that misses the bloom is DEFINITELY absent from the build side (no
    * false negatives), so it passes the anti-join without ever entering it;
    * only bloom-positives — the build side's selectivity plus the false
    * positive rate — pay the exact confirm join. Result-identical to a
    * plain left_anti by construction.
    *
    * This is the membership-index shape of dedup at 100 TB: the build side
    * (corpus content hashes) is data-scale, but its bloom is a few MB,
    * broadcast once; the typical ingest batch is mostly-new, so almost all
    * of it takes the row-local fast path and the confirm join's probe side
    * is tiny. A null fact key is definitely-new (the build keys hash
    * non-null), so nulls take the fast path — matching left_anti's
    * null-never-matches semantics.
    *
    * The two output branches share one broadcast (ReuseExchange unifies the
    * identical bloom subtrees), and the bitset itself is word-wise
    * OR-mergeable: append each ingest's survivors map-side and the stored
    * artifact stays valid forever — no rebuild, no re-read. */
  def bloomAntiJoin(fact: DataFrame, build: DataFrame, factKey: String, buildKey: String,
                    numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    val bloom = build.agg(bloom_agg(col(buildKey), numBits, numHashes).as("_bloom"))
    val probed = fact.crossJoin(broadcast(bloom))
      .withColumn("_maybe", coalesce(
        bloom_contains(col("_bloom"), col(factKey), numBits, numHashes), lit(false)))
      .drop("_bloom")
    val sure = probed.filter(!col("_maybe")).drop("_maybe")
    val confirm = probed.filter(col("_maybe")).drop("_maybe")
      .join(build.select(col(buildKey).as("_bak")).distinct(),
        col(factKey) === col("_bak"), "left_anti")
    sure.unionByName(confirm)
  }
}
