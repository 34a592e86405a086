package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Functions.md5_prefix_long

/** Count-Min Sketch frequency estimation — the bounded-memory answer to
  * "how often does each key occur" when exact per-key state is too large
  * (token/URL/host frequencies over a 100 TB corpus): a depth x width
  * counter table whose size is CHOSEN, not data-dependent, with the
  * classic one-sided guarantee est >= true and
  * P[est > true + eps*N] <= delta for width = ceil(e/eps),
  * depth = ceil(ln(1/delta)) (Cormode & Muthukrishnan 2005).
  *
  * Why explicit md5 bucket hashing instead of Spark's built-in
  * `count_min_sketch` aggregate: the sketch must be an ENGINE-PORTABLE
  * artifact. Buckets derive from [[graft.Functions.md5_prefix_long]]
  * (j + "_" + key), so any engine — the DuckDB oracle included — rebuilds
  * the identical table bit-for-bit, and estimates are pure sums/mins:
  * order-invariant, exactly mergeable (unlike Misra-Gries-style top-k
  * state, whose counts depend on merge order and are therefore not
  * cross-engine reproducible).
  *
  * Scale design: the build is ONE map-side-combined aggregate keyed on
  * (depth, bucket) whose RESULT is depth x width rows — metadata-sized,
  * broadcastable; hashing is row-local inside the explode projection.
  * Estimation joins candidates against the BROADCAST sketch — the corpus
  * is never touched again.
  */
object Sketches {

  private def bucketed(keyCol: String, width: Int, depth: Int) =
    explode(transform(sequence(lit(0), lit(depth - 1)),
      j => struct(j.as("j"),
        pmod(md5_prefix_long(
          concat(j.cast("string"), lit("_"), col(keyCol).cast("string"))),
          lit(width)).as("bucket"))))

  /** Build the sketch from occurrence rows (one row per observed key).
    * Output: (j, bucket, cnt) — at most depth x width rows regardless of
    * input size. Sketches over disjoint inputs ADD: union two builds and
    * re-aggregate sum(cnt) to merge (the streaming/partitioned-ingest
    * path). */
  def countMinBuild(items: DataFrame, keyCol: String,
                    width: Int, depth: Int): DataFrame = {
    require(width >= 1 && depth >= 1, s"need width, depth >= 1: got $width, $depth")
    // a NULL key has no frequency meaning; hashing it would plant a null
    // bucket row that polluted every later merge of a persisted sketch
    items
      .filter(col(keyCol).isNotNull)
      .select(bucketed(keyCol, width, depth).as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Build the sketch from PRE-AGGREGATED (key, count) rows — bit-identical
    * to [[countMinBuild]] over the raw occurrences (sum of per-key counts
    * per bucket == count of occurrence rows per bucket), but the corpus
    * explode/shuffle happens once upstream: a caller that already holds the
    * exact per-key table (or any partial aggregate of it) derives the
    * sketch from vocabulary-sized input instead of re-scanning occurrences
    * (guide §2.3: aggregate before you shuffle). */
  def countMinBuildWeighted(counts: DataFrame, keyCol: String, freqCol: String,
                            width: Int, depth: Int): DataFrame = {
    require(width >= 1 && depth >= 1, s"need width, depth >= 1: got $width, $depth")
    counts
      .filter(col(keyCol).isNotNull)
      .select(col(freqCol).cast("long").as("_w"),
        bucketed(keyCol, width, depth).as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.bucket").as("bucket"))
      .agg(sum(col("_w")).as("cnt"))
  }

  /** Point-estimate candidate keys against a built sketch: min over the
    * key's depth buckets, absent buckets counting 0. Output:
    * (keyCol, est_freq). The sketch side broadcasts (bounded by
    * construction); candidates stream past it. */
  def countMinEstimate(cms: DataFrame, candidates: DataFrame, keyCol: String,
                       width: Int, depth: Int): DataFrame =
    candidates
      .filter(col(keyCol).isNotNull)
      .select(col(keyCol), bucketed(keyCol, width, depth).as("jb"))
      .select(col(keyCol), col("jb.j").as("j"), col("jb.bucket").as("bucket"))
      .join(broadcast(cms), Seq("j", "bucket"), "left_outer")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_freq"))
}
