package graft.operators

import org.apache.spark.sql.DataFrame

/** Partition-count hygiene for CPU-heavy row-local stages.
  *
  * A parquet scan parallelizes by row group; a small table written as one
  * row group becomes ONE task, pinning every downstream kernel (minhash,
  * parse_money, simhash) to a single core no matter how many executors
  * exist. At 100 TB the scan yields thousands of partitions and this helper
  * is a no-op — it only ever RAISES the partition count, so it never
  * introduces a harmful shuffle at scale (and the shuffle it does add moves
  * exactly the small input that caused the problem).
  */
object Parallelism {

  /** Round-robin to at least `n` partitions iff the plan currently yields
    * fewer. */
  def ensureMinPartitions(df: DataFrame, n: Int): DataFrame =
    if (df.rdd.getNumPartitions >= n) df else df.repartition(n)

  /** [[ensureMinPartitions]] at the session's default parallelism. */
  def ensureDefaultParallelism(df: DataFrame): DataFrame =
    ensureMinPartitions(df, df.sparkSession.sparkContext.defaultParallelism)
}
