package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Functions._

/** Training-sequence packing — the concatenate-and-chop layout LLM training
  * pipelines use: documents are laid end to end in a deterministic order and
  * the token stream is cut into fixed-length sequences, so no context-window
  * slot is wasted on padding. Each document's placement is fully determined
  * by the cumulative token count of its predecessors.
  *
  * Scale design: packing is computed INSIDE pack groups (a language, a
  * split, a shard key) — one window per group, shuffled once on the group
  * key, never a single global ordering (a global window would serialize
  * 100 TB through one task; per-group windows parallelize across the
  * cluster, and sequence ids are only meaningful within a shard anyway).
  * All arithmetic is integer (token counts, floor division) — bit-identical
  * on any engine or layout.
  */
object Packing {

  /** Assign every document its position in the packed token stream of its
    * group: `tok_start` (tokens before it), `seq_id` (the sequence its first
    * token lands in), `seq_offset` (position within that sequence), and
    * `n_seqs` (how many sequences it spans — long docs cross boundaries).
    * Order within a group is by `idCol` (deterministic re-runs).
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    seqTokens: Int, groupCols: Seq[String]): DataFrame = {
    require(seqTokens > 0, s"seqTokens must be positive, got $seqTokens")
    require(groupCols.nonEmpty,
      "packSequences needs at least one pack-group column — a global window " +
        "would serialize the corpus through one task")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      // NULL text counts as zero tokens: size(NULL) is -1 under non-ANSI
      // Spark, which would silently shift every later doc's layout in the
      // group by -1
      .select((groupCols.map(col) :+ col(idCol) :+
        when(col(textCol).isNull, lit(0L))
          .otherwise(size(tokens(col(textCol))).cast("long")).as("n_tokens")): _*)
      .withColumn("tok_start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      // integer DIV, not floor(a/b): double division of large longs could
      // round at the boundary; DIV is exact on any engine
      .withColumn("seq_id", expr(s"tok_start DIV $seqTokens"))
      .withColumn("seq_offset", col("tok_start") % seqTokens)
      .withColumn("n_seqs",
        expr(s"(tok_start + n_tokens - 1) DIV $seqTokens")
          - col("seq_id") + lit(1L))
  }
}
