package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance (IVM) for distributive aggregates: keep a
  * materialized (group -> count, sums) aggregate current by applying a
  * [[Upsert.snapshotDiff]] changelog instead of rescanning the base table.
  * At 100 TB the base fact never moves; the nightly delta is
  * changelog-sized, so the refresh costs O(|changes|), not O(|table|) —
  * the standard warehouse pattern for summary tables over slow-changing
  * facts.
  *
  * Semantics: every changelog row contributes signed deltas —
  * 'I' adds (+1, +value_new) to its NEW group, 'D' adds (-1, -value_old) to
  * its OLD group, 'U' contributes BOTH legs, which makes updates that move a
  * row between groups (a customer switching segments) and in-place value
  * changes the same uniform case. Groups whose maintained count reaches 0
  * are dropped — refresh(agg(old), diff(old, new)) is row-identical to
  * agg(new), which is exactly what the oracle checks.
  *
  * Exactness: counts are longs; sums are exact only over integer-typed
  * columns (long sums are order-invariant under any partitioning). Keep
  * monetary values in minor units / bucketed longs for maintained
  * aggregates — a double sum would drift from the recompute by fp
  * reassociation.
  *
  * Scale design: one changelog-sized shuffle (the delta aggregate,
  * map-side combined) + one join against the aggregate table — which is
  * group-cardinality-sized, not fact-sized. The join is full-outer (new
  * groups appear, dead groups must be dropped) and null-safe on the group
  * keys, so NULL group values maintain correctly.
  */
object IncrementalAgg {

  /** Apply `changelog` (the [[Upsert.snapshotDiff]] output carrying
    * `<c>_old`/`<c>_new` for every group and sum column) to `oldAgg`
    * (columns: groupCols, `cntAs`, sumCols). Returns the refreshed
    * aggregate with the same schema. */
  def refresh(oldAgg: DataFrame, changelog: DataFrame,
              groupCols: Seq[String], sumCols: Seq[String],
              cntAs: String = "cnt"): DataFrame = {
    require(groupCols.nonEmpty, "refresh: need at least one group column")
    val removeLeg = changelog.filter(col("op").isin("D", "U"))
      .select(groupCols.map(c => col(s"${c}_old").as(c)) ++
        (lit(-1L).as("_dcnt") +: sumCols.map(c => (-col(s"${c}_old")).as(s"_d$c"))): _*)
    val addLeg = changelog.filter(col("op").isin("I", "U"))
      .select(groupCols.map(c => col(s"${c}_new").as(c)) ++
        (lit(1L).as("_dcnt") +: sumCols.map(c => col(s"${c}_new").as(s"_d$c"))): _*)
    val deltaAggs = sum(col("_dcnt")).as("_dcnt") +:
      sumCols.map(c => sum(col(s"_d$c")).as(s"_d$c"))
    val delta = removeLeg.unionByName(addLeg)
      .groupBy(groupCols.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
      // join-side rename so the null-safe full-outer condition is unambiguous
      .select(groupCols.map(c => col(c).as(s"_g_$c")) ++
        (col("_dcnt") +: sumCols.map(c => col(s"_d$c"))): _*)
    val cond = groupCols.map(c => oldAgg(c) <=> delta(s"_g_$c")).reduce(_ && _)
    oldAgg.join(delta, cond, "full_outer")
      .select(groupCols.map(c => coalesce(oldAgg(c), delta(s"_g_$c")).as(c)) ++
        ((coalesce(col(cntAs), lit(0L)) + coalesce(col("_dcnt"), lit(0L))).as(cntAs) +:
          sumCols.map(c =>
            (coalesce(col(c), lit(0L)) + coalesce(col(s"_d$c"), lit(0L))).as(c))): _*)
      .filter(col(cntAs) > 0)
  }

  /** Incremental maintenance of a FK-JOIN view V = fact ⋈ dim, the other
    * half of materialized-view upkeep (refresh covers aggregates). The
    * dim must be unique on the join key and the view keyed by the fact
    * key, so each fact key owns at most one view row — the enrichment
    * shape (orders ⋈ customer, txn ⋈ account) every warehouse
    * materializes. Applying a fact changelog ([[Upsert.snapshotDiff]]):
    * every changed key's stale row leaves by anti-join, and the I/U new
    * images re-join ONLY the dim — the view never rebuilds and the fact
    * table is never re-read, so a refresh costs |changelog| ⋈ dim (dim
    * broadcast when bona fide) plus a key-hashed anti-join against the
    * stored view. Inner-join semantics: a fresh row whose FK misses the
    * dim drops out, exactly as it would in the full recompute. */
  def refreshJoin(oldView: DataFrame, changelog: DataFrame, dim: DataFrame,
                  factKeys: Seq[String], factCols: Seq[String],
                  joinKey: String): DataFrame = {
    require(factKeys.nonEmpty, "refreshJoin: need at least one fact key column")
    require(factCols.contains(joinKey),
      s"refreshJoin: joinKey $joinKey must be a tracked fact column")
    val stale = changelog.select(factKeys.map(col): _*)
    val fresh = changelog.filter(col("op").isin("I", "U"))
      .select(factKeys.map(col) ++ factCols.map(c => col(s"${c}_new").as(c)): _*)
    oldView.join(stale, factKeys, "left_anti")
      .unionByName(fresh.join(dim, joinKey))
  }
}
