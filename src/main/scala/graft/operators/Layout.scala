package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for scan pruning — the write-side half of the
  * 100 TB story. Parquet readers skip files (and row groups) whose min/max
  * column statistics exclude a filter; that only works when the writer
  * CLUSTERED the data so each file covers a narrow value range. A sort on
  * one column gives perfect pruning on it and none on any other; a Z-order
  * (Morton) key interleaves the bits of several columns so each output file
  * covers a small hyper-rectangle — range filters on ANY of the interleaved
  * dimensions prune.
  */
object Layout {

  /** Morton/Z-value of two non-negative ints confined to `bits` bits each:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. Pure bit
    * arithmetic on longs — constant-folded into whole-stage codegen, and
    * identically expressible in any engine (the oracle replays it). Inputs
    * must already be bucketed into [0, 2^bits) — pass e.g.
    * `pmod(hash-ish, 2^bits)` or a quantile bucket. */
  def zvalue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"zvalue: bits must be in [1,31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** N-column Morton/Z-value: bit i of column j lands at position i*n + j
    * (round-robin interleave), so every one of the n dimensions prunes.
    * Generalizes [[zvalue]] (zvalueN(Seq(a, b), bits) == zvalue(a, b,
    * bits)); n*bits must fit a long. Practical n is 2-4 — each added
    * dimension halves the per-file selectivity of every other, the
    * standard Z-order trade. */
  def zvalueN(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, s"zvalueN: need >= 2 columns, got ${cols.size}")
    require(bits >= 1 && bits * cols.size <= 63,
      s"zvalueN: bits*n must fit a long, got $bits*${cols.size}")
    val n = cols.size
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      cols.zipWithIndex.foldLeft(acc) { case (a, (c, j)) =>
        a.bitwiseOR(shiftleft(
          shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j))
      }
    }
  }

  /** Write `df` range-partitioned and sorted by the Z-value of two bucketed
    * dimensions: each output file covers a contiguous Z-range = a small
    * hyper-rectangle in (a, b) space, so parquet min/max stats prune scans
    * filtered on EITHER dimension. `numFiles` targets the output file count
    * (range partitioning samples the key, so files are size-balanced even
    * under skew). */
  def writeZOrdered(df: DataFrame, a: Column, b: Column, path: String,
                    numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("_z", zvalue(a, b, bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  /** Small-file compaction planner — the table-maintenance half of the
    * layout story: a 100 TB table accumulates small files from streaming
    * appends and partition overwrites, and scan throughput collapses long
    * before capacity does. Given a FILE LISTING (metadata-scale: one row
    * per file, never data-scale), assign each file to a compaction group
    * targeting `targetBytes` per group: group = floor(running-bytes-before
    * / target) within the file's table partition, files taken in
    * deterministic `fileCol` order. The prefix-sum form is one window over
    * the LISTING — expressible identically in any engine, near-optimal for
    * the many-small-files case compaction exists to fix — and the window
    * partitions on the table-partition columns, so planning parallelizes
    * across partitions (no global single-partition sort). */
  def compactionPlan(listing: DataFrame, partCols: Seq[String], fileCol: String,
                     bytesCol: String, targetBytes: Long): DataFrame = {
    require(partCols.nonEmpty, "compactionPlan: need at least one partition column")
    require(targetBytes > 0, s"compactionPlan: targetBytes must be positive")
    // ROWS frame, not the default RANGE: under RANGE, duplicate fileCol
    // values are peers and each peer's running sum includes the other's
    // bytes, overstating _before for the first peer. bytesCol is the
    // tiebreak; output is deterministic when (fileCol, bytesCol) pairs
    // are distinct per partition — true of any real listing, where
    // fileCol is a unique file name. Rows fully tied on both columns get
    // an unspecified relative order (their group ids may swap run to
    // run, though the multiset of (file, bytes, group) sizes cannot).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partCols.map(col): _*)
      .orderBy(col(fileCol), col(bytesCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    listing
      .withColumn("_before", coalesce(
        sum(col(bytesCol)).over(w) - col(bytesCol), lit(0L)))
      .withColumn("compaction_group",
        floor(col("_before") / targetBytes).cast("long"))
      .drop("_before")
  }

  /** Z-order / clustering maintenance planner — the second half of the
    * table-maintenance story next to [[compactionPlan]]: as appends land,
    * per-file key ranges start overlapping and range pruning decays, long
    * before size is a problem. Given a FILE LISTING with per-file
    * inclusive [zmin, zmax] key ranges (metadata-scale: one row per
    * file), compute each file's clustering DEPTH — how many files' ranges
    * contain its range start — and flag depth > maxDepth for rewrite (a
    * perfectly clustered partition has depth 1 everywhere; a point
    * predicate must open ~depth files).
    *
    * The computation is a boundary sweep, not an interval self-join:
    * +1 events at zmin, -1 events at zmax+1 (inclusive intervals), and
    * ONE window per table partition whose RANGE frame sums deltas at
    * positions <= the file's start. RANGE (value peers included) is
    * load-bearing here — files starting at the same key must see each
    * other — exactly the frame semantics [[compactionPlan]] had to avoid.
    * Planning parallelizes across partitions; no global sort, no
    * quadratic pair join. */
  def reclusterPlan(listing: DataFrame, partCols: Seq[String], fileCol: String,
                    zminCol: String, zmaxCol: String, maxDepth: Int): DataFrame = {
    require(partCols.nonEmpty, "reclusterPlan: need at least one partition column")
    require(maxDepth >= 1, s"reclusterPlan: maxDepth must be >= 1")
    val base = listing.select((partCols.map(col) :+ col(fileCol).as("_file") :+
      col(zminCol).cast("long").as("_zmin") :+
      col(zmaxCol).cast("long").as("_zmax")): _*)
      // a null or inverted range would emit its -1 event before its +1 (or
      // a null _pos sorting first), silently corrupting every OTHER file's
      // depth in the partition. Such files have no usable range stats —
      // exclude them here and route them to rewrite upstream (a file
      // without stats needs rewriting regardless of overlap).
      .filter(col("_zmin").isNotNull && col("_zmax").isNotNull &&
        col("_zmin") <= col("_zmax"))
    val starts = base.withColumn("_pos", col("_zmin")).withColumn("_delta", lit(1L))
    val ends = base.withColumn("_pos", col("_zmax") + 1L).withColumn("_delta", lit(-1L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partCols.map(col): _*).orderBy(col("_pos"))
      .rangeBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    starts.unionByName(ends)
      .withColumn("_depth", sum(col("_delta")).over(w))
      .filter(col("_delta") === 1L)
      .select((partCols.map(col) :+ col("_file").as(fileCol) :+
        col("_zmin").as(zminCol) :+ col("_zmax").as(zmaxCol) :+
        col("_depth").as("depth") :+
        (col("_depth") > maxDepth).as("needs_rewrite")): _*)
  }
}
