package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synthetic scale-up generator for scaling probes (`runMain
  * graft.ScaleTestData <srcDir> <dstDir> <replicas>`): replicates the fact
  * tables `replicas`x with key offsets that preserve FK structure — the
  * same offset applied to both sides of every key relationship, dims
  * (region/nation) left at catalog size, exactly how TPC-H itself scales.
  *
  * Content decorrelation matters for an honest probe: 10 byte-identical
  * copies of every document would make near-dup candidate counts grow
  * quadratically BY CONSTRUCTION (every doc gains 9 exact twins), which
  * measures the synthetic data, not the plan. So each document replica
  * gets a replica-indexed salt inserted after vowels (most character
  * shingles differ across replicas) and each embedding replica a
  * per-dimension direction nudge (cosine geometry decorrelates; a pure
  * scalar multiple would leave cosines identical).
  */
object ScaleTestData {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ScaleTestData <srcDir> <dstDir> <replicas>")
    val (src, dst, reps) = (args(0), args(1), args(2).toInt)
    val spark = GraftSession.get()
    // far above any key at the source scale, so replica key ranges never collide
    val Off = 100000000L

    def rep(table: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      (0 until reps).map(i => f(base, i)).reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dst/$table.parquet")
    }
    def off(c: String, i: Int) = col(c) + lit(i * Off)

    rep("region") { (df, i) => if (i == 0) df else df.limit(0) }
    rep("nation") { (df, i) => if (i == 0) df else df.limit(0) }
    rep("customer") { (df, i) => df.withColumn("c_custkey", off("c_custkey", i)) }
    rep("supplier") { (df, i) => df.withColumn("s_suppkey", off("s_suppkey", i)) }
    rep("part") { (df, i) => df.withColumn("p_partkey", off("p_partkey", i)) }
    rep("orders") { (df, i) =>
      df.withColumn("o_orderkey", off("o_orderkey", i))
        .withColumn("o_custkey", off("o_custkey", i)) }
    rep("lineitem") { (df, i) =>
      df.withColumn("l_orderkey", off("l_orderkey", i))
        .withColumn("l_partkey", off("l_partkey", i))
        .withColumn("l_suppkey", off("l_suppkey", i)) }
    rep("events") { (df, i) =>
      df.withColumn("event_id", off("event_id", i))
        .withColumn("user_id", off("user_id", i)) }
    rep("documents") { (df, i) =>
      val t = if (i == 0) col("text")
        else regexp_replace(col("text"), "([aeiou])", "$1x" + i.toString)
      df.withColumn("doc_id", off("doc_id", i))
        .withColumn("text", t)
        .withColumn("n_chars", length(t)) }
    rep("embeddings") { (df, i) =>
      val v = if (i == 0) col("embedding")
        else transform(col("embedding"), (x, j) =>
          (x + pmod(j * lit(i), lit(7)).cast("float") * lit(0.05f)).cast("float"))
      df.withColumn("vec_id", off("vec_id", i))
        .withColumn("embedding", v) }
    spark.stop()
  }
}
