package graft

import org.apache.spark.sql.functions._

import graft.operators.TableFormat
import graft.sources.Tables

/** A/B micro-bench for the SQL catalog's vectorized scan: the SAME
  * aggregate over the SAME files, once through `graft.` (TableCatalog →
  * ColumnarBatch path) and once through `spark.read.parquet` — the
  * overhead ratio is the grade ("a wide scan through the catalog must
  * not lose Spark's vectorized reader").
  *
  * Usage: `runMain graft.CatalogBench <sfDir> [reps]` — prints one
  * MEDIAN-of-reps line per path plus the ratio. */
object CatalogBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = GraftSession.get()
    val wh = s"${sys.props("java.io.tmpdir")}/graft_scratch/catbench_wh"
    val tbl = "vscan_ab"
    val root = s"$wh/$tbl"
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.v2.GraftTableCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val f = s"$root/b0"
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"),
        floor(col("l_extendedprice") * 100).cast("long").as("cents"),
        col("l_returnflag"), to_date(col("l_shipdate")).as("ship_d"))
      .repartition(8, col("l_orderkey"))
      .write.mode("overwrite").parquet(f)
    val files = TableFormat.listParquet(spark, f)
    TableFormat.commitFiles(spark, root, "l_orderkey", files,
      numBits = 1 << 16, numHashes = 5, zoneCols = Seq("ship_d"))

    val agg = "count(*) AS n, sum(cents) AS sc, sum(l_quantity) AS q, " +
      "count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS r, " +
      "min(ship_d) AS d0, max(ship_d) AS d1"
    def time(sql: String): (Double, String) = {
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val r = spark.sql(sql).collect()(0)
        ((System.nanoTime() - t0) / 1e9, r.toString())
      }
      (runs.map(_._1).sorted.apply(reps / 2), runs.head._2)
    }
    spark.read.parquet(files: _*).createOrReplaceTempView("native_files")
    // warm both paths once before timing
    spark.sql(s"SELECT $agg FROM graft.`$tbl`").collect()
    spark.sql(s"SELECT $agg FROM native_files").collect()
    val (tCat, rCat) = time(s"SELECT $agg FROM graft.`$tbl`")
    val (tNat, rNat) = time(s"SELECT $agg FROM native_files")
    require(rCat == rNat, s"result mismatch: $rCat vs $rNat")
    println(f"CATBENCH catalog=${tCat}%.3fs native=${tNat}%.3fs " +
      f"ratio=${tCat / tNat}%.2f rows=$rCat")

    // r13: MoR-PENDING leg — ~1% of keys masked through a manifest; the
    // masked VECTORIZED path (row-id-remapped batches + scan-appended
    // key column) must stay in the same band as the clean columnar
    // scan, not fall off the old row-reader cliff
    TableFormat.deleteKeysMoR(spark, root, root,
      spark.read.parquet(files: _*).select(col("l_orderkey"))
        .filter(pmod(col("l_orderkey"), lit(97)) === 0).distinct())
    val morPlan = spark.sql(s"SELECT $agg FROM graft.`$tbl`")
      .queryExecution.executedPlan.toString
    require(morPlan.contains("Columnar: true"),
      "MoR-pending scan no longer columnar")
    spark.sql(s"SELECT $agg FROM graft.`$tbl`").collect() // warm
    val (tMor, rMor) = time(s"SELECT $agg FROM graft.`$tbl`")
    println(f"CATBENCH_MOR mor=${tMor}%.3fs clean=${tCat}%.3fs " +
      f"ratio=${tMor / tCat}%.2f rows=$rMor")
  }
}
