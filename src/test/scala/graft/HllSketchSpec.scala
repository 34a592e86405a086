package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.Functions._
import graft.functions.HllUtil

/** HLL distinct sketch: md5-deterministic registers, partition-invariant,
  * lossless two-level merge, oracle-replayable estimate arithmetic. */
class HllSketchSpec extends SparkTestBase {
  import spark.implicits._

  private def estOf(row: Row): (Double, Long, Int) = {
    val h = row.getStruct(0)
    (h.getDouble(0), h.getLong(1), h.getInt(2))
  }

  test("empty input yields the empty sketch (all registers zero)") {
    val (est, s, zeros) = estOf(
      Seq.empty[String].toDF("s").agg(hll_distinct(col("s"))).collect()(0))
    assert(zeros == 256)
    assert(s == 256L * HllUtil.Scale)
    assert(est == HllUtil.estimate(s))
  }

  test("estimate is within 25% of truth for 10k distinct values (m=256)") {
    val df = spark.range(10000).select(concat(lit("id_"), col("id")).as("s"))
    val (est, _, _) = estOf(df.agg(hll_distinct(col("s"))).collect()(0))
    assert(math.abs(est - 10000.0) / 10000.0 < 0.25, s"est=$est")
  }

  test("partition-invariant and duplicate-insensitive") {
    val base = spark.range(3000).select(concat(lit("x"), col("id")).as("s"))
    val r1 = base.coalesce(1).agg(hll_distinct(col("s"))).collect()(0)
    val r2 = base.union(base).repartition(13).agg(hll_distinct(col("s"))).collect()(0)
    assert(estOf(r1) == estOf(r2))
  }

  test("two-level rollup equals the direct sketch (merge is lossless)") {
    val df = spark.range(5000).select(
      (col("id") % 7).as("g"), concat(lit("v"), col("id")).as("s"))
    val direct = estOf(df.agg(hll_distinct(col("s"))).collect()(0))
    val rolled = estOf(df.groupBy(col("g"))
      .agg(hll_registers(col("s")).as("regs"))
      .agg(hll_merge_est(col("regs"))).collect()(0))
    assert(direct == rolled)
  }

  test("registers match a driver-side md5 replay (the oracle's arithmetic)") {
    val values = (0 until 4000).map(i => s"doc $i payload")
    val (est, s, zeros) = estOf(
      values.toDF("s").agg(hll_distinct(col("s"))).collect()(0))
    // replay: bucket = md5 byte 0, rho = 49 - bitlength(next 48 bits)
    val regs = new Array[Int](256)
    for (v <- values) {
      val (b, rho) = HllUtil.bucketRho(v.getBytes("UTF-8"))
      if (rho > regs(b)) regs(b) = rho
    }
    val expectedS = regs.map(r => 1L << (49 - r)).sum
    assert(s == expectedS)
    assert(zeros == regs.count(_ == 0))
    assert(est == 0.7182725932495458 * 65536.0 * 562949953421312.0 / expectedS.toDouble)
  }

  test("callable from SQL; nulls are skipped") {
    Seq(Some("a"), Some("b"), None, Some("a")).toDF("s")
      .createOrReplaceTempView("hll_t")
    val h = spark.sql("SELECT hll_distinct(s) AS h FROM hll_t")
      .select(col("h.n_zero")).collect()(0).getInt(0)
    assert(h == 254) // "a" and "b" land in distinct buckets
  }
}
