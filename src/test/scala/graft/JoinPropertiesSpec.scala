package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

import graft.operators.{AsOfJoin, RangeJoin, SkewJoin}

/** Property tests: the composed join operators must equal their naive
  * (quadratic / unsalted) formulations on arbitrary generated corpora.
  * Spark jobs per case are expensive, so minTests stays small — the value
  * is in the generator's shapes (dup timestamps, empty sides, singleton
  * keys), not the count. */
class JoinPropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private val baseUs = Timestamp.valueOf("2026-01-01 00:00:00").getTime

  private val genRows: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 40)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0L, 4L)
      // coarse timestamps force duplicate-ts collisions
      m <- Gen.choose(0L, 30L)
    } yield (k, m))
  } yield rows

  test("asOf equals the naive argmax for arbitrary corpora (dup ts, empty sides)") {
    PropHelper.check(Prop.forAll(genRows, genRows) { (lRows, rRows) =>
      val probes = lRows.zipWithIndex
        .map { case ((k, m), i) => (k, new Timestamp(baseUs + m * 60000), i.toLong) }
        .toDF("k", "ts", "pid")
      val snaps = rRows.zipWithIndex
        .map { case ((k, m), j) => (k, new Timestamp(baseUs + m * 60000), j.toLong) }
        .toDF("k", "ts", "sid")
      val got = AsOfJoin.asOf(probes, snaps, "k", "ts", "ts", Seq("sid"), rightTie = "sid")
        .select("pid", "asof_sid").as[(Long, Option[Long])].collect().toMap
      val naive = lRows.zipWithIndex.map { case ((k, m), i) =>
        val cands = rRows.zipWithIndex.collect {
          case ((rk, rm), j) if rk == k && rm <= m => (rm, j.toLong)
        }
        i.toLong -> (if (cands.isEmpty) None else Some(cands.max._2))
      }.toMap
      got == naive
    }, minTests = 12)
  }

  test("binned range join equals the nested loop for arbitrary intervals") {
    PropHelper.check(Prop.forAll(genRows, genRows, Gen.oneOf(60000000L, 300000000L)) {
      (pRows, iRows, binUs) =>
        val points = pRows.zipWithIndex
          .map { case ((_, m), i) => (i.toLong, new Timestamp(baseUs + m * 60000)) }
          .toDF("pid", "ts")
        val intervals = iRows.zipWithIndex.map { case ((k, m), j) =>
          (j.toLong, new Timestamp(baseUs + m * 60000),
            new Timestamp(baseUs + (m + 1 + k) * 60000)) // widths 1-5 min
        }.toDF("iid", "start_ts", "end_ts")
        val got = RangeJoin.pointInInterval(points, "ts", intervals,
            "start_ts", "end_ts", binUs)
          .select("pid", "iid").as[(Long, Long)].collect().toSet
        val naive = (for {
          ((_, pm), i) <- pRows.zipWithIndex
          ((ik, im), j) <- iRows.zipWithIndex
          if pm >= im && pm < im + 1 + ik
        } yield (i.toLong, j.toLong)).toSet
        got == naive
    }, minTests = 12)
  }

  test("salted joins equal the plain join for arbitrary corpora and salt") {
    PropHelper.check(Prop.forAll(genRows, Gen.choose(1, 6)) { (rows, salt) =>
      val fact = rows.zipWithIndex
        .map { case ((k, m), i) => (s"k$k", i.toLong, m) }.toDF("key", "rid", "v")
      val dim = (0L to 4L).map(k => (s"k$k", s"n$k")).toDF("key", "name")
      val plain = fact.join(dim, Seq("key"))
        .select("rid", "name").as[(Long, String)].collect().toSet
      val salted = SkewJoin.saltedJoin(fact, dim, "key", "rid", salt)
        .select("rid", "name").as[(Long, String)].collect().toSet
      salted == plain
    }, minTests = 12)
  }
}
