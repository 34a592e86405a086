package graft

import org.apache.spark.sql.functions._

import graft.Functions._

/** Every custom expression must be reachable from plain SQL and agree with
  * its Column-API form. */
class ExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val t = {
    Seq(
      ("$1,234.56", "the quick brown fox", Array(1.0, 0.0, 2.0), Array(0.5, 0.5, 1.0)))
      .toDF("money", "text", "va", "vb")
      .createOrReplaceTempView("ext_t")
    spark.table("ext_t")
  }

  test("all custom functions are callable from SQL") {
    t // force view creation
    val row = spark.sql(
      """SELECT
           parse_money(money) AS pm,
           minhash_signature(text, 5, 4) AS mh,
           shingle_hash_set(text, 5) AS shs,
           ngram_hash_set(text, 2) AS ngs,
           minhash_from_hashes(shingle_hash_set(text, 5), 4) AS mfh,
           simhash(text, 32) AS sh,
           jaccard_sorted(shingle_hash_set(text, 5), shingle_hash_set(text, 5)) AS js,
           dot_product(va, vb) AS dp,
           cosine_similarity(va, vb) AS cs,
           l2_norm(va) AS l2,
           lang_id(text) AS lid,
           nfc_clean(concat(text, chr(7))) AS nc
         FROM ext_t""").collect()(0)
    assert(row.getAs[Double]("pm") == 1234.56)
    assert(row.getAs[scala.collection.Seq[Long]]("mh").length == 4)
    assert(row.getAs[scala.collection.Seq[Long]]("mh").toSeq ==
      row.getAs[scala.collection.Seq[Long]]("mfh").toSeq)
    assert(row.getAs[Double]("js") == 1.0)
    assert(row.getAs[Double]("dp") == 2.5)
    assert(row.getAs[Double]("l2") == math.sqrt(5.0))
    assert(row.getAs[String]("lid") == "en")
    assert(!row.getAs[String]("nc").contains('\u0007'))
  }

  test("round-5 functions are callable from SQL: jaccard_ge, bloom_agg, bloom_contains") {
    t // force view creation
    val gate = spark.sql(
      """SELECT jaccard_ge(shingle_hash_set(text, 5), shingle_hash_set(text, 5), 0.5) AS g
         FROM ext_t""").collect()(0)
    assert(gate.getAs[Boolean]("g"))
    spark.sql("SELECT id FROM range(100)").createOrReplaceTempView("ext_keys")
    val hits = spark.sql(
      """WITH b AS (SELECT bloom_agg(id, 1024, 4) AS bits FROM ext_keys)
         SELECT count(*) AS n FROM ext_keys, b
         WHERE bloom_contains(bits, id, 1024, 4)""").collect()(0)
    assert(hits.getAs[Long]("n") == 100L) // no false negatives via SQL either
  }

  test("SQL results match the Column API") {
    val sql = spark.sql(
      "SELECT simhash(text, 32) AS a, cosine_similarity(va, vb) AS b FROM ext_t").collect()(0)
    val api = t.select(
      simhash_fused(col("text"), 32).as("a"),
      cosine(col("va"), col("vb")).as("b")).collect()(0)
    assert(sql.getLong(0) == api.getLong(0))
    assert(sql.getDouble(1) == api.getDouble(1))
  }

  test("non-constant size argument is rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_signature(text, CAST(length(text) AS INT), 4) FROM ext_t").collect()
    }
    assert(e.getMessage.contains("constant"))
  }

  test("GraftExtensions exposes the same function list") {
    val names = GraftExtensions.functions.map(_._1)
    assert(names.contains("parse_money") && names.contains("lang_id"))
    assert(names.distinct.size == names.size)
    names.foreach { n =>
      assert(spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(n)), n)
    }
  }
}
