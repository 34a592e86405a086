package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Entity readers for Monarch-shaped JSON — the engine-side replacement for
  * the reference's GraphQL client layer. Files carry the API's actual
  * response shapes (FIXTURES.md): the transaction list arrives wrapped in a
  * connection (`{"allTransactions": {"totalCount": N, "results": [...]}}`,
  * `.mm/tx_first_page.json` shape), accounts as `{"accounts": [...]}`
  * (monarchmoney.py:130-212).
  *
  * The recursive `_unwrap_transactions` duck-walk (F15, v3:243-288)
  * collapses to one schema-directed `select(explode(...))`: with a declared
  * wrapper schema there is nothing to probe for.
  *
  * Scale: `spark.read.schema(...).json(path)` with an explicit schema skips
  * Spark's whole-file schema-inference pass (which would read everything
  * twice) and prunes unrequested fields at the parser.
  */
object MonarchSource {

  /** Wrapper for the transactions connection response (lib:1444-1446). */
  val transactionsResponseSchema: StructType = StructType(Seq(
    StructField("allTransactions", StructType(Seq(
      StructField("totalCount", LongType),
      StructField("results", ArrayType(Schemas.transactionSchema)),
      StructField("__typename", StringType))))))

  val accountsResponseSchema: StructType = StructType(Seq(
    StructField("accounts", ArrayType(Schemas.accountSchema))))

  /** S2 source leg — read a transactions connection response; one output row
    * per transaction (F15 unwrap), `total_count` carried alongside (A8). */
  def transactions(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(transactionsResponseSchema)
      .option("multiLine", true).json(path)
      .select(
        col("allTransactions.totalCount").as("total_count"),
        explode(col("allTransactions.results")).as("t"))
      .select(col("total_count"), col("t.*"))

  /** A8 reconciliation: the response's DECLARED totalCount, readable even
    * when `results` is empty or truncated — the exploded frame from
    * [[transactions]] carries zero rows in that case, so the declared count
    * is the only signal that data went missing. Compare against the
    * exploded row count before trusting a batch. */
  def declaredTotalCount(spark: SparkSession, path: String): Option[Long] =
    spark.read.schema(transactionsResponseSchema)
      .option("multiLine", true).json(path)
      .select(col("allTransactions.totalCount").cast("long"))
      .collect().headOption.flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))

  /** S1 — read an accounts response; one row per account. */
  def accounts(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(accountsResponseSchema)
      .option("multiLine", true).json(path)
      .select(explode(col("accounts")).as("a"))
      .select(col("a.*"))

  /** F11 — date-key heuristic (v3:189-201): probe the candidate names in
    * order, then fall back to the first string column whose sampled values
    * look like ISO dates (4 leading digits + '-'). Driver-side schema
    * resolution: the sample is bounded (`sampleSize` rows), never a full
    * scan. */
  val dateKeyCandidates: Seq[String] = Seq(
    "date", "transDate", "transactionDate", "postedDate", "datePosted",
    "madeOn", "createdAt", "activityDate")

  def findDateKey(df: DataFrame, sampleSize: Int = 100): Option[String] = {
    import org.apache.spark.sql.types.{DateType, TimestampType}
    // a candidate NAME only wins if its TYPE can carry a date — an
    // epoch-millis LongType "createdAt" must not shadow a real date column
    def dateish(c: String) = df.schema(c).dataType match {
      case DateType | TimestampType | StringType => true
      case _ => false
    }
    val cols = df.columns.toSet
    dateKeyCandidates.find(c => cols.contains(c) && dateish(c)).orElse {
      val stringCols = df.schema.fields
        .filter(f => f.dataType == StringType).map(_.name).toIndexedSeq
      if (stringCols.isEmpty) None
      else {
        val sample = df.select(stringCols.map(col): _*).limit(sampleSize).collect()
        stringCols.find { c =>
          val idx = stringCols.indexOf(c)
          val values = sample.flatMap(r => Option(r.getString(idx)))
          values.nonEmpty && values.forall(v =>
            v.length >= 5 && v.take(4).forall(_.isDigit) && v.contains("-"))
        }
      }
    }
  }
}
