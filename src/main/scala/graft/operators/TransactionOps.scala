package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Filtered/ordered/paginated scan + global summary — the reference's
  * transaction query surface re-expressed declaratively (SURVEY S2/P2/O1/O4,
  * A1/A8; monarchmoney.py:1403-1554, 1367-1401).
  *
  * All predicates are plain `Column` conjunctions so Catalyst pushes them
  * into the source scan (PushedFilters on parquet) — at 100 TB the filter
  * runs in the reader, not after it.
  */
object TransactionOps {

  /** P2 — conjunctive optional-predicate filter (absent => no filter).
    * Mirrors TransactionFilterInput: date BETWEEN (both-or-neither enforced),
    * id-list IN predicates, boolean equality, substring search. */
  final case class Filter(
      dateCol: String = "date",
      startDate: Option[String] = None,
      endDate: Option[String] = None,
      inSets: Map[String, Seq[Any]] = Map.empty,
      boolEq: Map[String, Boolean] = Map.empty,
      minAmount: Option[Double] = None,
      amountCol: String = "amount",
      search: Option[String] = None,
      searchCols: Seq[String] = Nil) {
    require(startDate.isEmpty == endDate.isEmpty,
      "You must specify both a start and end date (lib:1547-1550)")

    def predicate: Column = {
      val preds = Seq.newBuilder[Column]
      for (s <- startDate; e <- endDate)
        preds += col(dateCol).between(lit(s).cast("date"), lit(e).cast("date"))
      // [] means "no filter" in TransactionFilterInput (the reference always
      // sends empty id lists, monarchmoney.py:1515-1520) — NOT "match none"
      inSets.foreach { case (c, vs) => if (vs.nonEmpty) preds += col(c).isin(vs: _*) }
      boolEq.foreach { case (c, v) => preds += (col(c) === lit(v)) }
      minAmount.foreach(m => preds += (col(amountCol) >= lit(m)))
      // per-column OR: a multi-word query must match WITHIN one field, not
      // across a column boundary of the concatenation
      for (q <- search if searchCols.nonEmpty)
        preds += searchCols.map(c => lower(col(c)).contains(q.toLowerCase)).reduce(_ || _)
      preds.result().reduceOption(_ && _).getOrElse(lit(true))
    }

    def apply(df: DataFrame): DataFrame = df.filter(predicate)
  }

  /** O1+O4 — ordered page. `orderBy` must include a unique tiebreak for
    * deterministic pages. Spark >= 3.4 has native `offset`, which planners
    * turn into a global-limit + offset rather than a full sort of everything
    * (combined with limit it is CollectLimit, driver-light). */
  def page(df: DataFrame, orderBy: Seq[Column], limit: Int, offset: Int = 0): DataFrame = {
    val sorted = df.orderBy(orderBy: _*)
    (if (offset > 0) sorted.offset(offset) else sorted).limit(limit)
  }

  /** A8 result handle: the counted page plus ownership of its shared cache.
    * Call [[release]] once the page's action has run (or when the "session"
    * holding it for warm next-page requests ends) — the operator itself
    * holds NO global state, so concurrent pipelines in one JVM cannot evict
    * each other's plan. */
  final case class CountedPage(df: DataFrame, private val shared: DataFrame) {
    def release(): Unit = { shared.unpersist(blocking = false); () }
  }

  /** A8 — totalCount alongside a page, sharing ONE materialization of the
    * filtered plan (the reference's single-round-trip property,
    * monarchmoney.py:1444-1446). The filtered set is persisted
    * (memory-with-spill) so count and page read the scan once instead of
    * twice; the count side is a single-row aggregate broadcast back onto the
    * page — no window-over-empty-partition (which would single-partition the
    * data). The caller owns the cache lifetime through the returned handle. */
  def countedPage(filtered: DataFrame, orderBy: Seq[Column], limit: Int): CountedPage = {
    val shared = filtered.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = shared.agg(count(lit(1)).as("total_count"))
    CountedPage(page(shared, orderBy, limit).crossJoin(broadcast(total)), shared)
  }

  /** [[countedPage]] for one-shot use: the cache lives until the session
    * drops it (fine for a single query run; a long-lived paging service
    * should hold the handle and release explicitly). */
  def withTotalCount(filtered: DataFrame, orderBy: Seq[Column], limit: Int): DataFrame =
    countedPage(filtered, orderBy, limit).df

  /** A1 — global transactions summary: avg/count/max/maxExpense/sum/
    * sumIncome/sumExpense/first/last (monarchmoney.py:1367-1401; fixture
    * tests/get_transactions_summary.json). One map-side-combinable pass. */
  def summary(df: DataFrame, amount: Column, date: Column): DataFrame =
    df.agg(
      avg(amount).as("avg"),
      count(lit(1)).as("count"),
      max(amount).as("max"),
      min(amount).as("maxExpense"),
      sum(amount).as("sum"),
      sum(when(amount > 0, amount).otherwise(0.0)).as("sumIncome"),
      sum(when(amount < 0, amount).otherwise(0.0)).as("sumExpense"),
      min(date).as("first"),
      max(date).as("last"))

  /** O5 — last-k scan (the reference's `results(limit: 20)` account history). */
  def topK(df: DataFrame, orderBy: Seq[Column], k: Int): DataFrame =
    df.orderBy(orderBy: _*).limit(k)
}
