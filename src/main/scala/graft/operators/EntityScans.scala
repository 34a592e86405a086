package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's wider read-API surface (SURVEY §2.1): explode-shaped
  * entity scans, point lookups, and forecast scans. All row-local or
  * single-window operators — the explodes unnest bounded per-entity arrays,
  * never data-scale fan-outs.
  */
object EntityScans {

  /** S4 — GraphQL connection unwrap: `edges[].node` explode
    * (aggregateHoldings, monarchmoney.py:733-771). One row per node with the
    * parent key carried along. Handles both the true connection shape
    * (edge struct wrapping a `node` struct — FIXTURES.md holdings) and
    * already-flat edge structs. */
  def explodeEdges(portfolio: DataFrame, idCol: String, edgesCol: String): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, StructType}
    val hasNodeWrapper = portfolio.schema(edgesCol).dataType match {
      case ArrayType(s: StructType, _) => s.fieldNames.contains("node")
      case other => throw new IllegalArgumentException(
        s"explodeEdges: $edgesCol must be array<struct>, got ${other.catalogString}")
    }
    val exploded = portfolio.select(col(idCol), explode(col(edgesCol)).as("_edge"))
    if (hasNodeWrapper) exploded.select(col(idCol) +: Seq(col("_edge.node.*")): _*)
    else exploded.select(col(idCol) +: Seq(col("_edge.*")): _*)
  }

  /** S6 — recentBalances explode (monarchmoney.py:259-268): a per-account
    * daily balance array becomes (account, date, balance) rows; the date is
    * reconstructed from the array position. */
  def explodeSeries(df: DataFrame, idCol: String, seriesCol: String,
                    startDate: String): DataFrame =
    df.select(col(idCol), posexplode(col(seriesCol)))
      .select(
        col(idCol),
        date_add(lit(startDate).cast("date"), col("pos")).as("date"),
        col("col").as("balance"))

  /** S5 — client-side snapshot enrichment (monarchmoney.py:1018-1020): stamp
    * constant account attributes onto every series row (one analyzer pass —
    * not withColumn-per-attribute). */
  def enrich(df: DataFrame, attrs: (String, Column)*): DataFrame =
    df.withColumns(attrs.toMap)

  /** S13+S14 — point lookup by id plus child split rows
    * (monarchmoney.py:1979-2127, 2129-2177): parent filter (partition-prunable
    * at scale) joined to its children, with the split sum carried for the
    * reference's splits-sum-to-parent reconciliation (lib:2190-2192). */
  def pointLookupWithChildren(parent: DataFrame, children: DataFrame,
                              parentKey: String, childKey: String,
                              id: Any, childAmount: Column): DataFrame = {
    val p = parent.filter(col(parentKey) === lit(id))
    val c = children.filter(col(childKey) === lit(id))
      .withColumn("split_sum",
        sum(childAmount).over(Window.partitionBy(col(childKey))))
    // LEFT join: a parent without children (isSplitTransaction = false, the
    // common case) is still a successful point lookup — one row with null
    // child columns — not an empty result indistinguishable from a miss
    p.join(c, p(parentKey) === c(childKey), "left")
  }

  /** S9+P7 — institutions scan with the includeDeleted toggle
    * (monarchmoney.py:1024-1107; `accounts(filters: {includeDeleted: true})`
    * lib:1037). Default excludes deleted rows. */
  def institutions(df: DataFrame, deleted: Column,
                   includeDeleted: Boolean = false): DataFrame = {
    val flagged = df.withColumn("is_deleted", deleted)
    // a missing/NULL flag is falsy in the reference — the row is KEPT
    // (bare !deleted would evaluate NULL and drop it)
    if (includeDeleted) flagged else flagged.filter(!coalesce(deleted, lit(false)))
  }

  /** S15 — recurring forecast scan (monarchmoney.py:2667-2731): `isPast`
    * relative to an anchor date and the amount's deviation from its stream's
    * expected amount (amountDiff).
    *
    * The stream average aggregates integer CENTS, not double dollars: float
    * summation is order-dependent, so a double avg changes with partition
    * order (and diverges between engines); an integer sum is exact and
    * reproducible under any repartitioning. The result is intentionally NOT
    * decimal-rounded — the exact cents average lands on half-cent boundaries
    * where decimal rounding itself is engine-dependent. */
  def recurringForecast(df: DataFrame, dateCol: Column, amountCol: Column,
                        streamKey: Column, anchor: String): DataFrame = {
    val cents = round(amountCol * 100).cast("long")
    val streamAvg = avg(cents).over(Window.partitionBy(streamKey)) / 100.0
    df.withColumn("is_past", dateCol < lit(anchor).cast("date"))
      .withColumn("stream_amount", streamAvg)
      .withColumn("amount_diff", amountCol - streamAvg)
  }
}
