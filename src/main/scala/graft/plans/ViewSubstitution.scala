package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier

/** RESOLUTION-TIME VIEW EXPANSION for graft catalogs — what makes a
  * stored view document ([[graft.sources.v2.GraftViews]]) readable from
  * plain SQL: `SELECT * FROM graft.v` re-parses the stored SQL in place
  * of the relation, so the view re-analyzes against the CURRENT table
  * state every read (appends, schema evolution and time travel all
  * flow through).
  *
  * This is an injected analyzer rule (`injectResolutionRule` via
  * [[graft.GraftExtensions]]) because OSS Spark 4.1 ships the
  * `ViewCatalog` API without wiring it into resolution or DDL —
  * `ResolveSessionCatalog` refuses `CREATE VIEW` on any non-session
  * catalog outright, which is also why view DDL rides the engine's
  * `CALL graft.system.{create_view, drop_view, rename_view,
  * list_views}` procedures instead.
  *
  * Semantics:
  *  - TABLES SHADOW VIEWS: Spark's own `ResolveRelations` runs earlier
  *    in the resolution batch, so an identifier naming a real table
  *    never reaches this rule (and `create_view` refuses a name a
  *    table already holds).
  *  - Nested views expand one layer per fixed-point iteration; a
  *    reference CYCLE therefore fails loudly with the analyzer's
  *    max-iterations error instead of hanging.
  *  - The stored SQL resolves against the STORED creation context (the
  *    Iceberg view-spec rule): every relation whose leading part is not
  *    a registered catalog is qualified with the document's
  *    `currentCatalog` (and, for single-part names, its
  *    `currentNamespace`) before analysis. Without this, a view that
  *    analyzed fine at create time could resolve a SAME-NAMED but
  *    different relation — or fail outright — in another session whose
  *    current catalog/namespace differ. Session-local state (temp
  *    views) is rejected at CREATE time instead: no stored context can
  *    make it reachable elsewhere. */
object ViewSubstitution extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation if u.multipartIdentifier.length >= 2 =>
        expand(u).getOrElse(u)
    }

  private def expand(u: UnresolvedRelation): Option[LogicalPlan] = {
    val spark = SparkSession.active
    val parts = u.multipartIdentifier
    val cat =
      try spark.sessionState.catalogManager.catalog(parts.head)
      catch { case scala.util.control.NonFatal(_) => return None }
    cat match {
      case g: graft.sources.v2.GraftTableCatalog =>
        val ident = Identifier.of(parts.tail.init.toArray, parts.last)
        if (!g.viewExists(ident)) None
        else {
          val v = g.loadView(ident)
          Some(SubqueryAlias(parts.last, qualified(spark,
            spark.sessionState.sqlParser.parsePlan(v.query),
            v.currentCatalog, v.currentNamespace)))
        }
      case _ => None
    }
  }

  /** Qualify the parsed view body's relations against the STORED
    * creation context: a single-part name gains the stored catalog and
    * namespace, a multi-part name whose head names no registered
    * catalog gains the stored catalog. Names already catalog-anchored
    * pass through untouched, so fully-qualified view SQL (the
    * recommended style) is a no-op here. Subqueries are walked too —
    * a scalar subquery's relation diverging across sessions is the
    * same bug. */
  private def qualified(spark: SparkSession, plan: LogicalPlan,
                        storedCatalog: String,
                        storedNamespace: Array[String]): LogicalPlan = {
    val mgr = spark.sessionState.catalogManager
    // names bound by a CTE in the view body are NOT relations to
    // qualify — `WITH t AS (...) SELECT ... FROM t` must keep its `t`
    // local (resolution is case-insensitive, so compare folded)
    val cteNames = plan.collectWithSubqueries {
      case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
        w.cteRelations.map(_._1.toLowerCase(java.util.Locale.ROOT))
    }.flatten.toSet
    plan.transformUpWithSubqueries {
      case r: UnresolvedRelation
          if !(r.multipartIdentifier.length == 1 && cteNames.contains(
            r.multipartIdentifier.head.toLowerCase(java.util.Locale.ROOT))) =>
        val ps = r.multipartIdentifier
        if (ps.length >= 2 && mgr.isCatalogRegistered(ps.head)) r
        else {
          val full =
            if (ps.length == 1) (storedCatalog +: storedNamespace.toSeq) ++ ps
            else storedCatalog +: ps
          r.copy(multipartIdentifier = full)
        }
    }
  }
}
