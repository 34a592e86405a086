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
  *  - The stored SQL resolves in the CURRENT session context; views
  *    should reference their inputs catalog-qualified (the create
  *    procedure analyzes the text at create time, which catches
  *    unqualified names that only resolved by accident). */
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
          Some(SubqueryAlias(parts.last,
            spark.sessionState.sqlParser.parsePlan(v.query)))
        }
      case _ => None
    }
  }
}
