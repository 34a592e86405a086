package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._

/** SQL MATERIALIZED VIEWS with INCREMENTAL refresh — the engine's
  * q45/q74 IVM operators, q89 changelog and q145 stored views composed
  * into the user-facing surface a warehouse expects (the
  * Materialize/Delta "live table" shape, scoped to what is EXACTLY
  * incrementally maintainable):
  *
  * {{{
  *   CALL graft.system.create_materialized_view('daily',
  *     'SELECT k % 8 AS grp, count(*) AS n, sum(cents) AS total
  *      FROM graft.fact GROUP BY k % 8')
  *   SELECT * FROM graft.daily          -- the stored view
  *   CALL graft.system.refresh_mv('daily')
  * }}}
  *
  * The definition must be ONE aggregate over ONE table of the SAME
  * graft catalog: `SELECT <group exprs>, <count(*)/count(e)/sum(e)>...
  * FROM <graft table> [WHERE <pred>] GROUP BY <group exprs>`. Those
  * aggregates form the SELF-MAINTAINABLE class under inserts AND
  * deletes (each is a signed sum over the changelog); MIN/MAX are
  * REFUSED loudly — a delete of the current extremum forces a rescan,
  * which would silently break the "reads only the changelog" cost
  * contract (Materialize draws the same line; avg(e) is expressed as
  * sum(e)/count(e) by the author).
  *
  * Storage: the aggregate persists as a graft TABLE `<name>__store`
  * carrying the group columns, the aggregate columns, a hidden
  * `__mv_nrows` liveness count (groups whose live row count reaches
  * zero drop out — SQL GROUP BY semantics) and, for each SUM over a
  * NULLABLE input, a hidden non-null count `__mv_nn_<col>` (SUM of an
  * all-null group is NULL, which a bare signed sum cannot represent);
  * a STORED VIEW `<name>` projects exactly the definition's columns,
  * rebuilding NULL sums from the companion counts. The store's props
  * carry the definition (source, groups, aggregates, filter) and a
  * `source_version` CURSOR.
  *
  * Refresh is the IVM contract made procedural: one call reads
  * [[TableFormat.changesBetween]] over `(cursor, head]` — inserts and
  * update POST-images count +1, deletes and update PRE-images −1, all
  * three delete shapes (copy-on-write file diff, equality-manifest
  * MoR, deletion-vector) and the paired-update CDF shape included —
  * aggregates the signed delta, outer-joins it onto the stored state
  * (null-safe on group columns: NULL is a group), and commits the new
  * state with the advanced cursor in ONE version. Cost is O(changed
  * files + |view|), NEVER O(fact table); compaction/recluster commits
  * cost zero (the op=replace skip). A concurrent refresher that moved
  * the cursor fails the CAS loudly (the maintainView single-maintainer
  * rule). Reference anchor: the shared-scan multi-aggregate economics
  * of `lib:2253-2356` made persistent and resumable. */
object MaterializedView {

  /** One aggregate column: `kind` ∈ count_star | count | sum;
    * `exprSql` is the input expression's SQL (absent for count_star);
    * `nullableSum` marks a SUM over a nullable input (companion
    * non-null count maintained). */
  case class AggSpec(name: String, kind: String, exprSql: Option[String],
                     nullableSum: Boolean)

  /** Parsed, validated definition. `groups` are (outputName, exprSql). */
  case class MvDef(sourceTable: String, groups: Seq[(String, String)],
                   aggs: Seq[AggSpec], filterSql: Option[String])

  private val NRows = "__mv_nrows"
  private def nnCol(c: String) = s"__mv_nn_$c"

  // ---- definition parsing -------------------------------------------------

  /** Analyze `sql` and extract the maintainable shape, refusing loudly
    * anything outside it. `catalogName` pins the source to the calling
    * catalog (the changelog reads its warehouse). */
  def parse(spark: SparkSession, sql: String, catalogName: String): MvDef = {
    val analyzed = spark.sql(sql).queryExecution.analyzed
    def fail(msg: String): Nothing = throw new IllegalArgumentException(
      s"create_materialized_view: $msg (definition must be " +
        "SELECT <groups>, count(*)/count(e)/sum(e)... FROM <graft table> " +
        "[WHERE <pred>] GROUP BY <groups> — min/max/avg/distinct are not " +
        "incrementally maintainable under deletes; write avg as sum/count)")
    val agg = analyzed match {
      case a: Aggregate => a
      case _ => fail(s"top-level plan is ${analyzed.nodeName}, not an aggregate")
    }
    // render expression SQL with attribute QUALIFIERS stripped: the
    // stored strings re-resolve against bare frames (the changelog
    // delta, the masked table read), where `mvcat.fact.k` has no home
    def sqlOf(e: Expression): String = e.transform {
      case a: AttributeReference => a.withQualifier(Seq.empty)
    }.sql
    // unwrap to the ONE source relation, capturing a WHERE if present
    var filterSql: Option[String] = None
    def unwrap(p: LogicalPlan): DataSourceV2Relation = p match {
      case SubqueryAlias(_, c) => unwrap(c)
      case f: Filter =>
        if (filterSql.nonEmpty) fail("more than one WHERE layer")
        if (!f.condition.deterministic) fail("non-deterministic WHERE")
        filterSql = Some(sqlOf(f.condition)); unwrap(f.child)
      case pr: Project if pr.projectList.forall(_.isInstanceOf[AttributeReference]) =>
        unwrap(pr.child)
      case r: DataSourceV2Relation => r
      case other => fail(s"unsupported operator ${other.nodeName} between " +
        "the aggregate and the table (joins/subqueries are not maintainable " +
        "from one table's changelog)")
    }
    val rel = unwrap(agg.child)
    val srcName = rel.identifier.getOrElse(
      fail("source relation carries no catalog identifier")).toString
    if (!rel.catalog.exists(_.name() == catalogName))
      fail(s"source table '$srcName' is not in catalog '$catalogName'")
    // group expressions index: output columns matching one are keys
    val groupSqls = agg.groupingExpressions.map(sqlOf)
    val groups = Seq.newBuilder[(String, String)]
    val aggs = Seq.newBuilder[AggSpec]
    agg.aggregateExpressions.foreach {
      case a @ Alias(ae: AggregateExpression, name) =>
        if (ae.isDistinct) fail(s"DISTINCT aggregate '${a.name}'")
        if (ae.filter.nonEmpty) fail(s"FILTER clause on aggregate '${a.name}'")
        ae.aggregateFunction match {
          case Count(Seq(Literal(_, _))) =>
            aggs += AggSpec(name, "count_star", None, nullableSum = false)
          case Count(Seq(e)) if e.deterministic =>
            aggs += AggSpec(name, "count", Some(sqlOf(e)), nullableSum = false)
          case Sum(e, _) if e.deterministic =>
            aggs += AggSpec(name, "sum", Some(sqlOf(e)), nullableSum = e.nullable)
          case other => fail(s"aggregate ${other.prettyName} on '$name'")
        }
      case a: Alias if groupSqls.contains(sqlOf(a.child)) =>
        if (!a.child.deterministic) fail(s"non-deterministic group '${a.name}'")
        groups += a.name -> sqlOf(a.child)
      case ar: AttributeReference if groupSqls.contains(sqlOf(ar)) =>
        groups += ar.name -> sqlOf(ar)
      case other => fail(s"output column '${other.sql}' is neither a " +
        "grouping expression nor a supported aggregate")
    }
    val g = groups.result()
    val as = aggs.result()
    if (as.isEmpty) fail("no aggregate columns")
    if (g.size != agg.groupingExpressions.size)
      fail("every GROUP BY expression must appear in the SELECT list " +
        "(the stored view's key)")
    val names = g.map(_._1) ++ as.map(_.name)
    if (names.distinct.size != names.size) fail("duplicate output column names")
    if (names.exists(_.startsWith("__mv_")))
      fail("output column names must not start with __mv_ (reserved)")
    MvDef(srcName, g, as, filterSql)
  }

  // ---- shared aggregate arithmetic ---------------------------------------

  /** Store-shaped aggregate of `rows`: groups, user aggregates, hidden
    * liveness/non-null counts. `sign` is +1/−1 per row (lit(1) for the
    * bootstrap full compute). */
  private def aggregate(rows: DataFrame, d: MvDef, sign: Column): DataFrame = {
    val base = d.filterSql.map(f => rows.filter(expr(f))).getOrElse(rows)
    val aggCols: Seq[Column] = d.aggs.flatMap { a =>
      val main = a.kind match {
        case "count_star" => sum(sign).as(a.name)
        case "count" => sum(sign * when(expr(a.exprSql.get).isNotNull, 1L)
          .otherwise(0L)).as(a.name)
        case "sum" =>
          val e = expr(a.exprSql.get)
          sum(when(e.isNotNull, e * sign)).as(a.name)
      }
      val nn =
        if (!a.nullableSum) Seq.empty
        else Seq(sum(sign * when(expr(a.exprSql.get).isNotNull, 1L)
          .otherwise(0L)).as(nnCol(a.name)))
      main +: nn
    } :+ sum(sign).as(NRows)
    base.groupBy(d.groups.map { case (n, sql) => expr(sql).as(n) }: _*)
      .agg(aggCols.head, aggCols.tail: _*)
  }

  /** Merge the stored state with a signed delta aggregate (both
    * store-shaped): null-safe outer join on the group columns, add
    * counts and sums, drop dead groups. */
  private def merge(store: DataFrame, delta: DataFrame, d: MvDef): DataFrame = {
    val gs = d.groups.map(_._1)
    val l = store.alias("__l")
    val r = delta.alias("__r")
    val cond = gs.map(c => col(s"__l.$c") <=> col(s"__r.$c"))
      .reduce(_ && _)
    val valCols = d.aggs.flatMap { a =>
      val add = (c: String) =>
        (coalesce(col(s"__l.$c"), lit(0L).cast(store.schema(c).dataType)) +
          coalesce(col(s"__r.$c"), lit(0L).cast(store.schema(c).dataType)))
          .cast(store.schema(c).dataType).as(c)
      add(a.name) +: (if (a.nullableSum) Seq(add(nnCol(a.name))) else Seq.empty)
    } :+ (coalesce(col(s"__l.$NRows"), lit(0L)) +
      coalesce(col(s"__r.$NRows"), lit(0L))).as(NRows)
    l.join(r, cond, "full_outer")
      .select(gs.map(c =>
        coalesce(col(s"__l.$c"), col(s"__r.$c")).as(c)) ++ valCols: _*)
      .filter(col(NRows) > 0)
  }

  /** The user-facing projection over the store: groups verbatim, sums
    * NULLed when their non-null count is zero (SQL SUM semantics).
    * `fromRef` is the fully-qualified, quoted store reference. */
  def viewSql(fromRef: String, d: MvDef): String = {
    val cols = d.groups.map { case (n, _) => s"`$n`" } ++ d.aggs.map { a =>
      if (a.nullableSum)
        s"CASE WHEN `${nnCol(a.name)}` > 0 THEN `${a.name}` END AS `${a.name}`"
      else s"`${a.name}`"
    }
    s"SELECT ${cols.mkString(", ")} FROM $fromRef"
  }

  // ---- lifecycle ----------------------------------------------------------

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def defProps(d: MvDef): Map[String, String] = Map(
    "mv.source" -> d.sourceTable,
    "mv.groups" -> mapper.writeValueAsString(
      d.groups.map { case (n, s) => java.util.Map.of("name", n, "sql", s) }
        .toArray),
    "mv.aggs" -> mapper.writeValueAsString(
      d.aggs.map(a => java.util.Map.of("name", a.name, "kind", a.kind,
        "sql", a.exprSql.getOrElse(""),
        "nullable", a.nullableSum.toString)).toArray)) ++
    d.filterSql.map("mv.filter" -> _)

  private def defOf(props: Map[String, String]): MvDef = {
    def arr(key: String) = mapper.readTree(props(key))
    val groups = (0 until arr("mv.groups").size()).map { i =>
      val n = arr("mv.groups").get(i)
      n.get("name").asText() -> n.get("sql").asText()
    }
    val aggs = (0 until arr("mv.aggs").size()).map { i =>
      val n = arr("mv.aggs").get(i)
      AggSpec(n.get("name").asText(), n.get("kind").asText(),
        Some(n.get("sql").asText()).filter(_.nonEmpty),
        n.get("nullable").asText().toBoolean)
    }
    MvDef(props("mv.source"), groups, aggs, props.get("mv.filter"))
  }

  /** Bootstrap: full compute at the source's CURRENT version, committed
    * as the store's v1 with the cursor. Returns (snapshot, cursor). */
  def create(spark: SparkSession, d: MvDef, sourceRoot: String,
             storeRoot: String, nOutFiles: Int = 1): (TableFormat.Snapshot, Long) = {
    require(TableFormat.versions(spark, storeRoot).isEmpty,
      s"create_materialized_view: store at $storeRoot already exists")
    val src = TableFormat.snapshot(spark, sourceRoot)
    val full = aggregate(TableFormat.read(spark, src), d, lit(1L))
    val out = s"$storeRoot/data/mv-${java.util.UUID.randomUUID()}"
    full.repartition(nOutFiles).write.mode("overwrite").parquet(out)
    val files = TableFormat.listParquet(spark, out)
    val keyCol = NRows // always present, integral; zone use is incidental
    val snap =
      if (files.isEmpty) {
        // empty source: commit schema-only state (the cursor still pins)
        val ddl = full.schema.toDDL
        TableFormat.commitTransform(spark, storeRoot, keyCol, 1 << 10, 3,
          { curOpt =>
            if (curOpt.nonEmpty) throw new IllegalStateException(
              s"create_materialized_view: concurrent bootstrap at $storeRoot")
            Seq.empty
          },
          deriveProps = _ => defProps(d) + ("source_version" -> src.version.toString),
          deriveSchema = _ => Some(ddl), op = Some("append"))
      } else {
        val stats = TableFormat.fileStats(spark, files, keyCol, 1 << 10, 3)
        val ddl = spark.read.parquet(files: _*).schema.toDDL
        TableFormat.commitTransform(spark, storeRoot, keyCol, 1 << 10, 3,
          { curOpt =>
            if (curOpt.nonEmpty) throw new IllegalStateException(
              s"create_materialized_view: concurrent bootstrap at $storeRoot")
            stats
          },
          deriveProps = _ => defProps(d) + ("source_version" -> src.version.toString),
          deriveSchema = _ => Some(ddl), op = Some("append"))
      }
    (snap, src.version)
  }

  /** One refresh tick: consume the changelog `(cursor, head]` as signed
    * deltas against the stored aggregate and commit with the advanced
    * cursor. Returns (snapshot, fromVersion, toVersion) — from == to
    * means nothing new (no commit). */
  def refresh(spark: SparkSession, sourceRoot: String, storeRoot: String,
              nOutFiles: Int = 1): (TableFormat.Snapshot, Long, Long) = {
    val cur = TableFormat.snapshot(spark, storeRoot)
    val d = defOf(cur.props)
    val cursor = cur.props.getOrElse("source_version",
      throw new IllegalStateException(
        s"refresh_mv: store at $storeRoot carries no source_version cursor"))
      .toLong
    val src = TableFormat.snapshot(spark, sourceRoot)
    if (cursor >= src.version) return (cur, cursor, cursor)
    val delta = TableFormat.changesBetween(spark, sourceRoot, cursor, src.version)
    // the sign rides the rows as a column (the tag columns drop before
    // the definition's expressions see the frame)
    val signed = delta.withColumn("__mv_sign",
        when(col("_change").isin("insert", "update_postimage"), lit(1L))
          .otherwise(lit(-1L)))
      .drop("_version", "_change", "_row_id")
    val deltaState = aggregate(signed, d, col("__mv_sign"))
    val merged = merge(TableFormat.read(spark, cur), deltaState, d)
    val out = s"$storeRoot/data/mv-${java.util.UUID.randomUUID()}"
    merged.repartition(nOutFiles).write.mode("overwrite").parquet(out)
    val files = TableFormat.listParquet(spark, out)
    val stats =
      if (files.isEmpty) Seq.empty
      else TableFormat.fileStats(spark, files, cur.keyCol, cur.numBits,
        cur.numHashes)
    val snap = TableFormat.commitTransform(spark, storeRoot, cur.keyCol,
      cur.numBits, cur.numHashes,
      { curOpt =>
        val now = curOpt.flatMap(_.props.get("source_version")).map(_.toLong)
        if (!now.contains(cursor)) throw new IllegalStateException(
          s"refresh_mv: concurrent refresher moved the cursor " +
            s"($now != Some($cursor)) at $storeRoot")
        stats
      },
      deriveProps = _ => defProps(d) + ("source_version" -> src.version.toString),
      op = Some("refresh"))
    (snap, cursor, src.version)
  }
}
