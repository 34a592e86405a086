package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeSeq, BindReferences, BoundReference, Cast, EqualNullSafe, Expression, If, IsNotNull, Literal, Not, RaiseError, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Project}
import org.apache.spark.sql.connector.write.{DataWriter, DataWriterFactory, WriterCommitMessage}
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** GENERATED and IDENTITY columns for the SQL catalog — the two
  * remaining Spark-4 `TableCatalogCapability` DDL surfaces, persisted
  * as commit-prop ledgers (the coldefault pattern) and ENFORCED at the
  * write edge, because Spark's analyzer accepts the DDL but leaves
  * computation to the connector:
  *
  *  - `colgen.c = <expr sql>` — `c T GENERATED ALWAYS AS (expr)`.
  *    Every SQL write computes `c` from the row (a bound catalyst
  *    expression compiled into an `UnsafeProjection` in the writer —
  *    codegen'd, no per-row SQL parsing); an EXPLICIT non-null value
  *    that disagrees with the expression refuses per-row (Delta's
  *    GENERATED ALWAYS contract; an omitted column arrives NULL and is
  *    computed). Every row-adding commit — including the library-path
  *    `TableFormat.appendFiles` that bypasses this writer —
  *    additionally validates `c <=> (expr)` as an implicit CHECK, so
  *    files breaking the invariant can never land from any path.
  *  - `colid.c = start,step,allowExplicit` + the `colid.next.c`
  *    watermark — `c BIGINT GENERATED ALWAYS AS IDENTITY`. Values are
  *    assigned writer-side with ZERO cross-task coordination: task
  *    `pid` of `P` assigns `next + (i*P + pid)*step` to its i-th row —
  *    globally unique by construction (round-robin interleave),
  *    monotone per task, gaps allowed (the Delta/SQL-standard identity
  *    contract: unique, not consecutive). Each task reports its maximum
  *    assigned ordinal in its commit message and the table commit
  *    CAS-advances the watermark past it; a CONCURRENT identity write
  *    that moved the watermark first fails the commit loudly (stale
  *    ranges could collide) instead of silently retrying. */
private[v2] object GraftGenerated {

  val ColGenPrefix = "colgen."
  val ColIdPrefix = "colid."
  val ColIdNextPrefix = "colid.next."

  def hasGenerated(props: Map[String, String]): Boolean =
    props.keysIterator.exists(_.startsWith(ColGenPrefix))
  def hasIdentity(props: Map[String, String]): Boolean =
    props.keysIterator.exists(k => k.startsWith(ColIdPrefix) &&
      !k.startsWith(ColIdNextPrefix))

  /** (fieldIndex, bound check-and-compute expression) per generated
    * column — driver-side: parse + analyze the stored SQL against the
    * table schema, bind to row positions; the result is serializable
    * and compiled executor-side. */
  def boundGenerated(spark: SparkSession, schema: StructType,
                     props: Map[String, String]): Seq[(Int, Expression)] = {
    val gens = props.collect { case (k, sql) if k.startsWith(ColGenPrefix) =>
      k.stripPrefix(ColGenPrefix) -> sql
    }
    if (gens.isEmpty) return Seq.empty
    val attrs: Seq[Attribute] =
      org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema)
    gens.toSeq.sortBy(_._1).map { case (c, sql) =>
      val i = schema.fieldIndex(c)
      val dt = schema.fields(i).dataType
      val parsed = spark.sessionState.sqlParser.parseExpression(sql)
      val analyzed = spark.sessionState.analyzer
        .execute(Project(Seq(Alias(parsed, "__gen")()), LocalRelation(attrs)))
        .asInstanceOf[Project].projectList.head.asInstanceOf[Alias].child
      val bound = BindReferences.bindReference(Cast(analyzed, dt),
        AttributeSeq(attrs))
      val provided = BoundReference(i, dt, nullable = true)
      // explicit non-null value must AGREE with the expression; the
      // computed value lands otherwise (omitted columns arrive NULL)
      val guarded = If(
        And(IsNotNull(provided), Not(EqualNullSafe(provided, bound))),
        Cast(RaiseError(Literal(
          s"GENERATED ALWAYS AS column '$c': explicitly inserted value " +
            s"disagrees with the generation expression ($sql)")), dt),
        bound)
      (i, guarded)
    }
  }

  /** One identity column's assignment parameters. `next` is the first
    * unassigned VALUE (the watermark read at plan time). */
  case class IdentityAssign(fieldIndex: Int, dataType: DataType,
                            start: Long, step: Long, allowExplicit: Boolean,
                            next: Long)

  def identityAssigns(schema: StructType,
                      props: Map[String, String]): Seq[IdentityAssign] =
    props.collect {
      case (k, spec) if k.startsWith(ColIdPrefix) &&
          !k.startsWith(ColIdNextPrefix) =>
        val c = k.stripPrefix(ColIdPrefix)
        val Array(start, step, allow) = spec.split(',')
        val i = schema.fieldIndex(c)
        IdentityAssign(i, schema.fields(i).dataType, start.toLong,
          step.toLong, allow.toBoolean,
          props.getOrElse(ColIdNextPrefix + c, start).toLong)
    }.toSeq.sortBy(_.fieldIndex)

  /** The implicit CHECK predicates generated columns add to every
    * row-adding commit: `c <=> (expr)` per ledger entry. */
  def implicitChecks(props: Map[String, String]): Seq[(String, String)] =
    props.collect { case (k, sql) if k.startsWith(ColGenPrefix) =>
      (k.stripPrefix(ColGenPrefix), sql)
    }.toSeq
}

/** Wraps the SQL write's [[DataWriterFactory]]: every row passes
  * through identity assignment and/or the generated-column projection
  * before the inner writer sees it. */
private[v2] class GraftGeneratingWriterFactory(
    inner: DataWriterFactory,
    schema: StructType,
    genExprs: Seq[(Int, Expression)],
    ids: Seq[GraftGenerated.IdentityAssign],
    numPartitions: Int) extends DataWriterFactory {

  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] =
    new GraftGeneratingWriter(inner.createWriter(partitionId, taskId),
      schema, genExprs, ids, numPartitions, partitionId)
}

private class GraftGeneratingWriter(
    inner: DataWriter[InternalRow],
    schema: StructType,
    genExprs: Seq[(Int, Expression)],
    ids: Seq[GraftGenerated.IdentityAssign],
    numPartitions: Int,
    partitionId: Int) extends DataWriter[InternalRow] {

  private val nFields = schema.fields.length
  private val fieldTypes: Array[DataType] = schema.fields.map(_.dataType)
  private var count = 0L
  private var maxOrdinal = -1L

  // identity assignment runs FIRST (a generation expression may
  // reference the identity column), then the fused generated projection
  private lazy val genProj: UnsafeProjection = UnsafeProjection.create(
    (0 until nFields).map { i =>
      genExprs.find(_._1 == i).map(_._2).getOrElse(
        BoundReference(i, fieldTypes(i), nullable = true))
    })

  override def write(row: InternalRow): Unit = {
    var out = row
    if (ids.nonEmpty) {
      val vals = new Array[Any](nFields)
      var i = 0
      while (i < nFields) {
        vals(i) = if (out.isNullAt(i)) null else out.get(i, fieldTypes(i))
        i += 1
      }
      ids.foreach { a =>
        if (!(a.allowExplicit && vals(a.fieldIndex) != null)) {
          val ordinal = count * numPartitions + partitionId
          if (ordinal > maxOrdinal) maxOrdinal = ordinal
          val v = a.next + ordinal * a.step
          vals(a.fieldIndex) =
            if (a.dataType == IntegerType) v.toInt else v
        }
      }
      out = InternalRow.fromSeq(vals.toIndexedSeq)
    }
    if (genExprs.nonEmpty) out = genProj(out)
    count += 1
    inner.write(out)
  }

  override def commit(): WriterCommitMessage = {
    val m = inner.commit()
    if (ids.isEmpty) m else GraftIdentityMessage(m, maxOrdinal)
  }
  override def abort(): Unit = inner.abort()
  override def close(): Unit = inner.close()
}

/** Identity writes wrap the inner message with the task's maximum
  * assigned ordinal (−1 when the task assigned nothing). */
private[v2] case class GraftIdentityMessage(inner: WriterCommitMessage,
                                            maxOrdinal: Long)
  extends WriterCommitMessage
