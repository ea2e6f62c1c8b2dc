package graft.plans

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, Literal, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graft.GraftSqlBridge

import graft.sources.{GraftV2Table, VersionedTable}

/** SQL DML against versioned tables — the post-hoc resolution rule that
  * turns resolved `DELETE FROM` / `UPDATE` / `MERGE INTO` plans over a
  * [[GraftV2Table]] into eager commands running the library's
  * copy-on-write executors ([[VersionedTable.delete]] /
  * [[VersionedTable.update]] / [[VersionedTable.merge]]). This is the
  * reference engine's whole product expressed as the statement a modern
  * user types: `DELETE FROM t WHERE criteria` IS
  * `deletion/DeletionExecutor.java:139-230`'s
  * identify-affected-partitions → rewrite-the-complement, on the
  * manifest backend.
  *
  * Division of labor with the native V2 path (documented coexistence):
  * without these extensions, `DELETE FROM` still works through
  * [[GraftV2Table]]'s `SupportsDelete` for source-translatable
  * predicates (and TRUNCATE for unconditional). With them, ANY
  * deterministic Catalyst predicate works — plus UPDATE and the
  * canonical upsert MERGE, which plain V2 tables cannot express without
  * `SupportsRowLevelOperations`' full rewrite machinery.
  *
  * Conditions are rebound by NAME (attribute refs → unresolved
  * attributes) and re-resolved against the freshly-planned current
  * frame inside the executors — exprIds from the analyzed statement
  * cannot leak into a different plan. Subquery conditions are refused
  * loudly (a correlated delete needs a join rewrite, not a silent
  * mis-evaluation).
  */
class GraftDmlRule(session: SparkSession) extends Rule[LogicalPlan] {

  import GraftDml._

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d @ DeleteFromTable(GraftRel(t), cond) if d.resolved =>
      t.requireMutable("DELETE")
      requireNoSubquery(cond, "DELETE")
      GraftDeleteCommand(t.tableDir, t.specString, cond)

    case u @ UpdateTable(GraftRel(t), assignments, cond) if u.resolved =>
      t.requireMutable("UPDATE")
      cond.foreach(requireNoSubquery(_, "UPDATE"))
      val assigns = assignments.map { a =>
        a.key match {
          case k: AttributeReference => k.name -> a.value
          case other => throw new UnsupportedOperationException(
            s"UPDATE of a nested field (${other.sql}) is not supported " +
              "— assign whole top-level columns")
        }
      }
      assigns.foreach { case (_, v) => requireNoSubquery(v, "UPDATE") }
      GraftUpdateCommand(t.tableDir, t.specString, assigns,
        cond.getOrElse(Literal.TrueLiteral))

    case m: MergeIntoTable if m.resolved =>
      m.targetTable match {
        case GraftRel(t) =>
          t.requireMutable("MERGE")
          GraftMergeCommand(t.tableDir, t.specString,
            canonicalMergeKey(m), m.sourceTable)
        case _ => plan
      }

    // dynamic INSERT OVERWRITE: Spark's V1 write fallback has no
    // dynamic-partition exec (only append/overwrite-by-expression), so
    // the plan routes to [[VersionedTable.overwritePartitions]] here —
    // one manifest commit replacing exactly the tuples present in the
    // query's rows
    case o @ OverwritePartitionsDynamic(GraftRel(t), query, _, _, _)
        if o.resolved =>
      t.requireMutable("INSERT OVERWRITE")
      GraftDynamicOverwriteCommand(t.tableDir, t.specString, query)

    case _ => plan
  }
}

private[plans] object GraftDml {

  /** The graft V2 table under a resolved DML target, looking through
    * aliases — anything else leaves the plan for Spark's own handling.
    */
  object GraftRel {
    def unapply(plan: LogicalPlan): Option[GraftV2Table] = plan match {
      case SubqueryAlias(_, child) => unapply(child)
      case r: DataSourceV2Relation => r.table match {
        case t: GraftV2Table => Some(t)
        case _ => None
      }
      case _ => None
    }
  }

  def requireNoSubquery(e: Expression, op: String): Unit =
    if (e.exists(_.isInstanceOf[SubqueryExpression]))
      throw new UnsupportedOperationException(
        s"$op with a subquery condition is not supported on graft " +
          "tables — materialize the subquery (e.g. into an IN-list or a " +
          "joinable frame) and use the library API")

  /** Rebind a resolved expression by NAME so it re-resolves against the
    * executor's freshly-planned frame.
    */
  def rebound(e: Expression): Column =
    GraftSqlBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })

  /** The canonical-upsert key of a MERGE, or a loud refusal naming the
    * first non-canonical part. Canonical = `ON t.k = s.k` (same column
    * name both sides), `WHEN MATCHED THEN UPDATE SET *`, `WHEN NOT
    * MATCHED THEN INSERT *` (star forms arrive expanded to identity
    * assignments by the analyzer), no action conditions, no
    * NOT MATCHED BY SOURCE clause, no schema evolution — exactly
    * [[VersionedTable.merge]]'s replace-matched-insert-rest contract.
    */
  def canonicalMergeKey(m: MergeIntoTable): String = {
    def refuse(what: String): Nothing =
      throw new UnsupportedOperationException(
        s"MERGE INTO a graft table supports only the canonical upsert " +
          s"(ON t.k = s.k, WHEN MATCHED UPDATE SET *, WHEN NOT MATCHED " +
          s"INSERT *) — $what is not supported; use " +
          "VersionedTable.merge or explicit DELETE + INSERT")
    if (m.withSchemaEvolution) refuse("WITH SCHEMA EVOLUTION")
    if (m.notMatchedBySourceActions.nonEmpty)
      refuse("WHEN NOT MATCHED BY SOURCE")
    val key = m.mergeCondition match {
      case org.apache.spark.sql.catalyst.expressions.EqualTo(
          l: AttributeReference, r: AttributeReference)
          if l.name == r.name => l.name
      case other =>
        refuse(s"the ON condition '${other.sql}' (need a single " +
          "equality on one same-named column)")
    }
    def identityAssigns(assigns: Seq[Assignment], act: String): Unit =
      assigns.foreach { a =>
        (a.key, a.value) match {
          case (k: AttributeReference, v: AttributeReference)
              if k.name == v.name => ()
          case _ =>
            refuse(s"a non-identity $act assignment " +
              s"('${a.key.sql} = ${a.value.sql}')")
        }
      }
    m.matchedActions match {
      case Seq(UpdateAction(None, assigns, _)) =>
        identityAssigns(assigns, "UPDATE")
      case other => refuse(s"matched actions $other")
    }
    m.notMatchedActions match {
      case Seq(InsertAction(None, assigns)) =>
        identityAssigns(assigns, "INSERT")
      case other => refuse(s"not-matched actions $other")
    }
    key
  }
}

/** `DELETE FROM graft.`dir`` WHERE cond — the reference's deletion job
  * as one statement; runs [[VersionedTable.delete]]'s COW kernel.
  */
case class GraftDeleteCommand(tableDir: String, spec: String,
    cond: Expression) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    VersionedTable.delete(spark, tableDir, spec, GraftDml.rebound(cond))
    Seq.empty
  }
}

/** `UPDATE graft.`dir`` SET … WHERE cond` → [[VersionedTable.update]]. */
case class GraftUpdateCommand(tableDir: String, spec: String,
    assignments: Seq[(String, Expression)], cond: Expression)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    VersionedTable.update(spark, tableDir, spec, GraftDml.rebound(cond),
      assignments.map { case (n, e) => n -> GraftDml.rebound(e) })
    Seq.empty
  }
}

/** Dynamic `INSERT OVERWRITE` → [[VersionedTable.overwritePartitions]]:
  * the partition tuples present in the query replace wholesale, all
  * others carry by reference, one commit.
  */
case class GraftDynamicOverwriteCommand(tableDir: String, spec: String,
    query: LogicalPlan) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    VersionedTable.overwritePartitions(
      GraftSqlBridge.ofRows(spark, query), tableDir, spec)
    Seq.empty
  }
}

/** Canonical-upsert `MERGE INTO` → [[VersionedTable.merge]]: matched
  * rows replaced by the source row, unmatched source rows inserted,
  * only affected partitions rewritten.
  */
case class GraftMergeCommand(tableDir: String, spec: String,
    keyCol: String, source: LogicalPlan) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val batch = GraftSqlBridge.ofRows(spark, source)
    VersionedTable.merge(batch, tableDir, spec, keyCol)
    Seq.empty
  }
}
