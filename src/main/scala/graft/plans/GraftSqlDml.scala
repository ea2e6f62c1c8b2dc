package graft.plans

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Expression, InSubquery, ListQuery, Literal, ScalarSubquery, SubqueryExpression}
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
  * cannot leak into a different plan. Subqueries: uncorrelated
  * single-column `col IN (SELECT …)` conjuncts run as JOIN-form
  * membership ([[VersionedTable.deleteMatching]]/`updateMatching`) and
  * uncorrelated scalars materialize to literals at run time; every
  * other shape (correlated, NOT IN, EXISTS, multi-column) refuses
  * loudly naming itself — each would need a different join rewrite,
  * and a silent approximation would be worse than the refusal.
  */
class GraftDmlRule(session: SparkSession) extends Rule[LogicalPlan] {

  import GraftDml._

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d @ DeleteFromTable(GraftRel(t), cond) if d.resolved =>
      t.requireMutable("DELETE")
      val (keys, residual) = extractInSubqueries(cond, "DELETE")
      if (keys.isEmpty) GraftDeleteCommand(t.tableDir, t.specString, cond)
      else GraftDeleteMatchingCommand(t.tableDir, t.specString, keys,
        residual)

    case u @ UpdateTable(GraftRel(t), assignments, cond) if u.resolved =>
      t.requireMutable("UPDATE")
      val (keys, residual) = cond
        .map(extractInSubqueries(_, "UPDATE"))
        .getOrElse((Nil, None))
      val assigns = assignments.map { a =>
        a.key match {
          case k: AttributeReference => k.name -> a.value
          case other => throw new UnsupportedOperationException(
            s"UPDATE of a nested field (${other.sql}) is not supported " +
              "— assign whole top-level columns")
        }
      }
      assigns.foreach { case (_, v) =>
        requireSupportedSubqueries(v, "UPDATE") }
      if (keys.isEmpty)
        GraftUpdateCommand(t.tableDir, t.specString, assigns,
          cond.getOrElse(Literal.TrueLiteral))
      else GraftUpdateMatchingCommand(t.tableDir, t.specString, assigns,
        keys, residual)

    case m: MergeIntoTable if m.resolved =>
      m.targetTable match {
        case GraftRel(t) =>
          t.requireMutable("MERGE")
          translateMerge(m, t)
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
        s"$op supports subqueries only as UNCORRELATED single-column " +
          "`col IN (SELECT …)` conjuncts on graft tables — " +
          s"'${e.sql}' is not one (correlated, NOT IN and scalar forms " +
          "refuse); materialize it into a joinable " +
          "frame and use the library API")

  /** Accept uncorrelated SCALAR subqueries (they materialize to a
    * literal at command run time — [[GraftDml.resolveScalars]]); refuse
    * every other subquery shape, naming it. The distinction from
    * [[requireNoSubquery]]: residual conjuncts and assignment values CAN
    * carry a scalar (`amount > (SELECT avg(amount) …)` is a
    * one-value-then-compare), while a non-conjunct IN / EXISTS /
    * correlated form would need a join rewrite this path does not do.
    */
  def requireSupportedSubqueries(e: Expression, op: String): Unit =
    e.foreach {
      case s: ScalarSubquery if s.outerAttrs.isEmpty => ()
      case s: SubqueryExpression =>
        throw new UnsupportedOperationException(
          s"$op supports only UNCORRELATED `col IN (SELECT …)` conjuncts " +
            s"and UNCORRELATED scalar subqueries on graft tables — " +
            s"'${s.sql}' is neither (correlated, NOT IN and EXISTS " +
            "refuse); materialize it into a joinable " +
            "frame and use the library API")
      case _ => ()
    }

  /** Evaluate every uncorrelated scalar subquery in `e` to a literal —
    * run-time companion of [[requireSupportedSubqueries]]. SQL scalar
    * semantics: empty result is NULL, more than one row refuses.
    */
  def resolveScalars(spark: SparkSession, e: Expression): Expression =
    e.transform {
      case s: ScalarSubquery if s.outerAttrs.isEmpty =>
        val rows = GraftSqlBridge.ofRows(spark, s.plan).take(2)
        require(rows.length <= 1,
          "scalar subquery in a DML condition returned more than one row")
        val value = if (rows.isEmpty) null else rows.head.get(0)
        Literal.create(value, s.dataType)
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Decompose a DML condition into uncorrelated
    * `attr-tuple IN (subquery)` conjuncts — each becomes a (key names,
    * subquery plan) pair the command executors turn into a JOIN-form
    * membership test ([[VersionedTable.deleteMatching]] /
    * [[VersionedTable.updateMatching]]) — plus the residual, in which
    * only uncorrelated SCALAR subqueries may remain (they materialize
    * at run time). Any other subquery shape (correlated, `NOT IN`,
    * EXISTS) refuses loudly: each would need a different
    * rewrite (a join with outer references / null-aware anti-join /
    * scalar materialization) and a silent approximation of their
    * semantics is worse than the refusal.
    */
  def extractInSubqueries(cond: Expression, op: String)
      : (Seq[(Seq[String], LogicalPlan)], Option[Expression]) = {
    val (ins, rest) = splitConjuncts(cond).partition {
      case InSubquery(values, l: ListQuery) =>
        l.outerAttrs.isEmpty &&
          values.forall(_.isInstanceOf[AttributeReference])
      case _ => false
    }
    rest.foreach(requireSupportedSubqueries(_, op))
    val keys = ins.collect {
      case InSubquery(values, l: ListQuery) =>
        values.map(_.asInstanceOf[AttributeReference].name) -> l.plan
    }
    (keys, rest.reduceOption(And))
  }

  /** Rebind a resolved expression by NAME so it re-resolves against the
    * executor's freshly-planned frame.
    */
  def rebound(e: Expression): Column =
    GraftSqlBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })

  /** Translate a resolved MERGE into the library's executors, or refuse
    * loudly naming the first unsupported part. Supported: `ON t.k = s.k`
    * (one same-named target/source column equality), any ordered mix of
    * `WHEN MATCHED [AND cond] THEN UPDATE SET * | DELETE`, and an
    * optional `WHEN NOT MATCHED [AND cond] THEN INSERT *` (star forms
    * arrive expanded to identity assignments by the analyzer). The
    * exact canonical upsert (one unconditional UPDATE SET * + one
    * unconditional INSERT *) keeps [[VersionedTable.merge]]'s
    * replace-matched-insert-rest fast path; every other shape runs
    * [[VersionedTable.mergeInto]]'s clause kernel — including
    * `WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE | UPDATE SET …`
    * (the table-sync idiom), EXPRESSION assignments in any UPDATE or
    * INSERT clause, applied column-wise (`SET amount = t.amount +
    * s.amount` is exact semantics, unassigned columns keep the
    * target's value), and `WITH SCHEMA EVOLUTION` (the analyzer routes
    * the source's new columns through alterTable's metadata-only
    * widening BEFORE this rule sees the plan). Still refused, with the
    * reason named: nested-field assignments and subquery conditions.
    */
  def translateMerge(m: MergeIntoTable, t: GraftV2Table): LogicalPlan = {
    def refuse(what: String): Nothing =
      throw new UnsupportedOperationException(
        s"MERGE INTO a graft table supports ON t.k = s.k with matched " +
          s"UPDATE SET \u2026/DELETE clauses, NOT MATCHED INSERT \u2026, and NOT " +
          s"MATCHED BY SOURCE UPDATE/DELETE — " +
          s"$what is not supported; use VersionedTable.merge/mergeInto " +
          "or explicit DELETE + INSERT")
    val sourceOut = m.sourceTable.outputSet
    val targetOut = m.targetTable.outputSet
    val key = m.mergeCondition match {
      case org.apache.spark.sql.catalyst.expressions.EqualTo(
          l: AttributeReference, r: AttributeReference)
          if l.name == r.name &&
            ((targetOut.contains(l) && sourceOut.contains(r)) ||
              (sourceOut.contains(l) && targetOut.contains(r))) => l.name
      case other =>
        refuse(s"the ON condition '${other.sql}' (need a single " +
          "equality between one same-named target and source column)")
    }
    // the canonical-upsert FAST PATH requires every assignment to be the
    // source's same-named column, checked structurally (exprId
    // membership — `SET amount = tg.amount` is NOT identity even though
    // the names match); anything else runs the clause kernel, which
    // applies assignments COLUMN-WISE, so target-referencing and
    // expression assignments are simply correct there
    def isIdentity(assigns: Seq[Assignment]): Boolean =
      assigns.forall { a =>
        (a.key, a.value) match {
          case (k: AttributeReference, v: AttributeReference) =>
            k.name == v.name && sourceOut.contains(v)
          case _ => false
        }
      }
    def namedAssigns(assigns: Seq[Assignment],
        qualify: Expression => Expression): Seq[(String, Column)] =
      assigns.map { a =>
        a.key match {
          case k: AttributeReference =>
            k.name -> GraftSqlBridge.column(qualify(a.value))
          case other => refuse(
            s"an assignment to a nested field (${other.sql})")
        }
      }
    // clause conditions re-resolve inside the kernel's two-alias join:
    // target attributes as `__t.<col>`, source attributes as `__s.<col>`
    def qualified(e: Expression): Expression = {
      requireNoSubquery(e, "MERGE")
      e.transform {
        case a: AttributeReference if targetOut.contains(a) =>
          UnresolvedAttribute(Seq("__t", a.name))
        case a: AttributeReference if sourceOut.contains(a) =>
          UnresolvedAttribute(Seq("__s", a.name))
        case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
      }
    }
    // conditions become Columns HERE (not Expression fields of the
    // command): a stored unresolved Expression would be traversed by
    // later analyzer batches (UpdateAttributeNullability calls exprId),
    // while a Column field is opaque to plan traversal
    val matched: Seq[(Option[Column], Boolean, Seq[(String, Column)])] =
      m.matchedActions.map {
        case u: UpdateAction =>
          (u.condition.map(c => GraftSqlBridge.column(qualified(c))),
            false, namedAssigns(u.assignments, qualified))
        case d: DeleteAction =>
          (d.condition.map(c => GraftSqlBridge.column(qualified(c))),
            true, Seq.empty[(String, Column)])
        case other => refuse(s"matched action $other")
      }
    val insert: Option[(Option[Column], Seq[(String, Column)])] =
      m.notMatchedActions match {
        case Seq() => None
        case Seq(i: InsertAction) =>
          // INSERT values reference the source only (SQL rule, analyzer
          // enforced); its condition too
          Some((i.condition.map(c => GraftSqlBridge.column(qualified(c))),
            namedAssigns(i.assignments, qualified)))
        case other => refuse(s"not-matched actions $other")
      }
    // NOT MATCHED BY SOURCE: clauses over target rows with no source
    // match — DELETE (the table-sync idiom) or UPDATE with TARGET-side
    // assignments (SQL forbids source references here; Spark's analyzer
    // enforces it, `qualified` maps what remains to `__t`)
    val bySource: Seq[(Option[Column], Boolean, Seq[(String, Column)])] =
      m.notMatchedBySourceActions.map {
        case u: UpdateAction =>
          val assigns = u.assignments.map { a =>
            a.key match {
              case k: AttributeReference =>
                k.name -> GraftSqlBridge.column(qualified(a.value))
              case other => refuse("a NOT MATCHED BY SOURCE assignment " +
                s"to a nested field (${other.sql})")
            }
          }
          (u.condition.map(c => GraftSqlBridge.column(qualified(c))),
            false, assigns)
        case d: DeleteAction =>
          (d.condition.map(c => GraftSqlBridge.column(qualified(c))),
            true, Seq.empty[(String, Column)])
        case other => refuse(s"not-matched-by-source action $other")
      }
    val canonical = bySource.isEmpty && (m.matchedActions match {
      case Seq(u: UpdateAction) => u.condition.isEmpty &&
        isIdentity(u.assignments)
      case _ => false
    }) && (m.notMatchedActions match {
      case Seq(i: InsertAction) => i.condition.isEmpty &&
        isIdentity(i.assignments)
      case _ => false
    })
    if (canonical)
      GraftMergeCommand(t.tableDir, t.specString, key, m.sourceTable)
    else
      GraftMergeClausesCommand(t.tableDir, t.specString, key, matched,
        insert, bySource, m.sourceTable)
  }
}

/** `DELETE FROM graft.`dir`` WHERE cond — the reference's deletion job
  * as one statement; runs [[VersionedTable.delete]]'s COW kernel.
  */
case class GraftDeleteCommand(tableDir: String, spec: String,
    cond: Expression) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    VersionedTable.delete(spark, tableDir, spec,
      GraftDml.rebound(GraftDml.resolveScalars(spark, cond)))
    Seq.empty
  }
}

/** `DELETE FROM graft.`dir`` WHERE k IN (SELECT …) [AND …]` — the GDPR
  * id-list delete as one statement. Each subquery materializes at run
  * time and the membership test executes as a JOIN inside
  * [[VersionedTable.deleteMatching]]'s COW kernel; nothing key-set-sized
  * is ever collected to the driver.
  */
case class GraftDeleteMatchingCommand(tableDir: String, spec: String,
    keys: Seq[(Seq[String], LogicalPlan)], residual: Option[Expression])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    // the kernel reads each key frame up to three times (affected-tuple
    // probe, foreign-leaf discovery, survivor rewrite) — persist for the
    // command's duration so the subquery runs once, not per action
    val frames = keys.map { case (k, plan) =>
      k -> GraftSqlBridge.ofRows(spark, plan).toDF(k: _*).persist()
    }
    try VersionedTable.deleteMatching(spark, tableDir, spec, frames,
      residual.map(r => GraftDml.rebound(GraftDml.resolveScalars(spark, r))))
    finally frames.foreach(_._2.unpersist(blocking = false))
    Seq.empty
  }
}

/** `UPDATE graft.`dir`` SET … WHERE k IN (SELECT …) [AND …]` →
  * [[VersionedTable.updateMatching]] — same JOIN-form membership as
  * [[GraftDeleteMatchingCommand]].
  */
case class GraftUpdateMatchingCommand(tableDir: String, spec: String,
    assignments: Seq[(String, Expression)],
    keys: Seq[(Seq[String], LogicalPlan)], residual: Option[Expression])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    // persisted for the same probe/discover/rewrite reuse as the
    // delete-matching command
    val frames = keys.map { case (k, plan) =>
      k -> GraftSqlBridge.ofRows(spark, plan).toDF(k: _*).persist()
    }
    try VersionedTable.updateMatching(spark, tableDir, spec, frames,
      residual.map(r => GraftDml.rebound(GraftDml.resolveScalars(spark, r))),
      assignments.map { case (n, e) =>
        n -> GraftDml.rebound(GraftDml.resolveScalars(spark, e))
      })
    finally frames.foreach(_._2.unpersist(blocking = false))
    Seq.empty
  }
}

/** `UPDATE graft.`dir`` SET … WHERE cond` → [[VersionedTable.update]]. */
case class GraftUpdateCommand(tableDir: String, spec: String,
    assignments: Seq[(String, Expression)], cond: Expression)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    VersionedTable.update(spark, tableDir, spec,
      GraftDml.rebound(GraftDml.resolveScalars(spark, cond)),
      assignments.map { case (n, e) =>
        n -> GraftDml.rebound(GraftDml.resolveScalars(spark, e))
      })
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

/** Clause-form `MERGE INTO` (matched UPDATE/DELETE with optional
  * conditions, optional conditional INSERT, optional NOT MATCHED BY
  * SOURCE UPDATE/DELETE) → [[VersionedTable.mergeInto]]. Conditions and
  * by-source assignment values arrive pre-rebound to
  * `__t.<col>`/`__s.<col>` and re-resolve inside the kernel's join.
  */
case class GraftMergeClausesCommand(tableDir: String, spec: String,
    keyCol: String,
    matched: Seq[(Option[Column], Boolean, Seq[(String, Column)])],
    insert: Option[(Option[Column], Seq[(String, Column)])],
    bySource: Seq[(Option[Column], Boolean, Seq[(String, Column)])],
    source: LogicalPlan)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val batch = GraftSqlBridge.ofRows(spark, source)
    VersionedTable.mergeInto(batch, tableDir, spec, keyCol, matched,
      insert, bySource)
    Seq.empty
  }
}
