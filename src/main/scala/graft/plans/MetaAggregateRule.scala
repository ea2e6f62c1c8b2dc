package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{FileStats, ManifestFileIndex}

/** METADATA-ONLY AGGREGATES through the SQL surface — the optimizer
  * rewrite Delta/Iceberg apply to `SELECT count(*) / min / max / count
  * (col) FROM table`: when the whole answer is already in the
  * footer-stats sidecars, replace the Aggregate-over-scan with a
  * one-row [[LocalRelation]] and read NOTHING. At 100 TB this turns the
  * most common health-check queries from a full-table scan into a
  * driver-side sidecar fold.
  *
  * Soundness is delegated to [[ManifestFileIndex.metaRowCount]] /
  * [[ManifestFileIndex.metaColStats]], which return None the moment any
  * live file lacks coverage — the rule then leaves the plan UNTOUCHED
  * (an optimizer rewrite must fall back, never fail). The rewrite only
  * fires on a GLOBAL aggregate directly over a bare (column-pruning
  * Project at most) manifest relation: any Filter, join, grouping,
  * DISTINCT or FILTER clause keeps the scan, and a table with pending
  * delete vectors never presents a bare relation in the first place
  * (its reads are anti-join plans), so vector-deleted rows can never
  * leak into a metadata answer. The answer matches the relation's OWN
  * leaf list — time-travel relations get their version's numbers, not
  * the head's.
  */
object MetaAggregateRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(groupingExprs, aggExprs, child, _)
        if groupingExprs.isEmpty =>
      stripProjects(child) match {
        // count(*) WHERE <partition-column predicate>: evaluate the
        // predicate once per leaf value, fold matching leaves' rows
        case org.apache.spark.sql.catalyst.plans.logical.Filter(cond, fc) =>
          underlyingIndex(fc) match {
            case Some((idx, schema)) =>
              filteredCount(agg, aggExprs, cond, idx, schema).getOrElse(agg)
            case None => agg
          }
        case other =>
          underlyingIndex(other) match {
            case Some((idx, schema)) =>
              rewrite(agg, aggExprs, idx, schema).getOrElse(agg)
            case None => agg
          }
      }
    // count(*) GROUP BY <partition column(s)>: per-tuple sidecar sums —
    // `GROUP BY region, day` rewrites on a (region, day)-nested table
    // exactly like the single-level forms
    case agg @ Aggregate(gexprs, aggExprs, child, _)
        if gexprs.nonEmpty &&
          gexprs.forall(_.isInstanceOf[AttributeReference]) =>
      underlyingIndex(child) match {
        case Some((idx, schema)) =>
          groupedCount(agg,
            gexprs.map(_.asInstanceOf[AttributeReference]),
            aggExprs, idx, schema).getOrElse(agg)
        case None => agg
      }
  }

  /** Column-pruning Projects are transparent to the rewrite. */
  private def stripProjects(plan: LogicalPlan): LogicalPlan = plan match {
    case Project(projectList, child)
        if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      stripProjects(child)
    case p => p
  }

  private def filteredCount(agg: Aggregate, exprs: Seq[NamedExpression],
      cond: Expression, idx: ManifestFileIndex, schema: StructType)
      : Option[LogicalPlan] = {
    if (!cond.deterministic || cond.references.isEmpty ||
        !cond.references.forall(r =>
          schema.fields.exists(f => f.name == r.name &&
            f.dataType == StringType))) return None
    // EVERY referenced column must be a uniform partition level of the
    // relation — the tuple fold below refuses otherwise (a
    // non-partition conjunct keeps the scan). One column is the common
    // case; a conjunction over several levels of a multi-column spec
    // binds each level to the leaf's value at it.
    val pcols: Seq[String] =
      cond.collect { case a: AttributeReference => a.name }.distinct
    try {
      // values are constant across a leaf's rows, so the filter keeps
      // the whole leaf iff the predicate is definite TRUE with every
      // referenced level bound to the leaf's value at it (null
      // excludes, exactly like row-level filter semantics)
      val keepTuple: Seq[String] => Boolean = t => {
        val bind = pcols.zip(t).toMap
        java.lang.Boolean.TRUE.equals(
          cond.transform {
            case a: AttributeReference if bind.contains(a.name) =>
              Literal(UTF8String.fromString(bind(a.name)), StringType)
          }.eval(InternalRow.empty))
      }
      def statsWhere(a: AttributeReference) =
        if (schema.fields.exists(f => f.name == a.name &&
            f.dataType == a.dataType && FileStats.supported(f.dataType)))
          idx.metaColStatsWhereTuple(pcols, keepTuple, a.name, a.dataType)
        else None
      val values: Seq[Option[Any]] = exprs.map {
        case Alias(ae: AggregateExpression, _)
            if !ae.isDistinct && ae.filter.isEmpty =>
          ae.aggregateFunction match {
            case Count(Seq(Literal(v, _))) if v != null =>
              idx.metaRowCountWhereTuple(pcols, keepTuple)
            case Count(Seq(a: AttributeReference)) =>
              // needs a KNOWN null count — unknown (footer unset) refuses
              statsWhere(a).flatMap { case (_, _, nulls, rows) =>
                nulls.map(rows - _)
              }
            case Min(a: AttributeReference) if minMaxSafe(a.dataType) =>
              statsWhere(a).map { case (mn, _, _, _) =>
                mn.map(decode(_, a.dataType)).orNull
              }
            case Max(a: AttributeReference) if minMaxSafe(a.dataType) =>
              statsWhere(a).map { case (_, mx, _, _) =>
                mx.map(decode(_, a.dataType)).orNull
              }
            case _ => None
          }
        case _ => None
      }
      if (values.exists(_.isEmpty)) None
      else Some(LocalRelation(agg.output,
        Seq(InternalRow.fromSeq(values.map(_.get)))))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** GROUP BY one or more partition levels. Group keys must all be
    * STRING columns in the schema — the leaf dir value then IS the
    * column value (identity decode), so group keys are exact, not
    * approximations; the index refuses (None) unless every leaf binds
    * every named level (foreign spec, sentinel, mixed depths all keep
    * the scan). ONE index pass per needed quantity: counts for all
    * groups come from a single fold, and each referenced column's
    * per-tuple stats from one more — a per-value rescan of every leaf
    * would be O(values × leaves), a 10⁸-step driver loop at a
    * 10k-partition table.
    */
  private def groupedCount(agg: Aggregate, gs: Seq[AttributeReference],
      exprs: Seq[NamedExpression], idx: ManifestFileIndex,
      schema: StructType): Option[LogicalPlan] = {
    val gcols = gs.map(_.name).distinct
    if (!gcols.forall(c => schema.fields.exists(f =>
        f.name == c && f.dataType == StringType))) None
    else idx.metaRowCountsByTupleAt(gcols).flatMap { counts =>
      val statsCache = scala.collection.mutable.Map.empty[String,
        Option[Map[Seq[String], Option[(Option[String], Option[String],
          Option[Long], Long)]]]]
      def statsW(a: AttributeReference, t: Seq[String]) =
        if (schema.fields.exists(f => f.name == a.name &&
            f.dataType == a.dataType && FileStats.supported(f.dataType)))
          statsCache.getOrElseUpdate(a.name,
            idx.metaColStatsByTupleAt(gcols, a.name, a.dataType))
            .flatMap(_.getOrElse(t, None))
        else None
      val tuples = counts.keys.toSeq.sortBy(_.mkString("\u0000"))
      tuples.foldLeft(Option(Vector.empty[InternalRow])) {
        case (None, _) => None
        case (Some(acc), t) =>
          val bind = gcols.zip(t).toMap
          counts(t) match {
            // a zero-row tuple produces no group under a real scan
            // (countMeta's rule) — drop exact zeros to match
            case 0L => Some(acc)
            case total =>
              val cells: Seq[Option[Any]] = exprs.map {
                case a: AttributeReference if bind.contains(a.name) =>
                  Some(UTF8String.fromString(bind(a.name)))
                case Alias(a: AttributeReference, _)
                    if bind.contains(a.name) =>
                  Some(UTF8String.fromString(bind(a.name)))
                case Alias(ae: AggregateExpression, _)
                    if !ae.isDistinct && ae.filter.isEmpty =>
                  ae.aggregateFunction match {
                    case Count(Seq(Literal(x, _))) if x != null =>
                      Some(total)
                    case Count(Seq(a: AttributeReference)) =>
                      statsW(a, t).flatMap { case (_, _, nulls, rows) =>
                        nulls.map(rows - _)
                      }
                    case Min(a: AttributeReference)
                        if minMaxSafe(a.dataType) =>
                      statsW(a, t).map { case (mn, _, _, _) =>
                        mn.map(decode(_, a.dataType)).orNull
                      }
                    case Max(a: AttributeReference)
                        if minMaxSafe(a.dataType) =>
                      statsW(a, t).map { case (_, mx, _, _) =>
                        mx.map(decode(_, a.dataType)).orNull
                      }
                    case _ => None
                  }
                case _ => None
              }
              if (cells.exists(_.isEmpty)) None
              else Some(acc :+ InternalRow.fromSeq(cells.map(_.get)))
          }
      }.map(rows => LocalRelation(agg.output, rows))
    }
  }

  /** The manifest index under a bare relation, looking through
    * column-pruning Projects only — anything else (Filter, Join, …)
    * changes the row set and disqualifies the rewrite.
    */
  private def underlyingIndex(plan: LogicalPlan)
      : Option[(ManifestFileIndex, StructType)] = plan match {
    case Project(projectList, child)
        if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      underlyingIndex(child)
    case lr: LogicalRelation if !lr.isStreaming =>
      lr.relation match {
        case h: HadoopFsRelation => h.location match {
          case m: ManifestFileIndex => Some((m, h.dataSchema))
          case _ => None
        }
        case _ => None
      }
    case _ => None
  }

  /** min/max rewrites exclude float/double even though their sidecar
    * stats exist (NaN ordering — see [[FileStats.minMaxSafe]], the
    * shared exclusion every min/max-proof consumer applies). Counts
    * (rows, nulls) stay safe for every supported type.
    */
  private def minMaxSafe(dt: DataType): Boolean = FileStats.minMaxSafe(dt)

  private def rewrite(agg: Aggregate, exprs: Seq[NamedExpression],
      idx: ManifestFileIndex, schema: StructType): Option[LogicalPlan] = {
    def stats(a: AttributeReference) =
      if (schema.fields.exists(f => f.name == a.name &&
          f.dataType == a.dataType && FileStats.supported(f.dataType)))
        idx.metaColStats(a.name, a.dataType)
      else None
    val values: Seq[Option[Any]] = exprs.map {
      case Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(Literal(v, _))) if v != null => idx.metaRowCount
          case Count(Seq(a: AttributeReference)) =>
            stats(a).flatMap { case (_, _, nulls, rows) =>
              nulls.map(rows - _)
            }
          case Min(a: AttributeReference) if minMaxSafe(a.dataType) =>
            stats(a).map { case (mn, _, _, _) =>
              mn.map(decode(_, a.dataType)).orNull
            }
          case Max(a: AttributeReference) if minMaxSafe(a.dataType) =>
            stats(a).map { case (_, mx, _, _) =>
              mx.map(decode(_, a.dataType)).orNull
            }
          case _ => None
        }
      case _ => None
    }
    if (values.exists(_.isEmpty)) None
    else Some(LocalRelation(agg.output,
      Seq(InternalRow.fromSeq(values.map(_.get)))))
  }

  /** Rendered sidecar value → Catalyst internal value. */
  private def decode(v: String, dt: DataType): Any = dt match {
    case ByteType    => v.toByte
    case ShortType   => v.toShort
    case IntegerType => v.toInt
    case LongType    => v.toLong
    case FloatType   => v.toFloat
    case DoubleType  => v.toDouble
    case BooleanType => v.toBoolean
    case StringType  => UTF8String.fromString(v)
    case other => throw new IllegalStateException(
      s"metadata aggregate over unsupported type $other") // unreachable:
      // FileStats.supported gates the column before decode
  }
}
