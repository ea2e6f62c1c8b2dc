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
    // count(*) GROUP BY <partition column>: per-value sidecar sums
    case agg @ Aggregate(Seq(g: AttributeReference), aggExprs, child, _) =>
      underlyingIndex(child) match {
        case Some((idx, schema)) =>
          groupedCount(agg, g, aggExprs, idx, schema).getOrElse(agg)
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

  /** Leaf (value, rows) pairs at the partition LEVEL named `colName`,
    * usable for value-exact rewrites: every file covered, the level
    * present exactly once in every leaf with no null-partition sentinel
    * (the index refuses those), AND the column is a STRING in the
    * schema — the leaf dir value then IS the column value (identity
    * decode), so per-leaf predicate evaluation and group keys are
    * exact, not approximations. Works at ANY level of a multi-column
    * spec: `GROUP BY region` and `GROUP BY day` both rewrite on a
    * (region, day)-nested table.
    */
  private def leafValuesAt(idx: ManifestFileIndex, schema: StructType,
      colName: String): Option[Seq[(String, Long)]] =
    if (!schema.fields.exists(f =>
        f.name == colName && f.dataType == StringType)) None
    else idx.metaLeafValuesAt(colName)

  private def filteredCount(agg: Aggregate, exprs: Seq[NamedExpression],
      cond: Expression, idx: ManifestFileIndex, schema: StructType)
      : Option[LogicalPlan] = {
    if (!cond.deterministic || cond.references.isEmpty ||
        !cond.references.forall(r =>
          schema.fields.exists(f => f.name == r.name &&
            f.dataType == StringType))) return None
    // the predicate must reference exactly ONE column, and that column
    // must be a uniform partition level of the relation
    val pcol = cond.references.map(_.name).toSeq.distinct match {
      case Seq(one) => one
      case _ => return None
    }
    leafValuesAt(idx, schema, pcol).flatMap { _ =>
      try {
        // the value is constant across a leaf's rows, so the filter
        // keeps the whole leaf iff the predicate is definite TRUE at it
        // (null excludes, exactly like row-level filter semantics)
        val keepValue: String => Boolean = v =>
          java.lang.Boolean.TRUE.equals(
            cond.transform {
              case a: AttributeReference if a.name == pcol =>
                Literal(UTF8String.fromString(v), StringType)
            }.eval(InternalRow.empty))
        def statsWhere(a: AttributeReference) =
          if (schema.fields.exists(f => f.name == a.name &&
              f.dataType == a.dataType && FileStats.supported(f.dataType)))
            idx.metaColStatsWhereAt(pcol, keepValue, a.name, a.dataType)
          else None
        val values: Seq[Option[Any]] = exprs.map {
          case Alias(ae: AggregateExpression, _)
              if !ae.isDistinct && ae.filter.isEmpty =>
            ae.aggregateFunction match {
              case Count(Seq(Literal(v, _))) if v != null =>
                idx.metaRowCountWhereAt(pcol, keepValue)
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
  }

  private def groupedCount(agg: Aggregate, g: AttributeReference,
      exprs: Seq[NamedExpression], idx: ManifestFileIndex,
      schema: StructType): Option[LogicalPlan] =
    leafValuesAt(idx, schema, g.name).flatMap { leaves =>
      {
        val pcol = g.name
        def statsW(a: AttributeReference, keep: String => Boolean) =
          if (schema.fields.exists(f => f.name == a.name &&
              f.dataType == a.dataType && FileStats.supported(f.dataType)))
            idx.metaColStatsWhereAt(pcol, keep, a.name, a.dataType)
          else None
        val values = leaves.map(_._1).distinct.sorted
        values.foldLeft(Option(Vector.empty[InternalRow])) {
          case (None, _) => None
          case (Some(acc), v) =>
            val keep = (x: String) => x == v
            idx.metaRowCountWhereAt(pcol, keep) match {
              case None => None
              // a zero-row value produces no group under a real scan
              // (countMeta's rule) — drop exact zeros to match
              case Some(0L) => Some(acc)
              case Some(total) =>
                val cells: Seq[Option[Any]] = exprs.map {
                  case a: AttributeReference if a.name == pcol =>
                    Some(UTF8String.fromString(v))
                  case Alias(a: AttributeReference, _) if a.name == pcol =>
                    Some(UTF8String.fromString(v))
                  case Alias(ae: AggregateExpression, _)
                      if !ae.isDistinct && ae.filter.isEmpty =>
                    ae.aggregateFunction match {
                      case Count(Seq(Literal(x, _))) if x != null =>
                        Some(total)
                      case Count(Seq(a: AttributeReference)) =>
                        statsW(a, keep).flatMap { case (_, _, nulls, rows) =>
                          nulls.map(rows - _)
                        }
                      case Min(a: AttributeReference) if minMaxSafe(a.dataType) =>
                        statsW(a, keep).map { case (mn, _, _, _) =>
                          mn.map(decode(_, a.dataType)).orNull
                        }
                      case Max(a: AttributeReference) if minMaxSafe(a.dataType) =>
                        statsW(a, keep).map { case (_, mx, _, _) =>
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
