package org.apache.spark.sql.graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
import org.apache.spark.sql.execution.datasources.DataSource
import org.apache.spark.sql.execution.streaming.runtime.StreamingRelation

import graft.sources.GraftV2Table

/** `spark.readStream.table("graft.`dir`")` — the streaming twin of
  * `graft.plans.GraftV2ReadRule`: a [[StreamingRelationV2]] over a
  * graft catalog table rewrites to the V1 `graft-snapshot` streaming
  * relation (versions-as-offsets change source), output attribute ids
  * preserved via aliases. The V2 table deliberately does NOT implement
  * `MicroBatchStream`: the change engine computes each batch as a
  * manifest-diff DataFrame (pruned scans, MOR anti-joins), a shape the
  * V2 InputPartition contract cannot wrap — the V1 `Source` is the
  * honest home for it, and this rule gives the catalog identifier the
  * same behavior as `spark.readStream.format("graft-snapshot")`.
  *
  * Reader options pass through (`startingVersion`, `ignoreChanges`).
  * `readChangeFeed=true` through the identifier WIDENS the output: the
  * table's own columns keep their resolved attribute ids (aliases, as
  * in the plain rewrite) and the V1 CDF source's `_change_type` /
  * `_commit_version` attributes append after them — a Delta user's
  * `readStream.option("readChangeFeed", true).table("graft.db.t")`
  * sees exactly the `format("graft-snapshot")` CDF schema. The widening
  * is safe where this rule runs (resolution of the bare relation —
  * `readStream.table(…)` analyzes before any downstream operator
  * exists to hold stale references); if a table column fails to line
  * up by name+type, the rewrite falls back to the RAW V1 relation
  * (fresh ids, loud-if-referenced) rather than dropping CDF columns.
  * Time-traveled tables refuse: a stream tails the live table.
  *
  * Lives under `org.apache.spark.sql` because [[StreamingRelationV2]],
  * [[StreamingRelation]] and [[DataSource]] are `private[sql]` — the
  * same bridge pattern as [[GraftStreamingBridge]]; nothing else of
  * Spark's internals is touched.
  */
class GraftStreamingReadRule(session: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case s: StreamingRelationV2 if s.table.isInstanceOf[GraftV2Table] =>
      val t = s.table.asInstanceOf[GraftV2Table]
      if (t.pinnedVersion.isDefined)
        throw new UnsupportedOperationException(
          "streaming a time-traveled graft table is not supported — a " +
            "stream tails the LIVE table; use startingVersion to begin " +
            "at a historical version")
      val opts = s.extraOptions.asScala.toMap
      val cdf = opts.exists { case (k, v) =>
        k.equalsIgnoreCase("readChangeFeed") && v.trim.toBoolean }
      val ds = DataSource(
        session.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
        className = "graft-snapshot",
        options = opts + ("path" -> t.tableDir))
      val v1 = StreamingRelation(ds)
      val byName = v1.output.map(a => a.name -> a).toMap
      val aliases = s.output.map { old =>
        byName.get(old.name).filter(_.dataType == old.dataType)
          .map(a => Alias(a, old.name)(exprId = old.exprId))
      }
      if (aliases.exists(_.isEmpty)) { if (cdf) v1 else s }
      else if (cdf) {
        // CDF widening: table columns under their resolved ids, the
        // source's extra (_change_type/_commit_version) attributes
        // appended verbatim after them
        val mapped = s.output.map(_.name).toSet
        Project(aliases.map(_.get) ++
          v1.output.filterNot(a => mapped.contains(a.name)), v1)
      } else Project(aliases.map(_.get), v1)
  }
}
