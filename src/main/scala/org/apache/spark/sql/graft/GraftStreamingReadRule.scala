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
  * `readChangeFeed` REFUSES here by name: the CDF adds
  * `_change_type`/`_commit_version` columns the catalog-resolved
  * relation's schema cannot carry (resolution fixed the output before
  * options could widen it) — the `format("graft-snapshot")` spelling
  * supports it with the right schema. Time-traveled tables refuse:
  * a stream tails the live table.
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
      if (opts.exists { case (k, v) =>
          k.equalsIgnoreCase("readChangeFeed") && v.trim.toBoolean })
        throw new UnsupportedOperationException(
          "readChangeFeed through the catalog identifier is not " +
            "supported — the CDF columns (_change_type, " +
            "_commit_version) cannot extend the already-resolved table " +
            "schema; use spark.readStream.format(\"graft-snapshot\")" +
            ".option(\"readChangeFeed\", true).load(dir)")
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
      if (aliases.exists(_.isEmpty)) s
      else Project(aliases.map(_.get), v1)
  }
}
