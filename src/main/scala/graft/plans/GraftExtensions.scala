package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CosineSimilarity, EqualComponentCount}

/** SparkSessionExtensions entry point for the engine's native Catalyst
  * surface — activate with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (set by
  * GraftSession/Verify/Bench builders).
  *
  * Currently injects:
  *   - `graft_cosine(array<double>, array<double>) -> double` —
  *     whole-stage-codegen cosine similarity ([[CosineSimilarity]]);
  *   - `graft_eqcount(array<bigint>, array<bigint>) -> bigint` —
  *     positional component-equality count ([[EqualComponentCount]]).
  *  Both callable from SQL text and via `functions.call_function`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private type Expr = org.apache.spark.sql.catalyst.expressions.Expression

  private def binary(name: String, cls: Class[_], make: (Expr, Expr) => Expr) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(cls.getName, name),
    (children: Seq[Expr]) => {
      require(children.size == 2, s"$name takes exactly 2 arguments")
      make(children.head, children(1))
    })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(binary("graft_cosine", classOf[CosineSimilarity],
      CosineSimilarity(_, _)))
    ext.injectFunction(binary("graft_eqcount", classOf[EqualComponentCount],
      EqualComponentCount(_, _)))
    // count(*)/min/max/count(col) over a bare snapshot relation answer
    // from the footer-stats sidecars — a one-row LocalRelation instead
    // of a scan; falls back untouched whenever coverage is incomplete
    ext.injectOptimizerRule(_ => MetaAggregateRule)
    // DELETE FROM / UPDATE / MERGE INTO over graft.`dir` catalog tables
    // route to the library's copy-on-write executors (see GraftDmlRule)
    ext.injectPostHocResolutionRule(session => new GraftDmlRule(session))
    // AFTER the DML rule: every remaining (pure-read) V2 relation over a
    // graft table swaps to the vectorized V1 LogicalRelation — catalog
    // SELECTs plan FileSourceScanExec inside WholeStageCodegen instead
    // of the per-row V1Scan conversion (see GraftV2ReadRule)
    ext.injectPostHocResolutionRule(session => new GraftV2ReadRule(session))
    // readStream.table("graft.`dir`") → the V1 versions-as-offsets
    // change source (see GraftStreamingReadRule)
    ext.injectPostHocResolutionRule(session =>
      new org.apache.spark.sql.graft.GraftStreamingReadRule(session))
    // the Delta-style maintenance STATEMENTS (VACUUM / OPTIMIZE /
    // DESCRIBE HISTORY on graft.`dir`); everything else falls through
    // to Spark's parser verbatim (see GraftSqlParser)
    ext.injectParser((session, delegate) =>
      new GraftSqlParser(session, delegate))
    // SQL INSERT INTO/OVERWRITE against a registered graft-snapshot table
    // resolves to InsertIntoHadoopFsRelationCommand, which writes files
    // into the table dir OUTSIDE any manifest — committed-looking,
    // invisible to every read; the OVERWRITE form even deletes the
    // output dir before writing. Refusing here, at ANALYSIS, fires
    // before the command's destructive run(); the connector's
    // write-refusing ParquetFileFormat is the extension-less backstop
    // (it fires after OVERWRITE's deletion, hence this rule is primary).
    ext.injectCheckRule(_ => plan => plan.foreach {
      case c: org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand
          if c.fileIndex.exists(_.isInstanceOf[graft.sources.ManifestFileIndex]) =>
        throw new UnsupportedOperationException(
          graft.sources.SnapshotConnector.InsertRefusal)
      case _ => ()
    })
  }
}
