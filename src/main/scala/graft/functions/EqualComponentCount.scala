package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen count of positionally-equal components of two long
  * arrays — the MinHash signature-agreement kernel
  * (est_jaccard = graft_eqcount(sig_a, sig_b) / numPerms), replacing an
  * interpreted `size(filter(zip_with(...)))` chain on every candidate pair.
  *
  * Semantics mirror the zip_with form exactly: null arrays and length
  * mismatches yield NULL (zip_with pads with null); a null ELEMENT simply
  * does not count as equal (when(x === y, 1).otherwise(0) sends null
  * comparisons to 0). Registered as SQL function `graft_eqcount` by
  * [[graft.plans.GraftExtensions]].
  */
case class EqualComponentCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_eqcount requires two array<bigint> arguments, got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_eqcount"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var eq = 0L; var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i)) eq += 1
      i += 1
    }
    eq
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val eq = ctx.freshName("eq"); val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $eq = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i) && !$b.isNullAt($i) &&
         |        $a.getLong($i) == $b.getLong($i)) $eq++;
         |  }
         |  ${ev.value} = $eq;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EqualComponentCount =
    copy(left = newLeft, right = newRight)
}
