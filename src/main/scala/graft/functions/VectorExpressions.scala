package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression for the embedding-similarity hot path.
  *
  * The higher-order-function formulation (VectorFns.hofDot:
  * aggregate(zip_with(...))) is evaluated via interpreted lambda
  * dispatch per element — for an all-pairs similarity join scoring
  * millions of 64-dim pairs that interpretation dominates the runtime.
  * This expression emits a tight Java loop inside WholeStageCodegen
  * instead. Accumulation is double, in element order — IEEE-identical
  * to the HOF form and to the DuckDB oracle's ordered-unnest sum.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    children.map(_.dataType) match {
      case Seq(ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects two array<float> arguments, got $other")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Registration plumbing for graft's native expressions — via
  * SparkSessionExtensions (spark.sql.extensions=graft.functions.
  * GraftExtensions) or imperatively for an already-built session.
  */
object GraftFunctions {
  type Builder = Seq[Expression] => Expression

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (cs: Seq[Expression]) => DotProduct(cs(0), cs(1))),
    TopKAggregate.registration,
    // Spark's bloom-filter expressions exist but are NOT in the public
    // function registry (they back the optimizer's injected runtime
    // filters); exposing them under graft names makes the semi-join
    // reduction pattern (Relational.bloomSemiJoin) first-class
    (FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (cs: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          cs(0), cs(1), cs(2))),
    (FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (cs: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          cs(0), cs(1))))

  private val registered =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Idempotent per-session registration (temp-function registry).
    * The membership check lives INSIDE the lock: the backing
    * WeakHashMap-set is not safe to read while another thread
    * mutates it. */
  def register(spark: SparkSession): Unit = synchronized {
    if (!registered.contains(spark)) {
      functions.foreach { case (id, info, builder) =>
        spark.sessionState.functionRegistry
          .registerFunction(id, info, builder)
      }
      registered.add(spark)
      ()
    }
  }
}

/** spark.sql.extensions entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach(ext.injectFunction)
}
