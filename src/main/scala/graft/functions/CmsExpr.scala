package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sketch.CountMin

/** Count-min sketch as a first-class Catalyst AGGREGATE —
  * `graft_cms_sketch(key [, depth, width])` → binary sketch.
  *
  * This is the SQL/DataFrame surface of the same [[graft.sketch.CountMin]]
  * the streaming pipeline keeps in flatMapGroupsWithState: a mergeable,
  * bounded-size frequency summary. As a `TypedImperativeAggregate` it runs
  * the standard two-phase plan — per-partition partial sketches, one
  * shuffled merge per group — so a frequency profile of 10^12 rows moves
  * `groups × sketchBytes` through the shuffle instead of `distinct keys`
  * rows: exactly the count-min trade (Cormode & Muthukrishnan 2005) a
  * 100 TB profiling pass needs. Estimates (≥ true count, exact while the
  * sketch tracks ≤ [[CountMin.MaxTrackedKeys]] distinct keys) are read back
  * with [[CmsEstExpr graft_cms_est]].
  */
final case class CmsAggExpr(
    child: Expression, depth: Int, width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMin] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cms_sketch needs a string key column, got ${child.dataType}")

  override def createAggregationBuffer(): CountMin = CountMin.empty(depth, width)

  override def update(b: CountMin, row: InternalRow): CountMin = {
    val v = child.eval(row)
    if (v != null) b.add(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: CountMin, other: CountMin): CountMin = b.merge(other)

  override def eval(b: CountMin): Any = CountMin.toBytes(b)

  override def serialize(b: CountMin): Array[Byte] = CountMin.toBytes(b)
  override def deserialize(bytes: Array[Byte]): CountMin = CountMin.fromBytes(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false // an empty group is a valid empty sketch
  override def prettyName: String = "graft_cms_sketch"

  override def withNewMutableAggBufferOffset(n: Int): CmsAggExpr =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CmsAggExpr =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): CmsAggExpr =
    copy(child = newChild)
}

/** `graft_cms_est(sketch, key)` → long: the count-min point estimate of
  * `key` in a [[CmsAggExpr]] result. Codegen via the [[CmsKernel]] static
  * (same forwarder discipline as [[ShinglesKernel]]). Deserializes the
  * sketch per row — fine where it is used (estimate reads run over
  * aggregated outputs, whose cardinality is `groups`, not input rows). */
final case class CmsEstExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cms_est(sketch binary, key string); got " +
        s"(${left.dataType}, ${right.dataType})")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_est"

  override def nullSafeEval(sk: Any, key: Any): Any =
    CmsKernel.est(sk.asInstanceOf[Array[Byte]], key.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, k) => s"graft.functions.CmsKernel.est($s, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstExpr =
    copy(left = newLeft, right = newRight)
}

/** Row kernel for [[CmsEstExpr]] — top-level object with no companion class
  * so the static forwarder exists for Janino (round-2 ADVICE lesson). */
object CmsKernel {
  def est(sketch: Array[Byte], key: UTF8String): Long =
    CountMin.fromBytes(sketch).estimate(key.toString)
}

object CmsAggExpr {
  /** Column form: `cmsSketch(col)` aggregate for the DataFrame API. */
  def cmsSketch(key: Column, depth: Int = 4, width: Int = 8192): Column =
    GraftColumnBridge.column(
      CmsAggExpr(GraftColumnBridge.expression(key), depth, width)
        .toAggregateExpression())

  def cmsEst(sketch: Column, key: Column): Column =
    GraftColumnBridge.column(CmsEstExpr(
      GraftColumnBridge.expression(sketch), GraftColumnBridge.expression(key)))

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"graft_cms_sketch: $what must be an integer literal, got $other")
  }

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cms_sketch"),
    new ExpressionInfo(classOf[CmsAggExpr].getName, "graft_cms_sketch"),
    { args =>
      args.length match {
        case 1 => CmsAggExpr(args.head, 4, 8192)
        case 3 => CmsAggExpr(args.head,
          intLit(args(1), "depth"), intLit(args(2), "width"))
        case _ => throw new IllegalArgumentException(
          "graft_cms_sketch(key [, depth, width])")
      }
    })

  val estRegistration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cms_est"),
    new ExpressionInfo(classOf[CmsEstExpr].getName, "graft_cms_est"),
    { args =>
      require(args.length == 2, "graft_cms_est(sketch, key) takes two arguments")
      CmsEstExpr(args.head, args(1))
    })
}
