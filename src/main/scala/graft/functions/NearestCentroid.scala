package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: index of the nearest centroid (squared
  * L2) for a numeric array, with the centroid matrix embedded as a
  * reference object in the generated code.
  *
  * `nearest_centroid(v)` → int: argmin_c Σ_d (v_d − cents_c_d)², ties
  * broken toward the LOWER index (strict `<` keeps the first minimum).
  * Vectors shorter/longer than a centroid row compare over the shorter
  * length (callers must pre-validate homogeneous dims, as elsewhere).
  *
  * Why an Expression rather than a UDF (VERDICT r03 finding 3): the
  * previous `ivfAssign` UDF deserialized every embedding into a boxed
  * `Seq[Float]` on the full corpus — the one remaining hot-path UDF.
  * This kernel runs inside whole-stage codegen on Tungsten `ArrayData`
  * (same pattern as [[CosineSim]]); the IVF assignment becomes a pure
  * map stage.
  */
case class NearestCentroid(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {

  private def elemCode(dt: DataType): Int = dt match {
    case ArrayType(DoubleType, _) => 0
    case ArrayType(FloatType, _) => 1
    case ArrayType(LongType, _) => 2
    case ArrayType(IntegerType, _) => 3
    case ArrayType(ShortType, _) => 4
    case ArrayType(ByteType, _) => 5
    case _ => -1
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (cents.isEmpty)
      TypeCheckResult.TypeCheckFailure("nearest_centroid: empty centroid set")
    else if (elemCode(child.dataType) >= 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects an array of integral or floating " +
        s"elements, got ${child.dataType.catalogString}")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    NearestCentroid.compute(input.asInstanceOf[ArrayData],
      elemCode(child.dataType), cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val code = elemCode(child.dataType)
    val ref = ctx.addReferenceObj("centroids", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NearestCentroid.compute($c, $code, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : NearestCentroid = copy(child = newChild)

  override def prettyName: String = "nearest_centroid"
}

object NearestCentroid {

  /** Column API: `NearestCentroid(vec, cents)`. */
  def apply(c: Column, cents: Array[Array[Double]]): Column =
    GraftSqlBridge.column(
      NearestCentroid(GraftSqlBridge.expression(c), cents))

  private def get(a: ArrayData, i: Int, code: Int): Double = (code: @annotation.switch) match {
    case 0 => a.getDouble(i)
    case 1 => a.getFloat(i).toDouble
    case 2 => a.getLong(i).toDouble
    case 3 => a.getInt(i).toDouble
    case 4 => a.getShort(i).toDouble
    case 5 => a.getByte(i).toDouble
  }

  /** Shared kernel for interpreted eval and generated code. Sequential
    * accumulation in index order (oracle-mirrorable); null elements
    * contribute 0 to the distance. */
  def compute(v: ArrayData, code: Int, cents: Array[Array[Double]]): Int = {
    val nv = v.numElements()
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val row = cents(c)
      val n = math.min(nv, row.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        if (!v.isNullAt(i)) {
          val t = get(v, i, code) - row(i)
          d += t * t
        }
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }
}
