package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

/** Winding-number / even-odd point-in-polygon test, an exact clone of the
  * reference semantics (/root/reference/src/algorithms/poly_ops.rs:28-70):
  *
  *   - is_left(p0,p1,p) = (x1-x0)*(y-y0) - (x-x0)*(y1-y0)   [:20-21]
  *   - upward crossing (y0 <= y < y1) and p strictly left  → wn += 1
  *   - downward crossing (y0 > y >= y1) and p strictly right → wn -= 1
  *   - inside ⇔ wn % 2 != 0  (parity, NOT nonzero rule)     [:31]
  *   - points exactly on an edge are OUTSIDE                 [:26]
  *
  * Ring arrays must be explicitly closed (xs.head==xs.last); the reference
  * panics otherwise (poly_ops.rs:40-44) — we return false-with-no-crossings
  * only for degenerate (<4 pt) rings and leave closure to the data layer.
  *
  * Whole-stage-codegen friendly: doGenCode emits a tight primitive loop over
  * the two double arrays, no boxing, no virtual calls.
  */
case class PointInPolygon(x: Expression, y: Expression,
                          xs: Expression, ys: Expression)
    extends QuaternaryExpression {

  override def first: Expression = x
  override def second: Expression = y
  override def third: Expression = xs
  override def fourth: Expression = ys

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = x.dataType == DoubleType && y.dataType == DoubleType &&
      Seq(xs, ys).forall(_.dataType.isInstanceOf[ArrayType]) &&
      Seq(xs, ys).forall(_.dataType.asInstanceOf[ArrayType].elementType == DoubleType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_pip expects (double, double, array<double>, array<double>), got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean =
    x.nullable || y.nullable || xs.nullable || ys.nullable

  override def prettyName: String = "graft_pip"

  override def nullSafeEval(xv: Any, yv: Any, xsv: Any, ysv: Any): Any = {
    val px = xv.asInstanceOf[Double]
    val py = yv.asInstanceOf[Double]
    val ax = xsv.asInstanceOf[ArrayData].toDoubleArray()
    val ay = ysv.asInstanceOf[ArrayData].toDoubleArray()
    java.lang.Boolean.valueOf(PointInPolygon.windingNumber(px, py, ax, ay) % 2 != 0)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wn = ctx.freshName("wn")
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val x0 = ctx.freshName("x0"); val y0 = ctx.freshName("y0")
    val x1 = ctx.freshName("x1"); val y1 = ctx.freshName("y1")
    val isLeft = ctx.freshName("isLeft")
    nullSafeCodeGen(ctx, ev, (px, py, axs, ays) => {
      s"""
         |int $wn = 0;
         |final int $n = $axs.numElements();
         |double $x1 = $n > 0 ? $axs.getDouble(0) : 0.0;
         |double $y1 = $n > 0 ? $ays.getDouble(0) : 0.0;
         |for (int $i = 0; $i < $n - 1; $i++) {
         |  final double $x0 = $x1; final double $y0 = $y1;
         |  $x1 = $axs.getDouble($i + 1); $y1 = $ays.getDouble($i + 1);
         |  if ($y0 <= $py) {
         |    if ($y1 > $py) {
         |      final double $isLeft = ($x1 - $x0) * ($py - $y0) - ($px - $x0) * ($y1 - $y0);
         |      if ($isLeft > 0.0) $wn++;
         |    }
         |  } else if ($y1 <= $py) {
         |    final double $isLeft = ($x1 - $x0) * ($py - $y0) - ($px - $x0) * ($y1 - $y0);
         |    if ($isLeft < 0.0) $wn--;
         |  }
         |}
         |${ev.value} = ($wn % 2) != 0;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(x = f, y = s, xs = t, ys = q)
}

object PointInPolygon {
  /** Scalar reference oracle (used by tests and by interpreted eval). */
  def isLeft(x0: Double, y0: Double, x1: Double, y1: Double,
             px: Double, py: Double): Double =
    (x1 - x0) * (py - y0) - (px - x0) * (y1 - y0)

  def windingNumber(px: Double, py: Double,
                    xs: Array[Double], ys: Array[Double]): Int = {
    var wn = 0
    var i = 0
    while (i < xs.length - 1) {
      val y0 = ys(i); val y1 = ys(i + 1)
      if (y0 <= py) {
        if (y1 > py && isLeft(xs(i), y0, xs(i + 1), y1, px, py) > 0.0) wn += 1
      } else if (y1 <= py && isLeft(xs(i), y0, xs(i + 1), y1, px, py) < 0.0) wn -= 1
      i += 1
    }
    wn
  }

  def pointInPoly(px: Double, py: Double,
                  xs: Array[Double], ys: Array[Double]): Boolean =
    windingNumber(px, py, xs, ys) % 2 != 0

  /** Column-API surface. */
  def pip(x: Column, y: Column, xs: Column, ys: Column): Column =
    Shim.column(PointInPolygon(Shim.expression(x), Shim.expression(y),
                               Shim.expression(xs), Shim.expression(ys)))
}
