package graft.expr

import graft.core.Dialect
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._

/** H3/S2-style hierarchical cell index over a 2^res × 2^res world grid.
  *
  * The encoder is pure bit arithmetic — broadcast-free by construction
  * (north rule). Cell id layout: (res << 58) | morton(ix, iy), where morton
  * interleaves ix (even bits) and iy (odd bits). Parent/child moves are
  * 2-bit shifts, so coarse partition keys derive from fine ones without
  * touching lat/lon again.
  *
  * This replaces the reference's spatial-hash bucket
  * (fixed_radius_search.rs:83-130, key = [floor(x·inv_r), floor(y·inv_r)])
  * with a hierarchical id that (a) is a single shuffle-friendly long,
  * (b) preserves locality (Z-order) so range scans of neighbouring cells
  * hit few parquet row groups, (c) supports multi-resolution ops.
  */
object Morton {
  /** Spread the low 29 bits of v to even bit positions. */
  def spread(v: Long): Long = {
    var x = v & 0x1fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }
  def interleave(ix: Long, iy: Long): Long = spread(ix) | (spread(iy) << 1)

  def encode(ix: Long, iy: Long, res: Int): Long =
    (res.toLong << 58) | interleave(ix, iy)

  def res(cell: Long): Int = (cell >>> 58).toInt
  def parent(cell: Long, parentRes: Int): Long = {
    val r = res(cell)
    require(parentRes <= r)
    (parentRes.toLong << 58) | ((cell & ((1L << 58) - 1)) >>> (2 * (r - parentRes)))
  }
  def ix(cell: Long): Long = compact(cell & ((1L << 58) - 1))
  def iy(cell: Long): Long = compact((cell & ((1L << 58) - 1)) >>> 1)
  private def compact(v: Long): Long = {
    var x = v & 0x5555555555555555L
    x = (x | (x >>> 1)) & 0x3333333333333333L
    x = (x | (x >>> 2)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x >>> 4)) & 0x00ff00ff00ff00ffL
    x = (x | (x >>> 8)) & 0x0000ffff0000ffffL
    x = (x | (x >>> 16)) & 0x00000000ffffffffL
    x
  }

  /** DuckDB/Spark twin SQL for encode(): bit-by-bit interleave (2·res terms,
    * generated — used only by the oracle which has no custom expressions). */
  def encodeSql(d: Dialect, ixE: String, iyE: String, res: Int): String = {
    val terms = (0 until res).flatMap { b =>
      Seq(d.shl(s"(${d.shr(ixE, b)} & 1)", 2 * b),
          d.shl(s"(${d.shr(iyE, b)} & 1)", 2 * b + 1))
    }
    s"(${res.toLong << 58} + ${terms.mkString("(", " + ", ")")})"
  }
}

/** MortonCell(ix, iy) at fixed `res` — codegen'd single-row bit twiddle. */
case class MortonCell(ixe: Expression, iye: Expression, res: Int)
    extends BinaryExpression {
  override def left: Expression = ixe
  override def right: Expression = iye
  override def checkInputDataTypes(): TypeCheckResult =
    if (ixe.dataType == LongType && iye.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_cell expects (bigint, bigint)")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cell"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(Morton.encode(a.asInstanceOf[Long], b.asInstanceOf[Long], res))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (ix, iy) =>
      s"graft.expr.Morton.encode($ix, $iy, $res)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(ixe = l, iye = r)
}

/** NeighbourRing(cell, shell): all cells of the same res whose Chebyshev
  * distance from `cell` is exactly `shell` (shell 0 → the cell itself;
  * shell 1 → the 8 ring cells; …), clamped at world-grid edges.
  *
  * Clone of the reference's expanding-square scan
  * (fixed_radius_search.rs:180-204: `m.abs()==shell || n.abs()==shell`).
  * Used with explode() for radius search (5×5 block = shells 0..2 at bucket
  * width r/2 — :71-78) and iterative kNN shell expansion.
  */
case class NeighbourRing(cell: Expression, shellE: Expression)
    extends BinaryExpression {
  override def left: Expression = cell
  override def right: Expression = shellE
  override def checkInputDataTypes(): TypeCheckResult =
    if (cell.dataType == LongType && shellE.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_ring expects (bigint, int)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ring"

  override def nullSafeEval(c: Any, s: Any): Any =
    NeighbourRing.ringArray(c.asInstanceOf[Long], s.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, s) =>
      s"graft.expr.NeighbourRing.ringArray($c, $s)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(cell = l, shellE = r)
}

object NeighbourRing {
  /** Runtime helper shared by interpreted + generated code paths. */
  def ringArray(cl: Long, shell: Int): GenericArrayData = {
    val r = Morton.res(cl)
    val n = 1L << r
    val cx = Morton.ix(cl); val cy = Morton.iy(cl)
    val out = new scala.collection.mutable.ArrayBuffer[Any](if (shell == 0) 1 else 8 * shell)
    var m = -shell
    while (m <= shell) {
      var k = -shell
      while (k <= shell) {
        if (math.abs(m) == shell || math.abs(k) == shell) {
          val x = cx + m; val y = cy + k
          if (x >= 0 && x < n && y >= 0 && y < n)
            out += java.lang.Long.valueOf(Morton.encode(x, y, r))
        }
        k += 1
      }
      m += 1
    }
    new GenericArrayData(out.toArray)
  }
}

object Cells {
  def mortonCell(ix: Column, iy: Column, res: Int): Column =
    Shim.column(MortonCell(Shim.expression(ix), Shim.expression(iy), res))
  def neighbourRing(cell: Column, shell: Column): Column =
    Shim.column(NeighbourRing(Shim.expression(cell), Shim.expression(shell)))
}
