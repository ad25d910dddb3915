package graft.expr

import graft.core.Geo
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass deterministic geocoder: one MD5 digest per row instead of
  * the twin-SQL form's repeated md5/conv chains (the Catalyst CSE dedups
  * within a stage, but null-check inference and cross-stage recompute still
  * multiply digests ~4-6× per row at the scan).
  *
  * Returns array<double> [lat, lon]. MUST stay bit-identical to
  * core/Dialect Geo.lat/Geo.lon (GeocodeSpec asserts equality on every
  * document): h1/h2/h3 are the first three big-endian 32-bit words of the
  * MD5 digest — exactly what `conv(substring(md5hex, 8k+1, 8), 16, 10)`
  * parses — and the lat/lon arithmetic replays the same IEEE-754 ops in
  * the same order.
  */
object Geocode {
  // MessageDigest.getInstance takes a synchronized JCA provider lookup —
  // per-row calls serialize all executor threads (measured: local[32]
  // throughput collapsed to local[8] levels). One digest per thread.
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  // r06: digest into a reused thread-local buffer (MessageDigest.digest()
  // otherwise allocates 16 bytes per row) and hash the UTF8String's bytes
  // in place via its ByteBuffer view (getBytes() otherwise copies the
  // whole text per row) — two fewer allocations per page on the flagship
  // hot path (guide §1.2 step 2).
  private val outBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }

  private def digestWords(md: java.security.MessageDigest): (Long, Long, Long) = {
    val d = outBuf.get()
    md.digest(d, 0, 16)
    def word(o: Int): Long =
      ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
        ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
    (word(0), word(4), word(8))
  }

  def hashWords(textBytes: Array[Byte]): (Long, Long, Long) = {
    val md = digest.get()
    md.reset()
    md.update(textBytes)
    digestWords(md)
  }

  def hashWords(text: UTF8String): (Long, Long, Long) = {
    val md = digest.get()
    md.reset()
    md.update(text.getByteBuffer)
    digestWords(md)
  }

  /** Scalar twin of Geo.lat/Geo.lon (Dialect.scala). */
  def latLon(textBytes: Array[Byte]): Array[Double] =
    latLonFrom(hashWords(textBytes))

  private def latLonFrom(words: (Long, Long, Long)): Array[Double] = {
    val (h1, h2, h3) = words
    val urban = h1 % 10 < 2
    val lat =
      if (urban) {
        val cityLat = (h1 % 3) match { case 0 => 40.7; case 1 => 51.5; case _ => 35.68 }
        cityLat + ((h2 % 1000) / 1000.0) * 0.1
      } else Geo.LatMin + (h1 / 4294967296.0) * Geo.LatSpan
    val lon =
      if (urban) {
        val cityLon = (h1 % 3) match { case 0 => -74.0; case 1 => -0.1; case _ => 139.76 }
        cityLon + ((h3 % 1000) / 1000.0) * 0.1
      } else Geo.LonMin + (h2 / 4294967296.0) * Geo.LonSpan
    Array(lat, lon)
  }

  /** Runtime entry shared by interpreted + generated code. */
  def eval(text: UTF8String): GenericArrayData =
    new GenericArrayData(latLonFrom(hashWords(text)))

  def geocode(text: Column): Column =
    Shim.column(GeocodeExpr(Shim.expression(text)))
}

case class GeocodeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_geocode"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_geocode expects a string")

  override def nullSafeEval(t: Any): Any =
    Geocode.eval(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.expr.Geocode.eval($t)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
