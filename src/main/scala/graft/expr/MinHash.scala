package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass 16-way MinHash over the char-8-gram shingles of a text —
  * the whole signature in ONE scan of the document, no shingle explode,
  * no per-shingle rows, no shuffle (the twin-SQL form exploded ~290
  * shingle rows per document through a 16-aggregate groupBy; the round-5
  * bench attribution measured that explode+digest as the dominant
  * dedup_minhash_lsh cost).
  *
  * MUST stay bit-identical to the Dedup twin SQL (MinHashSpec asserts
  * equality per document):
  *   shingles  = substring(text, i, 8) for i in 1..max(numChars−7, 1)
  *               (UTF8String.substringSQL — exactly Spark's substring);
  *   h         = first big-endian 32-bit word of md5(shingle bytes)
  *               (= conv(substring(md5hex, 1, 8), 16, 10));
  *   m_j       = min over shingles of (h·(2j+1) + j·2654435761) mod 2³²
  *               (odd multiplier → bijection mod 2³², exact in int64).
  */
object MinHash {

  private val nHashes = 16

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def eval(text: UTF8String): GenericArrayData = {
    val md = digest.get()
    val mins = Array.fill(nHashes)(Long.MaxValue)
    val n = math.max(text.numChars() - 7, 1)
    var i = 1
    while (i <= n) {
      val sh = text.substringSQL(i, 8)
      md.reset()
      val d = md.digest(sh.getBytes)
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var j = 0
      while (j < nHashes) {
        val v = (h * (2 * j + 1) + j.toLong * 2654435761L) % 4294967296L
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def minhash16(text: Column): Column =
    Shim.column(MinHashExpr(Shim.expression(text)))
}

case class MinHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash16"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_minhash16 expects a string")

  override def nullSafeEval(t: Any): Any =
    MinHash.eval(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.expr.MinHash.eval($t)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
