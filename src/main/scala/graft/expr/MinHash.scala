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

  /** r06 per-task-work optimization (guide §1.2 step 2): the former loop
    * allocated a UTF8String + byte[] per shingle (substringSQL/getBytes)
    * and paid MessageDigest's per-call output allocation — ~870 short-
    * lived allocations per ~300-char document. This version copies the
    * document's bytes ONCE, walks UTF-8 char boundaries with a 9-slot
    * offset ring, and hashes each 8-char window in place with the
    * single-block Md5Kernel (every window is ≤ 48 bytes). Bit-identical
    * by construction: substring(i, 8) is exactly the byte range between
    * char starts i and i+8, and Md5KernelSpec pins the kernel word
    * against MessageDigest. MinHashSpec still pins this whole expression
    * against the exploded twin SQL. */
  def eval(text: UTF8String): GenericArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    val mins = Array.fill(nHashes)(Long.MaxValue)
    def update(h: Long): Unit = {
      var j = 0
      while (j < nHashes) {
        val v = (h * (2 * j + 1) + j.toLong * 2654435761L) % 4294967296L
        if (v < mins(j)) mins(j) = v
        j += 1
      }
    }
    val ring = new Array[Int](9)
    var pos = 0
    var nch = 0
    while (pos < len) {
      ring(nch % 9) = pos
      nch += 1
      pos += UTF8String.numBytesForFirstByte(bytes(pos))
      if (pos > len) pos = len // clamp, mirroring numChars()' walk
      if (nch >= 8) {
        val s = ring((nch - 8) % 9)
        update(Md5Kernel.firstWord(bytes, s, pos - s))
      }
    }
    // shorter than 8 chars: the single whole-text shingle (n = 1 case)
    if (nch < 8) update(Md5Kernel.firstWord(bytes, 0, len))
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
