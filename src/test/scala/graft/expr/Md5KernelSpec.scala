package graft.expr

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pins the single-block Md5Kernel word against java.security.MessageDigest
  * and the rewritten MinHash.eval boundary walk against the original
  * substringSQL formulation, on adversarial inputs (empty, short, exact-8,
  * multi-byte UTF-8, randomized). */
class Md5KernelSpec extends AnyFunSuite {

  private def refWord(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  test("firstWord equals MessageDigest's first word for all lengths 0..55") {
    val rnd = new scala.util.Random(42)
    (0 to 55).foreach { n =>
      (0 until 20).foreach { _ =>
        val b = new Array[Byte](n)
        rnd.nextBytes(b)
        assert(Md5Kernel.firstWord(b, 0, n) === refWord(b), s"len $n")
      }
    }
  }

  test("firstWord honours offsets into a larger buffer") {
    val rnd = new scala.util.Random(7)
    val buf = new Array[Byte](128)
    rnd.nextBytes(buf)
    (0 until 50).foreach { _ =>
      val off = rnd.nextInt(80)
      val len = rnd.nextInt(48)
      assert(Md5Kernel.firstWord(buf, off, len) ===
        refWord(java.util.Arrays.copyOfRange(buf, off, off + len)))
    }
  }

  /** Original MinHash.eval formulation (substringSQL + MessageDigest). */
  private def refMinhash(text: UTF8String): Seq[Long] = {
    val mins = Array.fill(16)(Long.MaxValue)
    val n = math.max(text.numChars() - 7, 1)
    (1 to n).foreach { i =>
      val h = refWord(text.substringSQL(i, 8).getBytes)
      (0 until 16).foreach { j =>
        val v = (h * (2 * j + 1) + j.toLong * 2654435761L) % 4294967296L
        if (v < mins(j)) mins(j) = v
      }
    }
    mins.toSeq
  }

  test("MinHash.eval boundary walk matches the substringSQL formulation") {
    val cases = Seq("", "a", "exactly8", "sevench", "a bit longer ascii text",
      "däß-umlauts ünd größer", "汉字文本带有多字节字符超过八个字符",
      "mixed 汉字 and ascii ünd emoji 😀 tail",
      "doc 42 key agg row scan slow fast table value part hash")
    val rnd = new scala.util.Random(11)
    val extra = (0 until 40).map { _ =>
      val len = rnd.nextInt(30)
      (0 until len).map(_ => (rnd.nextInt(0x2fff) + 1).toChar).mkString
    }
    (cases ++ extra).foreach { s =>
      val u = UTF8String.fromString(s)
      assert(MinHash.eval(u).toLongArray().toSeq === refMinhash(u), s"text: $s")
    }
  }

  test("Geocode UTF8String hashWords equals the byte-array path") {
    val texts = Seq("", "abc", "汉字文本", "doc 1 key agg row")
    texts.foreach { s =>
      val u = UTF8String.fromString(s)
      assert(Geocode.hashWords(u) === Geocode.hashWords(u.getBytes))
    }
  }
}
