package graft.expr

/** Zero-allocation MD5 for SHORT messages (≤ 55 bytes → exactly one
  * compression block), returning only the first 32-bit word of the digest
  * in the big-endian reading `conv(substring(md5hex, 1, 8), 16, 10)` uses.
  *
  * This is the per-task-work optimization for the shingle loops (guide
  * §1.2 step 2): `MessageDigest.digest` allocates the 16-byte output and
  * pays update/pad bookkeeping per call, and the callers additionally
  * allocated a UTF8String + byte[] per shingle — three short-lived
  * allocations × ~290 shingles × every document in the corpus. The kernel
  * reads the document’s UTF-8 bytes in place with a reused per-thread block buffer.
  *
  * Standard RFC 1321 arithmetic; the K table is derived from the sine
  * definition at class init. Md5KernelSpec pins word-for-word equality
  * against java.security.MessageDigest on randomized inputs (including
  * multi-byte UTF-8) — the kernel is only ever used where that spec's
  * preconditions hold (len ≤ 55).
  */
object Md5Kernel {
  private val K: Array[Int] = Array.tabulate(64)(i =>
    (math.floor(math.abs(math.sin(i + 1.0)) * 4294967296.0)).toLong.toInt)
  private val S: Array[Int] = Array(
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21)

  // reused per-thread block buffer (the Geocode.outBuf pattern): C2 cannot
  // scalar-replace an array indexed by loop-variant subscripts, so a
  // per-call `new Array[Int](16)` WOULD be a real heap allocation.
  private val block = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](16)
  }

  /** First digest word (bytes 0-3 read big-endian, as a value in
    * [0, 2^32)) of md5(bytes[off, off+len)). Requires len ≤ 55. */
  def firstWord(bytes: Array[Byte], off: Int, len: Int): Long = {
    val m = block.get()
    java.util.Arrays.fill(m, 0)
    var i = 0
    while (i < len) {
      m(i >> 2) |= (bytes(off + i) & 0xff) << ((i & 3) << 3)
      i += 1
    }
    m(len >> 2) |= 0x80 << ((len & 3) << 3)
    m(14) = len << 3 // bit length (< 2^9, high word stays 0)

    var a = 0x67452301
    var b = 0xefcdab89
    var c = 0x98badcfe
    var d = 0x10325476
    i = 0
    while (i < 64) {
      var f = 0
      var g = 0
      if (i < 16) { f = (b & c) | (~b & d); g = i }
      else if (i < 32) { f = (d & b) | (~d & c); g = (5 * i + 1) & 15 }
      else if (i < 48) { f = b ^ c ^ d; g = (3 * i + 5) & 15 }
      else { f = c ^ (b | ~d); g = (7 * i) & 15 }
      val tmp = d
      d = c
      c = b
      b = b + Integer.rotateLeft(a + f + K(i) + m(g), S(i))
      a = tmp
      i += 1
    }
    val w = a + 0x67452301 // first output word, little-endian bytes
    // hex digest chars 1..8 are those bytes in order → big-endian reading
    Integer.reverseBytes(w).toLong & 0xffffffffL
  }
}
