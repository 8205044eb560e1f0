package graft

import org.apache.spark.unsafe.types.UTF8String

/** Micro A/B probe for the q53 fingerprint kernels (round 12, VERDICT r11
  * #3): times [[Fingerprints.minGram4]] (ThreadLocal MessageDigest — the
  * SHIPPED kernel) against an allocation-free pure-Java single-block MD5
  * formulation of the same min-4-gram sketch, plus [[Fingerprints.poly]],
  * on synthetic ~300-char texts.
  *
  * Measured verdict (this probe, JDK 17, 2000×300-char docs, min of 3):
  * MessageDigest ~79 ms vs mini-MD5 ~103 ms — HotSpot intrinsifies
  * MD5.implCompress, and the intrinsic compression beats pure Java even
  * paying reset + a fresh 16-byte digest array per call. So q53 keeps
  * MessageDigest; the mini-MD5 lives HERE as the measured-and-rejected
  * alternative (correctness pinned against the JDK digest in
  * ExpressionsSpec so the comparison stays honest if re-run on a future
  * JDK where the intrinsic landscape changes). `poly` is ~2.5 ms on the
  * same corpus — ~3% of the gram-hash cost — which bounds the upside of
  * fusing the two kernels into one scan; fusion rejected as plan
  * complexity for noise.
  *
  * Run: `tools/run_main.sh graft.FpProbe [nDocs] [docLen]`
  */
object FpProbe {
  /** Single-block MD5 (RFC 1321), messages ≤ 55 bytes, constants computed
    * from the spec (K(i) = ⌊|sin(i+1)|·2³²⌋). Returns the first 32 bits of
    * the digest in hex-string order — same contract as
    * `conv(substr(md5(x),1,8),16,10)`. */
  private[graft] object Md5Mini {
    val K: Array[Int] = Array.tabulate(64)(i =>
      ((math.abs(math.sin(i + 1.0)) * 4294967296.0).toLong & 0xffffffffL).toInt)
    val S: Array[Int] = Array(7, 12, 17, 22, 5, 9, 14, 20, 4, 11, 16, 23, 6, 10, 15, 21)
    private val scratch = new ThreadLocal[Array[Int]] {
      override def initialValue(): Array[Int] = new Array[Int](16)
    }

    def first32(bytes: Array[Byte], off: Int, len: Int): Long = {
      require(len <= 55, s"single-block MD5 requires len <= 55, got $len")
      val m = scratch.get()
      java.util.Arrays.fill(m, 0)
      var i = 0
      while (i < len) { m(i >> 2) |= (bytes(off + i) & 0xff) << ((i & 3) << 3); i += 1 }
      m(len >> 2) |= 0x80 << ((len & 3) << 3)
      m(14) = len << 3 // bit length; high word m(15) stays 0 for len <= 55
      var a = 0x67452301; var b = 0xefcdab89; var c = 0x98badcfe; var d = 0x10325476
      i = 0
      while (i < 64) {
        var f = 0; var g = 0
        if (i < 16) { f = (b & c) | (~b & d); g = i }
        else if (i < 32) { f = (d & b) | (~d & c); g = (5 * i + 1) & 15 }
        else if (i < 48) { f = b ^ c ^ d; g = (3 * i + 5) & 15 }
        else { f = c ^ (b | ~d); g = (7 * i) & 15 }
        val tmp = d; d = c; c = b
        b = b + Integer.rotateLeft(a + f + K(i) + m(g), S(((i >> 4) << 2) | (i & 3)))
        a = tmp
        i += 1
      }
      // digest byte order is little-endian per word: hex chars 1-8 are the
      // bytes of (a + a0) lowest-first
      java.lang.Integer.reverseBytes(a + 0x67452301).toLong & 0xffffffffL
    }
  }

  /** min-4-gram sketch over the mini-MD5 — the rejected q53 variant. */
  private def miniMin(s: UTF8String): Long = {
    val bytes = s.getBytes
    // codepoint boundaries, same walk as Fingerprints.cpOffsets
    val off = new Array[Int](bytes.length + 1)
    var i = 0; var n = 0
    while (i < bytes.length) {
      off(n) = i; n += 1
      val c = bytes(i) & 0xff
      i += (if (c < 0x80) 1 else if (c < 0xe0) 2 else if (c < 0xf0) 3 else 4)
    }
    off(n) = bytes.length
    var best = Long.MaxValue
    i = 0
    while (i <= n - 4) {
      val v = Md5Mini.first32(bytes, off(i), off(i + 4) - off(i))
      if (v < best) best = v
      i += 1
    }
    best
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(2000)
    val docLen = args.drop(1).headOption.map(_.toInt).getOrElse(300)
    val rnd = new scala.util.Random(1)
    val alphabet = "abcdefghij klmnop qrstu vwxyz"
    val texts = (1 to nDocs).map(_ => UTF8String.fromString(
      (1 to docLen).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString))
    def time(label: String)(f: => Long): Unit = {
      var sink = 0L
      sink ^= f; sink ^= f // warmup
      val t0 = System.nanoTime()
      var r = 0
      while (r < 3) { sink ^= f; r += 1 }
      println(f"FPPROBE $label%-28s ${(System.nanoTime() - t0) / 3e6}%8.1f ms  (sink=$sink)")
    }
    time("minGram4 jdk (SHIPPED)") { texts.foldLeft(0L)((a, t) => a ^ Fingerprints.minGram4(t)) }
    time("minGram4 mini-md5 (rejected)") { texts.foldLeft(0L)((a, t) => a ^ miniMin(t)) }
    time("poly") { texts.foldLeft(0L)((a, t) => a ^ Fingerprints.poly(t)) }
    val bad = texts.count(t => Fingerprints.minGram4(t) != miniMin(t))
    println(s"FPPROBE equivalence: $bad mismatches of ${texts.size}")
  }
}
