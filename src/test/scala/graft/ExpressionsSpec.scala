package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the custom Catalyst expressions: DotProduct null/length
  * semantics and the Fingerprints kernels' exact equivalence to the
  * SQL-HOF formulations they replaced (incl. non-ASCII text). */
class ExpressionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session("local[4]")

  private def one(sql: String): Any = {
    functions.registerAll(spark)
    spark.sql(sql).collect()(0).get(0)
  }

  test("dot_product: exact left-to-right fold") {
    assert(one("SELECT dot_product(array(1D, 2D, 3D), array(4D, 5D, 6D))") == 32.0)
  }

  test("dot_product: length mismatch -> null (matches the zip_with fold)") {
    assert(one("SELECT dot_product(array(1D, 2D), array(1D))") == null)
  }

  test("dot_product: null element -> null, and the expression reports nullable") {
    assert(one("SELECT dot_product(array(1D, cast(NULL AS DOUBLE)), array(1D, 2D))") == null)
    functions.registerAll(spark)
    val df = spark.sql("SELECT dot_product(array(1D, 2D), array(3D, 4D)) AS d")
    assert(df.schema.head.nullable, "DotProduct must report nullable=true")
    assert(df.collect()(0).getDouble(0) == 11.0)
  }

  test("token_lex_count ≡ java.util.regex on random + adversarial strings") {
    val pat = java.util.regex.Pattern.compile("[a-z]+|[0-9]+|[^a-z0-9 ]")
    def regexCount(s: String): Long = {
      val m = pat.matcher(s); var n = 0L
      while (m.find()) n += 1
      n
    }
    val rnd = new scala.util.Random(42)
    val alphabet = "abz 019AZ.,!¿λ𝕏é \t"
    val cases = Seq("", " ", "   ", "abc", "abc123", "a1b2 c3", "λλ one λ",
      "𝕏ab𝕏", "a" * 1000, "tabs\tand\nnewlines") ++
      (1 to 500).map(_ => (1 to rnd.nextInt(60))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    cases.foreach { s =>
      val got = Fingerprints.tokenLexCount(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      assert(got == regexCount(s), s"tokenLexCount diverges on ${s.take(40).toList}")
    }
    // and through the SQL surface (codegen path)
    functions.registerAll(spark)
    assert(one("SELECT token_lex_count('ab1 cd, 22x')") == 6L)
  }

  test("poly_hash / min_gram_hash match the SQL-HOF formulation on real docs") {
    Engine.prepare(spark, "/root/testdata/sf0.001")
    val mismatches = spark.sql(
      """SELECT count(*) FROM (
        |  SELECT doc_id,
        |    poly_hash(text) AS np,
        |    aggregate(transform(sequence(1, length(text)), i -> ascii(substr(text, i, 1))),
        |              cast(0 AS BIGINT), (acc, c) -> (acc * 31 + c) % 2147483647) AS hp,
        |    min_gram_hash(text) AS nm,
        |    array_min(transform(sequence(1, length(text) - 3),
        |      i -> cast(conv(substr(md5(substr(text, i, 4)),1,8),16,10) AS BIGINT))) AS hm
        |  FROM documents WHERE length(text) >= 4) t
        |WHERE np != hp OR nm != hm""".stripMargin).collect()(0).getLong(0)
    assert(mismatches == 0L)
  }

  test("fingerprint kernels handle non-ASCII codepoints like the HOF path") {
    functions.registerAll(spark)
    val r = spark.sql(
      """SELECT poly_hash(s) = aggregate(transform(sequence(1, length(s)),
        |         i -> ascii(substr(s, i, 1))), cast(0 AS BIGINT),
        |         (acc, c) -> (acc * 31 + c) % 2147483647),
        |  min_gram_hash(s) = array_min(transform(sequence(1, length(s) - 3),
        |         i -> cast(conv(substr(md5(substr(s, i, 4)),1,8),16,10) AS BIGINT)))
        |FROM (SELECT 'héllo wörld – ünïcode テスト' AS s)""".stripMargin).collect()(0)
    assert(r.getBoolean(0), "poly_hash diverges on non-ASCII")
    assert(r.getBoolean(1), "min_gram_hash diverges on non-ASCII")
  }

  test("min_gram_hash: under 4 codepoints -> null") {
    assert(one("SELECT min_gram_hash('abc')") == null)
    assert(one("SELECT min_gram_hash('abcd')") != null)
  }

  test("single-block mini-MD5 ≡ java.security.MessageDigest on random bytes") {
    // keeps FpProbe's A/B honest: the measured-and-rejected q53 alternative
    // (round 12 — the JDK intrinsic WON; see the FpProbe scaladoc) must
    // compute the same first-4-bytes-in-hex-order value on every
    // (offset, length <= 55) window, or its timing is meaningless
    val jdk = java.security.MessageDigest.getInstance("MD5")
    def ref(bytes: Array[Byte], off: Int, len: Int): Long = {
      jdk.reset(); jdk.update(bytes, off, len)
      val h = jdk.digest()
      ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) | ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    }
    val rnd = new scala.util.Random(7)
    val buf = new Array[Byte](4096)
    rnd.nextBytes(buf)
    // every length 0..55 at varied offsets, plus dense random windows
    for (len <- 0 to 55; off <- Seq(0, 1, 17, 4096 - len))
      assert(FpProbe.Md5Mini.first32(buf, off, len) == ref(buf, off, len),
        s"mini-MD5 diverges at off=$off len=$len")
    for (_ <- 1 to 2000) {
      val len = rnd.nextInt(56)
      val off = rnd.nextInt(4096 - len + 1)
      assert(FpProbe.Md5Mini.first32(buf, off, len) == ref(buf, off, len),
        s"mini-MD5 diverges at off=$off len=$len")
    }
  }
}
