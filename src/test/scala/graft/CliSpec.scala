package graft

import org.scalatest.funsuite.AnyFunSuite

/** Statement splitting + meta-command dispatch of the SQL CLI (the pure
  * parts; script execution is smoke-tested via `runMain graft.Cli -f`). */
class CliSpec extends AnyFunSuite {

  test("splits on semicolons outside quotes") {
    assert(Cli.splitStatements("SELECT 1; SELECT 2") == Seq("SELECT 1", "SELECT 2"))
    assert(Cli.splitStatements("SELECT 'a;b'; SELECT 2") == Seq("SELECT 'a;b'", "SELECT 2"))
    assert(Cli.splitStatements("""SELECT ";"; SELECT 2""") == Seq("SELECT \";\"", "SELECT 2"))
  }

  test("strips comment lines without dropping the statement they precede") {
    val script =
      """-- header comment
        |SELECT 1;
        |-- between
        |SELECT 2;""".stripMargin
    assert(Cli.splitStatements(script) == Seq("SELECT 1", "SELECT 2"))
  }

  test("drops empty statements and trailing whitespace") {
    assert(Cli.splitStatements("SELECT 1;;;  \n") == Seq("SELECT 1"))
  }

  test("an apostrophe inside a comment does not open a string literal") {
    val script =
      """-- Spark's own greatest would reject it
        |SELECT 1;
        |SELECT 2;""".stripMargin
    assert(Cli.splitStatements(script) == Seq("SELECT 1", "SELECT 2"))
  }

  test("trailing inline comment with an apostrophe does not swallow the next statement") {
    val script =
      """SELECT 1; -- don't
        |SELECT 2;""".stripMargin
    assert(Cli.splitStatements(script) == Seq("SELECT 1", "SELECT 2"))
  }

  test("backslash-escaped quote inside a literal does not end the string") {
    assert(Cli.splitStatements("""SELECT 'a\'b;c'; SELECT 2""") ==
      Seq("""SELECT 'a\'b;c'""", "SELECT 2"))
  }

  test("a -- inside a string literal is not a comment") {
    assert(Cli.splitStatements("SELECT 'a--b'; SELECT 2") ==
      Seq("SELECT 'a--b'", "SELECT 2"))
  }

  test("meta-command dispatch recognizes only backslash commands") {
    val spark = Engine.session("local[2]")
    Engine.prepare(spark, "/root/testdata/sf0.001")
    assert(Cli.meta(spark, "\\dt"))
    assert(Cli.meta(spark, "\\d nation"))
    assert(Cli.meta(spark, "\\explain SELECT 1"))
    assert(!Cli.meta(spark, "SELECT 1"))
  }
}
