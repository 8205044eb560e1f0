package graft

import org.apache.spark.sql.SparkSession
import scala.io.Source
import scala.util.{Failure, Success, Try}

/** SQL CLI ≙ the reference's `datafusion-cli` (reference
  * `datafusion-cli/src/main.rs:130-224`): executes SQL scripts
  * (`-f file.sql`, ≙ `exec_from_files`), one-shot statements (`-c "sql"`),
  * or a stdin REPL (≙ `exec_from_repl`), against the testdata tables plus
  * the graft function surface (greatest_ref, dot_product, UDAFs, shims).
  *
  * Meta-commands (≙ reference `datafusion-cli/src/command.rs:39`):
  * {{{
  *   \q              quit
  *   \dt             list registered tables        (≙ ListTables)
  *   \d <table>      describe a table's schema     (≙ DescribeTable)
  *   \explain <sql>  formatted physical plan       (≙ Explain)
  *   \pq <path>      parquet footer metadata       (≙ parquet_metadata TVF)
  * }}}
  *
  * Usage: `sbt "runMain graft.Cli [--sf DIR] [-f script.sql] [-c SQL]"`
  */
object Cli {
  def main(args: Array[String]): Unit = {
    var sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    var script: Option[String] = None
    var oneShot: Option[String] = None
    var i = 0
    def valueOf(flag: String): String = {
      if (i + 1 >= args.length) {
        Console.err.println(s"usage: graft.Cli [--sf DIR] [-f SCRIPT | -c SQL]  ($flag needs a value)")
        sys.exit(2)
      }
      args(i + 1)
    }
    while (i < args.length) {
      args(i) match {
        case "--sf" => sfDir = valueOf("--sf"); i += 2
        case "-f" => script = Some(valueOf("-f")); i += 2
        case "-c" => oneShot = Some(valueOf("-c")); i += 2
        case other => Console.err.println(s"ignoring unknown arg: $other"); i += 1
      }
    }
    val spark = Engine.session()
    Engine.prepare(spark, sfDir)
    (script, oneShot) match {
      case (Some(path), _) =>
        runStatements(spark, splitStatements(Source.fromFile(path)(scala.io.Codec.UTF8).mkString))
      case (_, Some(sql)) => runStatements(spark, splitStatements(sql))
      case _ => repl(spark)
    }
    spark.stop()
  }

  /** Split a script on `;` outside quotes (matches the reference CLI's
    * statement splitting; `datafusion-cli/src/exec.rs:107`). `--` comments
    * are stripped to end-of-line DURING the quote-aware scan (a trailing
    * inline comment containing an apostrophe must not open a string and
    * swallow the next `;`), and a backslash inside a quoted region escapes
    * the next character (Spark string literals allow `'a\'b'`). */
  private[graft] def splitStatements(text: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var quote: Char = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (quote != 0) {
        cur += c
        if (c == '\\' && i + 1 < n) { cur += text.charAt(i + 1); i += 1 }
        else if (c == quote) quote = 0
        i += 1
      } else if (c == '-' && i + 1 < n && text.charAt(i + 1) == '-') {
        while (i < n && text.charAt(i) != '\n') i += 1 // keep the newline
      } else if (c == '\'' || c == '"') { quote = c; cur += c; i += 1 }
      else if (c == ';') { out += cur.toString; cur.clear(); i += 1 }
      else { cur += c; i += 1 }
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private def runStatements(spark: SparkSession, stmts: Seq[String]): Unit =
    stmts.foreach { sql =>
      Try(spark.sql(sql)) match {
        case Success(df) => df.show(50, truncate = false)
        case Failure(e) => Console.err.println(s"Error: ${e.getMessage}")
      }
    }

  private def repl(spark: SparkSession): Unit = {
    Console.err.println("graft SQL REPL — \\q to quit, \\dt tables, \\d <t> schema, \\explain <sql>, \\pq <path>")
    Iterator.continually(scala.io.StdIn.readLine("graft> "))
      .takeWhile(l => l != null && l.trim != "\\q")
      .map(_.trim).filter(_.nonEmpty)
      .foreach { line => if (!meta(spark, line)) runStatements(spark, splitStatements(line)) }
  }

  /** Handle a meta-command; returns false if `line` is plain SQL. */
  private[graft] def meta(spark: SparkSession, line: String): Boolean = line match {
    case "\\dt" =>
      spark.catalog.listTables().select("name", "tableType", "isTemporary").show(100, false); true
    case d if d.startsWith("\\d ") =>
      Try(spark.table(d.stripPrefix("\\d ").trim).printSchema())
        .recover { case e => Console.err.println(e.getMessage) }; true
    case ex if ex.startsWith("\\explain ") =>
      Try(println(spark.sql(ex.stripPrefix("\\explain "))
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)))
        .recover { case e => Console.err.println(e.getMessage) }; true
    case pq if pq.startsWith("\\pq ") =>
      val p = pq.stripPrefix("\\pq ").trim
      Try {
        val df = spark.read.parquet(p)
        println(s"schema: ${df.schema.treeString}")
        println(s"rows: ${df.count()}")
      }.recover { case e => Console.err.println(e.getMessage) }; true
    case _ => false
  }
}
