package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real inventory lives in [[Queries]]; this object only adapts it.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** The full contract corpus: relational surface + pipeline operators. */
  def allEntries: Seq[Queries.Entry] =
    Queries.all ++ Pipeline.all ++ Multimodal.all ++ Sources.all ++ Extras.all ++ Tpch.all

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allEntries.map { en =>
      en.name -> { (s: SparkSession, dir: String) =>
        Engine.prepare(s, dir)
        en.q(s, dir)
      }
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    allEntries.collect { case Queries.Entry(n, Some(sql), _) => n -> sql }.toMap
}
