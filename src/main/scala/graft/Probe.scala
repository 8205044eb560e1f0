package graft

/** Dev smoke probe: exercises the public surface end-to-end on sf0.001.
  * `sbt "runMain graft.Probe"`. Not part of the driver contract.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("local[8]")
    Engine.registerTables(spark, "/root/testdata/sf0.001")
    println("ENTRY_ROWS=" + SparkEntry.entry(spark).count())
    spark.sql("SELECT greatest_ref(l_linenumber, l_discount) g FROM lineitem LIMIT 3").show()
    spark.sql("SELECT typeof(greatest_ref(l_linenumber, l_discount)) t FROM lineitem LIMIT 1").show()
    spark.sql("SELECT greatest_ref(true, 5L) g, typeof(greatest_ref(true, 5L)) t").show()
    try spark.sql("SELECT greatest_ref(1)").collect()
    catch { case e: Throwable => println("ARITY_ERR=" + e.getMessage.take(140)) }
    try spark.sql("SELECT greatest_ref(1, 'abc')").collect()
    catch { case e: Throwable => println("TYPE_ERR=" + e.getMessage.take(160)) }
    println("RUN_GREATEST=" + GreatestRunner.run(spark,
      Seq(Seq(1, 4, 3, null), Seq(2, null, 6, 8), Seq(7, 5, null, 9))))
    println("RUN_GREATEST_ALLNULL=" + GreatestRunner.run(spark,
      Seq(Seq(null, null), Seq(null, null))))
    spark.stop()
  }
}
