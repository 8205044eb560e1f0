package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import scala.collection.concurrent.TrieMap

/** Round-16 optimization probe: per-JOB wall-time attribution inside a
  * contract query plus a formatted-plan dump. A bench number like "q46 =
  * 5.4 s" spans many Spark jobs (the localCheckpoint materializations, the
  * convergence counts, the final noop sink); optimizing blind to that
  * split risks shaving the wrong stage. Run:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 REPS=3 \
  *     sbt "runMain graft.R16Probe q46_dedup_ngram_jaccard"
  *
  * Prints, per rep, each job's wall seconds with its description/callsite,
  * and writes <PLAN_DIR>/<query>_<suffix>.txt (PLAN_DIR default plans/r16,
  * suffix via PLAN_SUFFIX, default "before") with the final DataFrame's
  * formatted plan. Timing methodology matches graft.Bench exactly: build +
  * noop-sink save.
  *
  * Precision caveat (ADVICE r16): per-job wall time is nanoTime taken at
  * listener DISPATCH on the async listener bus, so attribution can drift
  * under bus backlog, and jobLines.clear() at rep start can drop
  * end-events of jobs still draining from the previous rep. Good enough
  * for ranking jobs inside a query; if event-exact times are ever needed,
  * switch to SparkListenerJobStart.time / JobEnd.time.
  */
object R16Probe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("REPS", "3").toInt
    val suffix = sys.env.getOrElse("PLAN_SUFFIX", "before")
    val spark = Engine.session(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    // ad-hoc conf experiments: SPARK_GRAFT_EXTRA_CONF="k1=v1;k2=v2"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) })
    Engine.prepare(spark, sf)
    // warmup identical to Bench: scheduler init + parquet footers off the clock
    Engine.tableNames.foreach(t => try { spark.table(t).count() } catch { case _: Throwable => () })

    val jobStart = TrieMap.empty[Int, (Long, String)]
    val jobLines = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties).flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobStart.put(js.jobId, (System.nanoTime(), desc)); ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobStart.remove(je.jobId).foreach { case (t0, desc) =>
          jobLines.add((je.jobId, (System.nanoTime() - t0) / 1e9, desc)); ()
        }
    })

    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { rep =>
        jobLines.clear()
        val t0 = System.nanoTime()
        val df = fn(spark, sf)
        df.write.format("noop").mode("overwrite").save()
        val total = (System.nanoTime() - t0) / 1e9
        println(f"== $name rep $rep total $total%.3f s")
        jobLines.forEach { case (id, t, desc) =>
          if (t >= 0.01) println(f"   job $id%4d  $t%7.3f s  ${desc.take(90)}")
        }
        if (rep == reps) {
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val planDir = sys.env.getOrElse("PLAN_DIR", "plans/r16")
          val dir = new java.io.File(planDir); dir.mkdirs()
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$planDir/${name}_$suffix.txt"), plan)
          println(s"   plan -> $planDir/${name}_$suffix.txt (${plan.linesIterator.size} lines)")
        }
      }
    }
    spark.stop()
  }
}
