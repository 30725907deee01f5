package graft
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool (r16 optimization round): dump `.explain("formatted")` for
  * the named queries to `<outDir>/<query>_<tag>.txt`, and optionally
  * time each one (median of 3 noop-sink runs, the bench's timed-action
  * shape) so a plan change and its wall-clock effect are captured
  * together.
  *
  * Usage: graft.Explain <sfDir> <outDir> <tag> <q1,q2,...|all> [time]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag, namesArg, rest @ _*) = args: @unchecked
    val doTime = rest.contains("time")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val names =
      if (namesArg == "all") SparkEntry.queries.keys.toSeq.sorted
      else namesArg.split(",").toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), plan)
        if (doTime) {
          def once(): Double = {
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          def scrub(): Unit = {
            spark.sparkContext.getPersistentRDDs.values
              .foreach(_.unpersist(blocking = true))
            spark.catalog.clearCache()
            System.gc()
          }
          once() // warm-up
          val runs = Seq.fill(3) { scrub(); once() }.sorted
          println(f"[explain] $name%-40s median ${runs(1)}%.3f s " +
            f"(min ${runs.head}%.3f max ${runs.last}%.3f)")
        } else println(s"[explain] $name plan written")
      } catch { case e: Throwable =>
        println(s"[explain] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
