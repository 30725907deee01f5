package graft.core

import org.apache.spark.sql.SparkSession

/**
 * SparkSession factory with the engine's standard configuration:
 * UTC session time zone (determinism across engines), AQE enabled
 * (runtime join-strategy switch / skew splitting / partition coalescing
 * — our stand-in for hand-tuned plans at 100 TB), and shuffle
 * partitions sized to the local core count rather than the 200 default.
 */
object GraftSession {
  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
            appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // getOrCreate ignores builder configs when a session already exists;
    // re-assert the runtime-settable ones so the standard configuration
    // (UTC in particular — a correctness matter for timestamp queries)
    // is guaranteed on every code path.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", cores.toString)
    // extensions are builder-time only — post-hoc registration covers the
    // session-reuse path (same function, same registry entry)
    graft.functions.GraftExtensions.register(spark)
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
