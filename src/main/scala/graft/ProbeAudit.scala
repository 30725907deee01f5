package graft
import org.apache.spark.sql.SparkSession
object ProbeAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val sf = "/root/testdata/sf0.001"
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    for (q <- Seq("q60_dedup_pipeline", "q95_corpus_prep", "q25_dedup_exact", "q49_dataprep", "q83_chunk_dedup")) {
      val sp = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan
      println(s"===== $q")
      sp.collect {
        case e: ShuffleExchangeExec if e.outputPartitioning.isInstanceOf[HashPartitioning] =>
          val keys = e.outputPartitioning.asInstanceOf[HashPartitioning].expressions.flatMap(_.references.map(_.name)).toSet
          println(s"  keys=$keys payload=${e.child.output.map(a => a.name+":"+a.dataType.simpleString).mkString(",").take(250)}")
      }
    }
    spark.stop()
  }
}
