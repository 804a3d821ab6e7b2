package graft

import org.apache.spark.sql.SparkSession

/** Throwaway plan-audit harness for the round's new queries (not part
  * of the driver surface). Prints each query's formatted plan plus the
  * exchange/broadcast counts a reviewer audits. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q82_forget_neardups", "q83_forget_spans", "q84_text_cosine_pairs",
      "q85_quality_signals", "q86_curriculum_bins", "q87_shard_manifest",
      "q88_exact_jaccard_pairs")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange ".r.findAllIn(plan).length
      val bcasts = "BroadcastExchange".r.findAllIn(plan).length
      val windows = "Window ".r.findAllIn(plan).length
      println(s"==== $name: exchanges=$exchanges broadcasts=$bcasts windows=$windows")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode).take(4000))
    }
    spark.stop()
  }
}
