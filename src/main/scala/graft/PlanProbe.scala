package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage-decomposition harness (`runMain graft.PlanProbe
  * [sfDir]`) — times an operator's pipeline stage by stage in one
  * session, the complement to [[BenchOne]]'s whole-query reps. Current
  * target: the DSIR gram pipeline (this probe is what isolated the r9
  * shingle-HOF O(tokens²) pathology — see BASELINE.md "Third scaling
  * decade"); repoint the body at whatever needs decomposing next. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graftdata/sf0.3")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    t("full importanceWeights (fresh jvm, first op)")(
      graft.ops.LanguageModel.importanceWeights(
        docs, docs.filter(col("lang") === "en"), "text", "doc_id", 128).count())
    t("full importanceWeights (second)")(
      graft.ops.LanguageModel.importanceWeights(
        docs, docs.filter(col("lang") === "en"), "text", "doc_id", 128).count())
    spark.stop()
  }
}
