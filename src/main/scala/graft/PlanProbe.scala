package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
      .localCheckpoint()
    val df = graft.ops.TextOps.winnowingFingerprints(docs, "text", "doc_id", 5, 4)
      .select(col("doc_id"), explode(col("fingerprints")).as("fp"))
    val plan = df.queryExecution.optimizedPlan.toString
    println("[planprobe] transform count: " + "transform\\(".r.findAllIn(plan).length)
    println("[planprobe] separate projects: " + "Project".r.findAllIn(plan).length)
    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      df.count()
      println(f"[planprobe] rep$r 50-doc count: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    // isolate stages: codes only, then hashes only
    val codes = docs.select(transform(split(col("text"), ""), ch => ascii(ch)).as("__codes"))
    val t1 = System.nanoTime(); codes.count()
    println(f"[planprobe] codes-only: ${(System.nanoTime()-t1)/1e9}%.2f s")
    val hashes = codes.select(graft.ops.TextOps.rollingHashesFromCodes(col("__codes"), 5).as("__h"))
    val t2 = System.nanoTime(); hashes.count()
    println(f"[planprobe] codes+hash: ${(System.nanoTime()-t2)/1e9}%.2f s")
    spark.stop()
  }
}
