package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage-decomposition harness (`runMain graft.PlanProbe
  * [sfDir]`) — times an operator's pipeline stage by stage in one
  * session, the complement to [[BenchOne]]'s whole-query reps. Current
  * target: the q96 incremental-curation capstone (r21 — which consumer
  * of the published indexes owns the 3.3 s); repoint the body at
  * whatever needs decomposing next. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
    }
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val batch = docs.filter(col("doc_id") % 10 === 0)
    // durable indexes, built once untimed (the q96 warmer shape)
    val sigDir = s"${sys.props("java.io.tmpdir")}/graft_scratch/probe_q96_sig"
    val winDir = s"${sys.props("java.io.tmpdir")}/graft_scratch/probe_q96_win"
    def wipe(d: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    wipe(sigDir); wipe(winDir)
    graft.io.SignatureIndex.build(
      docs.filter(col("doc_id") % 10 =!= 0), "text", "doc_id", sigDir,
      numHashes = 8, bands = 4, shingleWords = 3)
    graft.io.WindowIndex.build(
      docs.filter(col("doc_id") % 10 =!= 0), "text", "doc_id", winDir, n = 3)
    val yaml =
      """corpus_filters:
        |  - filter: min_tokens
        |    min: 20
        |  - filter: max_tokens
        |    max: 100000
        |  - filter: languages
        |    allow: ["en", "fr", "es"]
        |  - filter: min_quality
        |    min: 0.3
        |  - filter: max_repetition
        |    max: 0.5
        |""".stripMargin
    (1 to 2).foreach { rep =>
      t(s"rep $rep: quality decide")(graft.ops.CorpusFilters.decide(
        batch, "text", "doc_id",
        graft.config.PipelineConfig.parseCorpusFilters(yaml))
        .filter(col("kept")).count())
      val pairs = graft.io.SignatureIndex.probe(
        docs, batch, "text", sigDir, threshold = 0.8)
      t(s"rep $rep: sig probe")(pairs.count())
      val keepIds = graft.ops.Dedup.incrementalDedupDecisions(batch, pairs, "doc_id")
        .filter(col("keep")).select("doc_id")
      t(s"rep $rep: dedup decisions")(keepIds.count())
      val quality = graft.ops.CorpusFilters.decide(
        batch, "text", "doc_id",
        graft.config.PipelineConfig.parseCorpusFilters(yaml))
        .filter(col("kept")).select("doc_id")
      val kept = batch
        .join(broadcast(quality), Seq("doc_id"), "left_semi")
        .join(broadcast(keepIds), Seq("doc_id"), "left_semi")
      val cleaned = graft.io.WindowIndex.scrubProbe(kept, "text", winDir)
        .select(col("doc_id"), col("clean"))
        .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      t(s"rep $rep: scrub probe + lang join")(cleaned.count())
      t(s"rep $rep: pack sequences")(graft.ops.Packing.packSequences(
        cleaned, "clean", "lang", "doc_id", budget = 512L).count())
    }
    spark.stop()
  }
}
