package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.PipelineConfig
import graft.ops.{CorpusFilters, TextOps}

class CorpusFiltersSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val yaml =
    """corpus_filters:
      |  - filter: min_tokens
      |    min: 3
      |  - filter: languages
      |    allow: ["en"]
      |  - filter: max_repetition
      |    max: 0.4
      |""".stripMargin

  test("YAML binds to the filter chain in order") {
    val fs = PipelineConfig.parseCorpusFilters(yaml)
    assert(fs == Seq(
      CorpusFilters.MinTokens(3),
      CorpusFilters.AllowLangs(Seq("en")),
      CorpusFilters.MaxRepetition(0.4)))
  }

  test("unknown filter name fails loudly") {
    val err = intercept[IllegalArgumentException] {
      PipelineConfig.parseCorpusFilters(
        "corpus_filters:\n  - filter: vibes\n    min: 1\n")
    }
    assert(err.getMessage.contains("vibes"))
  }

  test("decide: first failing filter names the drop reason, in config order") {
    val docs = Seq(
      // passes everything: enough English stopword markers, no repetition
      (1L, "the cat and the dog are in the house with a bird"),
      (2L, "one two"), // < 3 tokens
      // 12 tokens but zero English markers → languages fence
      (3L, "uno dos tres cuatro cinco seis siete ocho nueve diez once doce"),
      // English markers BUT one 4-gram repeated many times → repetition fence;
      // also short — min_tokens is checked FIRST so reason must differ from doc 2
      (4L, "the and is of " * 10 + "the and is of")).toDF("doc_id", "text")
    val out = CorpusFilters.decide(
      docs, "text", "doc_id", PipelineConfig.parseCorpusFilters(yaml))
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), Option(r.getString(2)))).toMap
    assert(out(1L) == ((true, None)))
    assert(out(2L) == ((false, Some("min_tokens"))))
    assert(out(3L) == ((false, Some("languages"))))
    assert(out(4L) == ((false, Some("max_repetition"))),
      s"doc 4 got ${out(4L)} — expected the repetition fence")
  }

  test("the filter chain runs UNCHANGED on a stream (stateless narrow plan)") {
    val dir = TestSpark.tmpDir("cf_stream")
    val w = new java.io.PrintWriter(new java.io.File(dir, "docs.jsonl"))
    try Seq(
      (1L, "the cat and the dog are in the house with a bird"),
      (2L, "one two"),
      (3L, "uno dos tres cuatro cinco seis siete ocho nueve diez once doce"))
      .foreach { case (id, t) => w.println(s"""{"doc_id": $id, "text": "$t"}""") }
    finally w.close()
    val schema = graft.schema.Metadata.structFromSpec("\ndoc_id: long\ntext: string\n")
    val fs = PipelineConfig.parseCorpusFilters(yaml)
    val stream = CorpusFilters.decide(
      spark.readStream.schema(schema).json(dir), "text", "doc_id", fs)
    assert(stream.isStreaming, "decide must not force a batch plan")
    val name = "cf_stream_out"
    stream.writeStream.format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      .awaitTermination()
    val streamed = spark.table(name)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), Option(r.getString(2)))).toSet
    val batch = CorpusFilters.decide(
      spark.read.schema(schema).json(dir), "text", "doc_id", fs)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), Option(r.getString(2)))).toSet
    assert(streamed == batch, "stream and batch decisions must be identical")
    assert(batch.nonEmpty)
  }

  test("thresholds agree with the standalone text primitives") {
    val docs = TestSpark.table("documents").limit(200)
    val fs = Seq(CorpusFilters.MinTokens(50): CorpusFilters.Filter)
    val viaChain = CorpusFilters.decide(docs, "text", "doc_id", fs)
      .filter($"kept").select("doc_id").as[Long].collect().toSet
    val viaPrimitive = docs
      .filter(TextOps.tokenCount(col("text")) >= 50)
      .select("doc_id").as[Long].collect().toSet
    assert(viaChain == viaPrimitive)
    assert(viaChain.nonEmpty && viaChain.size < 200, "fixture must split")
  }
}
