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

  test("gopher rules: each structural fence fires on its crafted doc") {
    // every doc clears min_tokens(3) so the structural rules decide
    val fs = Seq[CorpusFilters.Filter](
      CorpusFilters.MinTokens(3),
      CorpusFilters.MeanWordLenBand(3.0, 10.0),
      CorpusFilters.MaxSymbolRatio(0.1),
      CorpusFilters.MinAlphaWordRatio(0.8),
      CorpusFilters.MinStopwordHits(2))
    val docs = Seq(
      (1L, "the cat sat with dogs and birds near those warm houses"),
      (2L, "a b c d e f g h i j"),              // mean word len 1 -> band
      (3L, "extraordinarily incomprehensible " * 3 +
        "internationalization considerations"), // mean len > 10 -> band
      (4L, "the cat ... and ... dog ... with ... bird ... runs"), // symbols
      (5L, "the 1234 5678 9012 3456 7890 1234 5678 9012 and"), // 2/10 alpha
      (6L, "cats dogs birds mice horses goats sheep cows hens ducks"))
      .toDF("doc_id", "text")
    val out = CorpusFilters.decide(docs, "text", "doc_id", fs)
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(out(1L).isEmpty)
    assert(out(2L) == Some("mean_word_len"))
    assert(out(3L) == Some("mean_word_len"))
    assert(out(4L) == Some("max_symbol_ratio"))
    assert(out(5L) == Some("min_alpha_word_ratio"))
    assert(out(6L) == Some("min_stopword_hits")) // word salad: no stopwords
  }

  test("gopher stopword floor: whole tokens only, case-folded, distinct") {
    def kept(text: String): Boolean =
      CorpusFilters.decide(Seq((1L, text)).toDF("doc_id", "text"),
        "text", "doc_id", Seq(CorpusFilters.MinStopwordHits(2)))
        .head().getBoolean(1)
    assert(kept("THE cat AND dog"))          // case-folds
    assert(!kept("theory android otherwise")) // substrings don't count
    assert(!kept("the the the the"))          // distinct words, not hits
    assert(kept("of with"))
    // hand-rolled list validation fails loudly
    intercept[IllegalArgumentException] {
      CorpusFilters.MinStopwordHits(2, Seq("the", "bad'word"))
    }
    intercept[IllegalArgumentException] { CorpusFilters.MinStopwordHits(9) }
  }

  test("gopher chain on the real corpus: splits and reasons are sane") {
    val docs = TestSpark.table("documents")
    val out = CorpusFilters.decide(docs, "text", "doc_id",
      CorpusFilters.gopherRules(minTokens = 30L, minStopwords = 1))
    val byReason = out.groupBy("drop_reason").count()
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(byReason.getOrElse(None, 0L) > 0L, "some docs must survive")
    assert(byReason.size >= 2, "at least one rule must fire on the fixture")
    assert(out.count() == docs.count(), "every doc keeps a verdict row")
  }
}
