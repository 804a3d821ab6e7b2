package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, PortableSql}
import graft.functions.PortableSql.{SparkDialect => SD}
import graft.ops.TextOps

class TextOpsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def docs = TestSpark.table("documents").limit(200)

  test("tokenCount counts single-space tokens") {
    val df = Seq("one two three", "solo", "").toDF("text")
    assert(df.select(TextOps.tokenCount(col("text"))).as[Int].collect().toSeq ==
      Seq(3, 1, 1)) // split("", " ") = [""]
  }

  test("regexTokenCount: alpha runs, digit runs, single punctuation") {
    val df = Seq("abc 123 x!y", "hello, world.").toDF("text")
    assert(df.select(TextOps.regexTokenCount(col("text"))).as[Int].collect().toSeq ==
      Seq(5, 4)) // abc|123|x|!|y ; hello|,|world|.
  }

  test("langId: obvious markers win; empty score → und") {
    val df = Seq(
      "the cat and the dog with a hat",
      "el gato y los perros con sombrero",
      "der hund und die katze mit hut",
      "xyzzy plugh").toDF("text")
    assert(df.select(TextOps.langId(col("text"))).as[String].collect().toSeq ==
      Seq("en", "es", "de", "und"))
  }

  test("qualityScore stays in [0,1]") {
    val scores = docs.select(TextOps.qualityScore(col("text"))).as[Double].collect()
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("fingerprint is casefold-and-trim invariant") {
    val df = Seq(("  Hello World ", "hello world")).toDF("a", "b")
    val r = df.select(
      TextOps.fingerprint(col("a")).as("fa"),
      TextOps.fingerprint(col("b")).as("fb")).collect()(0)
    assert(r.getString(0) == r.getString(1))
  }

  test("wordShingles: overlapping n-grams; short docs yield one shingle") {
    val df = Seq("a b c d", "a b").toDF("text")
    val out = df.select(TextOps.wordShingles(col("text"), 3)).as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq("a b"))
  }

  // Parity specs: the Column implementations and the PortableSql string
  // fragments (used by the oracle-checked queries) must never diverge.
  test("parity: tokenCount Column == PortableSql fragment") {
    val d = docs.selectExpr("doc_id", s"${PortableSql.tokenCount("text", SD)} AS a")
      .join(docs.select(col("doc_id"), TextOps.tokenCount(col("text")).cast("long").as("b")), "doc_id")
    assert(d.filter(col("a") =!= col("b")).count() == 0)
  }

  test("parity: langId Column == PortableSql fragment") {
    val d = docs.selectExpr("doc_id", s"${PortableSql.langId("text", SD)} AS a")
      .join(docs.select(col("doc_id"), TextOps.langId(col("text")).as("b")), "doc_id")
    assert(d.filter(col("a") =!= col("b")).count() == 0)
  }

  // Kernel parity: the graft_* codegen kernels must match the portable
  // formulations bit-for-bit on real corpus data AND adversarial edges
  // (empty text, runs of spaces, unicode, marker ties). The portable
  // side below is ALWAYS the pre-kernel Column/SQL form.
  private def edgeDocs = {
    val rows = Seq[(Long, Option[String])](
      1L -> Some(""),
      2L -> Some(" "),
      3L -> Some("   "),
      4L -> Some("the the the the"),
      5L -> Some(" the and with el los con "), // en/es tie → first in table order
      6L -> Some("thethethe unpadded markers never match"),
      7L -> Some("café naïve 中文 text the and"),
      8L -> Some("a b"), // fewer tokens than the shingle width
      9L -> Some("x"), // single token
      10L -> Some("der und mit der und mit"), // de markers, repeated shingles
      11L -> Some("THE AND WITH upper case folds"), // lower() parity
      12L -> Some("spam spam spam spam spam spam"),
      13L -> None) // NULL text: langId must agree ('und'), the rest NULL
    rows.toDF("doc_id", "text")
  }

  // null-SAFE comparison (`<=>`): a plain =!= filter evaluates NULL on a
  // NULL-vs-value divergence and silently drops the row it should flag
  test("kernel parity: graft_token_count == size(split) on corpus + edges") {
    for (d <- Seq(docs, edgeDocs)) {
      val j = d.selectExpr("doc_id", s"${PortableSql.tokenCountPortable("text")} AS a")
        .join(d.selectExpr("doc_id", "graft_token_count(text) AS b"), "doc_id")
      assert(j.filter(!(col("a") <=> col("b"))).count() == 0)
    }
  }

  test("kernel parity: graft_lang_id == portable argmax CASE on corpus + edges") {
    for (d <- Seq(docs, edgeDocs)) {
      val j = d.selectExpr("doc_id", s"${PortableSql.langIdPortable("text")} AS a")
        .join(d.selectExpr("doc_id", "graft_lang_id(text) AS b"), "doc_id")
      assert(j.filter(!(col("a") <=> col("b"))).count() == 0)
    }
  }

  test("kernel parity: graft_dup_ratio == HOF shingle ratio on corpus + edges") {
    for (d <- Seq(docs, edgeDocs)) {
      val j = d.select(col("doc_id"),
        TextOps.duplicateShingleRatio(col("text"), 3).as("a"))
        .join(d.selectExpr("doc_id", "round(graft_dup_ratio(text, 3), 6) AS b"), "doc_id")
      assert(j.filter(!(col("a") <=> col("b"))).count() == 0)
    }
  }

  test("kernel parity: graft_word_shingles == HOF shingle array on corpus + edges") {
    for (d <- Seq(docs, edgeDocs); n <- Seq(2, 3, 4)) {
      val j = d.select(col("doc_id"), TextOps.wordShingles(col("text"), n).as("a"))
        .join(d.selectExpr("doc_id", s"graft_word_shingles(text, $n) AS b"), "doc_id")
      assert(j.filter(!(col("a") <=> col("b"))).count() == 0,
        s"kernel/HOF shingle divergence at n=$n")
    }
  }

  test("graft_nfc: composes decomposed sequences, identity on ASCII/NFC, null-propagates, stays fused") {
    val rows = Seq[(Long, Option[String])](
      1L -> Some("plain ascii stays identical"),
      2L -> Some("cafe\u0301 re\u0301sume\u0301"), // decomposed, via escapes
      3L -> Some("caf\u00e9 already composed"), // NFC already
      4L -> Some("mixed A\u030a ring and \uFFFD junk"), // A+ring composes; FFFD untouched
      5L -> Some("astral 😀 surrogate pair ok"),
      6L -> None)
    val df = rows.toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        GraftFunctions.nfc(spark, col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L).contains("plain ascii stays identical"))
    assert(got(2L).contains("caf\u00e9 r\u00e9sum\u00e9")) // composed
    assert(got(3L).contains("caf\u00e9 already composed"))
    assert(got(4L).contains("mixed \u00c5 ring and \uFFFD junk"))
    assert(got(5L).contains("astral 😀 surrogate pair ok"))
    assert(got(6L).isEmpty)
    // length drops by exactly the number of combining marks composed
    val saved = df.filter(col("doc_id") === 2L)
      .select(length(col("text")) - length(GraftFunctions.nfc(spark, col("text"))))
      .collect()(0).getInt(0)
    assert(saved == 3)
    // fusion: the kernel must stay inside whole-stage codegen (over a
    // parquet scan — a local Seq constant-folds to LocalTableScan)
    val plan = TestSpark.table("documents")
      .select(GraftFunctions.nfc(spark, col("text")))
      .queryExecution.executedPlan
    val fused = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec
          if w.toString.contains("graft_nfc") => w
    }
    assert(fused.nonEmpty, s"graft_nfc not inside WholeStageCodegen:\n$plan")
  }

  test("graft_fold_accents: folds diacritics/ligatures/width, ASCII identity, null-propagates") {
    val rows = Seq[(Long, Option[String])](
      1L -> Some("plain ascii stays identical"),
      2L -> Some("café résumé ñ ç"), // composed accents
      3L -> Some("café decomposed"), // combining acute
      4L -> Some("ﬁle ligature and Ａ fullwidth"), // ﬁ, Ａ (NFKD)
      5L -> None)
    val got = rows.toDF("doc_id", "text")
      .select(col("doc_id"),
        GraftFunctions.foldAccents(spark, col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L).contains("plain ascii stays identical"))
    assert(got(2L).contains("cafe resume n c"))
    assert(got(3L).contains("cafe decomposed"))
    assert(got(4L).contains("file ligature and A fullwidth"))
    assert(got(5L).isEmpty)
    // idempotent, and NOT the same as NFC (folding is lossy on purpose)
    val once = graft.functions.TextKernels.foldAccents(
      org.apache.spark.unsafe.types.UTF8String.fromString("élève"))
    assert(once.toString == "eleve")
    assert(graft.functions.TextKernels.foldAccents(once).toString == "eleve")
  }

  test("kernel: null text → null (lang_id → 'und'), wrong type fails analysis") {
    val df = Seq[(Long, Option[String])](1L -> None).toDF("doc_id", "text")
    val r = df.selectExpr(
      "graft_token_count(text)", "graft_lang_id(text)",
      "graft_dup_ratio(text, 3)").collect()(0)
    // lang_id is NOT null-propagating: the portable CASE form and the
    // DuckDB oracle both fall through NULL scores to ELSE 'und'
    assert(r.isNullAt(0) && r.getString(1) == "und" && r.isNullAt(2))
    val bad = intercept[Exception] {
      Seq(1L).toDF("x").selectExpr("graft_lang_id(x)").collect()
    }
    assert(bad.getMessage.contains("string"))
  }

  test("parity: qualityScore Column == PortableSql fragment") {
    val d = docs.selectExpr("doc_id", s"${PortableSql.qualityScore("text", SD)} AS a")
      .join(docs.select(col("doc_id"), TextOps.qualityScore(col("text")).as("b")), "doc_id")
    assert(d.filter(col("a") =!= col("b")).count() == 0)
  }

  test("parity: fingerprint Column == PortableSql fragment") {
    val d = docs.selectExpr("doc_id", s"${PortableSql.fingerprint("text")} AS a")
      .join(docs.select(col("doc_id"), TextOps.fingerprint(col("text")).as("b")), "doc_id")
    assert(d.filter(col("a") =!= col("b")).count() == 0)
  }

  test("parity: wordShingles == PortableSql shingles fragment") {
    val frag = SD.shingles(SD.tokens("text"), 3)
    val d = docs.selectExpr("doc_id", s"$frag AS a")
      .join(docs.select(col("doc_id"), TextOps.wordShingles(col("text"), 3).as("b")), "doc_id")
    assert(d.filter(col("a") =!= col("b")).count() == 0)
  }

  test("duplicateShingleRatio: known values, 0 for unique text, high for loops") {
    val df = Seq(
      (1L, "a b c a b c"), // 4 shingles, 3 distinct -> 0.25
      (2L, "w x y z"), // all distinct -> 0.0
      (3L, "spam spam spam spam spam spam") // 4 shingles, 1 distinct -> 0.75
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      TextOps.duplicateShingleRatio(col("text"), 3).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(out(1L) == 0.25 && out(2L) == 0.0 && out(3L) == 0.75)
  }

  test("scrub removes emails and urls, counts report the matches") {
    val df = Seq(
      (1L, "reach bob.smith+x@sub.example.co or https://a.example/p?q=1&r=2 today"),
      (2L, "no pii here at all"),
      (3L, "https://one.example/x then two@ex.io and three.four@ex.org end")
    ).toDF("doc_id", "text")
    val out = df.select(
      col("doc_id"),
      TextOps.scrub(col("text")).as("clean"),
      TextOps.matchCount(col("text"), TextOps.emailPattern).as("ne"),
      TextOps.matchCount(col("text"), TextOps.urlPattern).as("nu"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L)._1 == "reach <scrubbed> or <scrubbed> today")
    assert(out(1L)._2 == 1 && out(1L)._3 == 1)
    assert(out(2L) == (("no pii here at all", 0L, 0L)))
    assert(out(3L)._1 == "<scrubbed> then <scrubbed> and <scrubbed> end")
    assert(out(3L)._2 == 2 && out(3L)._3 == 1)
  }

  test("rolling hashes: known polynomial values, one hash per position") {
    val df = Seq((1L, "abcdef")).toDF("doc_id", "text")
    val hs = df.select(
      TextOps.rollingHashesFromCodes(
        transform(split(col("text"), ""), ch => ascii(ch)), 3).as("h"))
      .collect()(0).getSeq[Long](0)
    def ref(s: String): Long =
      s.map(_.toLong).zip(Seq(257L * 257, 257L, 1L)).map { case (c, p) => c * p }.sum % 1000003L
    assert(hs == Seq("abc", "bcd", "cde", "def").map(ref))
  }

  test("winnowing: docs shorter than k yield empty fingerprints, not errors") {
    val df = Seq((1L, "ab"), (2L, ""), (3L, "long enough text here")).toDF("doc_id", "text")
    val out = TextOps.winnowingFingerprints(df, "text", "doc_id", 5, 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L).isEmpty && out(2L).isEmpty)
    assert(out(3L).nonEmpty)
  }

  test("winnowing Expression == HOF reference formulation (fingerprint sets)") {
    // the HOF form is the template for the DuckDB oracle; the Expression
    // is the execution path — their fingerprint SETS must agree exactly.
    // Stages materialized in separate projections (the HOF form's
    // contract; see winnowingFingerprints scaladoc).
    val docs50 = docs.limit(50)
    val viaExpr = TextOps.winnowingFingerprints(docs50, "text", "doc_id", 5, 4)
      .select(col("doc_id"), explode(col("fingerprints")).as("fp"))
      .as[(Long, Long)].collect().toSet
    val viaHof = docs50
      .select(col("doc_id"), TextOps.charCodes(col("text")).as("__codes"))
      .select(col("doc_id"), TextOps.rollingHashesFromCodes(col("__codes"), 5).as("__h"))
      .select(col("doc_id"), TextOps.winnowingFromHashes(col("__h"), 4).as("fps"))
      .select(col("doc_id"), explode(col("fps")).as("fp"))
      .as[(Long, Long)].collect().toSet
    assert(viaExpr == viaHof)
    assert(viaExpr.nonEmpty)
  }

  test("dedupLines keeps first occurrences in document order") {
    val df = Seq(
      (1L, "b\na\nb\nc\na"),
      (2L, "solo"),
      (3L, "x\nx\nx")).toDF("doc_id", "text")
    val out = df.select($"doc_id", TextOps.dedupLines($"text").as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "b\na\nc", "order preserved, later dups dropped")
    assert(out(2L) == "solo")
    assert(out(3L) == "x")
  }

  test("feature hashing: tf conservation, fixed width, repeated tokens sum") {
    val df = Seq(
      (1L, "a b a b a"),   // 5 tokens, 2 distinct
      (2L, "c"),
      (3L, "a")).toDF("doc_id", "text")
    val out = TextOps.hashedTermFrequencies(df, "text", "doc_id", dims = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every token lands somewhere: per-doc tf sums equal token counts
    val perDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(perDoc == Map(1L -> 5L, 2L -> 1L, 3L -> 1L))
    assert(out.forall(r => r._2 >= 0 && r._2 < 8))
    // same token → same bucket in every doc
    val bucketOfA = out.filter(r => r._1 == 3L).head._2
    assert(out.filter(_._1 == 1L).map(_._2).contains(bucketOfA))
    // collisions sum: with dims=2 doc 1's two distinct tokens either
    // share one bucket (one row, tf 5) or split (two rows summing 5)
    val tiny = TextOps.hashedTermFrequencies(df.filter($"doc_id" === 1), "text", "doc_id", 2)
      .collect().map(_.getLong(2)).sum
    assert(tiny == 5L)
  }

  test("char entropy kernel: known values, degenerate text scores low") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.TextKernels
    // H("abca") = −(½ln½ + ¼ln¼·2) ≈ 1.039721
    assert(math.abs(
      TextKernels.charEntropy(UTF8String.fromString("abca")) - 1.0397207708399179) < 1e-12)
    assert(TextKernels.charEntropy(UTF8String.fromString("aaaa")) == 0.0)
    assert(TextKernels.charEntropy(UTF8String.fromString("")) == 0.0)
    // surrogate pairs count as ONE code point (matches DuckDB's split)
    assert(TextKernels.charEntropy(UTF8String.fromString("😀")) == 0.0)
    val natural = TextKernels.charEntropy(
      UTF8String.fromString("the quick brown fox jumps over the lazy dog"))
    val mash = TextKernels.charEntropy(UTF8String.fromString("aaaaabbbbbaaaaabbbbb"))
    assert(natural > 2.5 && mash < 1.2)
  }

  test("quality signals: known values on a crafted doc, zero-shuffle shape") {
    val df = Seq(
      (1L, "aa bb aa CC 99"),   // 5 toks, 4 distinct; 14 chars
      (2L, "x x x x")).toDF("doc_id", "text")
    val out = TextOps.qualitySignals(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val (ttr1, _, mwl1, dig1, up1) = out(1L)
    assert(ttr1 == 0.8)                    // 4 distinct / 5 tokens
    assert(mwl1 == 2.0)                    // (14 − 4) / 5
    assert(dig1 == math.rint(2.0 / 14 * 1e6) / 1e6)
    assert(up1 == dig1)                    // 2 uppercase of 14
    val (ttr2, ent2, _, _, _) = out(2L)
    assert(ttr2 == 0.25 && ent2 > 0)       // 1 distinct / 4 tokens
    // scan-speed contract: no exchange anywhere in the plan
    val plan = TextOps.qualitySignals(df, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected a narrow plan:\n$plan")
  }

  test("qualitySignals runs UNCHANGED on a stream (stateless narrow plan)") {
    val dir = TestSpark.tmpDir("qs_stream")
    val w = new java.io.PrintWriter(new java.io.File(dir, "docs.jsonl"))
    try Seq(
      (1L, "the cat and the dog are in the house with a bird"),
      (2L, "AAAA 1234 aaaa"),
      (3L, "uno dos tres cuatro cinco seis siete ocho"))
      .foreach { case (id, t) => w.println(s"""{"doc_id": $id, "text": "$t"}""") }
    finally w.close()
    val schema = graft.schema.Metadata.structFromSpec("\ndoc_id: long\ntext: string\n")
    val stream = TextOps.qualitySignals(
      TestSpark.spark.readStream.schema(schema).json(dir), "text", "doc_id")
    assert(stream.isStreaming, "qualitySignals must not force a batch plan")
    val name = "qs_stream_out"
    stream.writeStream.format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      .awaitTermination()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0),
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
        .toSet
    val streamed = rows(TestSpark.spark.table(name))
    val batch = rows(TextOps.qualitySignals(
      TestSpark.spark.read.schema(schema).json(dir), "text", "doc_id"))
    assert(streamed == batch, "stream and batch signals must be identical")
    assert(batch.nonEmpty)
  }

  test("hashed tf-idf vectors: unit norm, fixed width, idf downweights common terms") {
    val df = Seq(
      (1L, "rare alpha shared shared"),
      (2L, "rare beta shared shared"),
      (3L, "gamma delta shared shared")).toDF("doc_id", "text")
    // dims=64: the five distinct tokens land in five distinct buckets
    // (md5 is fixed, so this is a stable property of the fixture)
    val out = TextOps.hashedTfidfVectors(df, "text", "doc_id", dims = 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out.values.forall(_.length == 64))
    // normalized: ||v|| ≈ 1 (weights rounded to 6dp before the cast)
    out.values.foreach { v =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-4, s"norm was $n")
    }
    // 'shared' occurs in EVERY doc → idf 0 → its bucket carries no
    // weight; docs 1/2 agree on 'rare', disagree on alpha/beta, and
    // doc 3 shares only the zero-weight term with either
    def cos(a: Seq[Float], b: Seq[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    assert(cos(out(1L), out(2L)) > 0.05)
    assert(cos(out(1L), out(3L)) < 1e-6)
    // a doc made ONLY of zero-idf terms has no direction → dropped
    val allShared = Seq((1L, "x y"), (2L, "x y"), (3L, "x y"))
      .toDF("doc_id", "text")
    assert(TextOps.hashedTfidfVectors(allShared, "text", "doc_id", 8).count() == 0)
  }

  test("winnowing Expression stays inside whole-stage codegen") {
    // a CodegenFallback here would force the WHOLE projection onto the
    // interpreted path; the static-call doGenCode keeps the stage fused
    val plan = TextOps.winnowingFingerprints(docs.limit(10), "text", "doc_id", 5, 4)
      .queryExecution.executedPlan
    val fused = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec
          if w.toString.contains("graft_winnow") => w
    }
    assert(fused.nonEmpty, s"graft_winnow not inside WholeStageCodegen:\n$plan")
  }

  test("winnowing: exact dups share all fingerprints; an edit only moves local ones") {
    val base = "the quick brown fox jumps over the lazy dog while counting stars at midnight"
    val edited = base.replace("jumps", "leaps") // one local edit
    val df = Seq((1L, base), (2L, base), (3L, edited)).toDF("doc_id", "text")
    val fps = TextOps.winnowingFingerprints(df, "text", "doc_id", 5, 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fps(1L) == fps(2L), "identical text -> identical fingerprint set")
    val overlap = fps(1L).intersect(fps(3L)).size.toDouble / fps(1L).size
    assert(overlap > 0.5, s"local edit must preserve most fingerprints, got $overlap")
    assert(fps(1L) != fps(3L), "the edit must disturb SOME fingerprints")
  }

  test("boilerplateReport: shared windows counted across docs and sources") {
    val df = Seq(
      (1L, "s1", "visit our great site now please"),
      (2L, "s1", "also visit our great site now"),
      (3L, "s2", "visit our great site now again today")
    ).toDF("doc_id", "source", "text")
    val got = TextOps.boilerplateReport(df, "text", "doc_id", "source", n = 4, k = 3)
      .as[(String, Long, Long, Long)].collect()
    val m = got.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(m("visit our great site") == ((3L, 3L, 2L)))
    assert(m("our great site now") == ((3L, 3L, 2L)))
    assert(got.map(_._2).sliding(2).forall(p => p(0) >= p(1)), "ranked by occurrences")
  }

  test("winnowing guarantee: docs sharing a long substring share a fingerprint") {
    val shared = "a sufficiently long shared passage of text"
    val df = Seq(
      (1L, s"prefix one $shared and unrelated tail content here"),
      (2L, s"completely different opening $shared closing words")).toDF("doc_id", "text")
    val fps = TextOps.winnowingFingerprints(df, "text", "doc_id", 5, 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fps(1L).intersect(fps(2L)).nonEmpty,
      "shared substring >= k+w-1 chars must contribute a shared fingerprint")
  }

  test("scrub stops URL matches at any whitespace, not just spaces") {
    val df = Seq((1L, "see https://a.example\nNext line intact\tand https://b.example/x\tkept"))
      .toDF("doc_id", "text")
    val clean = df.select(TextOps.scrub(col("text"))).collect()(0).getString(0)
    // newline/tab and the words after them must survive the scrub
    assert(clean == "see <scrubbed>\nNext line intact\tand <scrubbed>\tkept")
  }

  test("chunkDocuments: exact windows, redundant tail dropped, short-doc edge") {
    val df = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens
      (2L, "x y"), //  2 tokens: single short chunk
      (3L, "")). //  split("", " ") = [""]: one 1-token chunk
      toDF("doc_id", "text")
    val got = TextOps.chunkDocuments(df, "text", "doc_id", chunkTokens = 4, overlap = 2)
      .as[(Long, Long, String, Long)].collect().toSet
    // starts step by stride 2; start 8 would give [i j] ⊆ [g h i j] — dropped
    assert(got == Set(
      (1L, 0L, "a b c d", 4L),
      (1L, 1L, "c d e f", 4L),
      (1L, 2L, "e f g h", 4L),
      (1L, 3L, "g h i j", 4L),
      (2L, 0L, "x y", 2L),
      (3L, 0L, "", 1L)))
  }

  test("chunkDocuments: every token covered; overlap 0 partitions exactly") {
    val sample = docs.select(col("doc_id"), col("text"))
    val chunks = TextOps.chunkDocuments(sample, "text", "doc_id", 16, 4)
      .groupBy("doc_id")
      .agg(sum("n_tokens").as("covered"), count(lit(1)).as("n_chunks"))
      .join(sample.select(col("doc_id"), TextOps.tokenCount(col("text")).cast("long").as("n")), "doc_id")
      .as[(Long, Long, Long, Long)].collect()
    // with overlap 4, chunk k>0 re-covers exactly 4 tokens of its predecessor
    assert(chunks.nonEmpty && chunks.forall { case (_, covered, nChunks, n) =>
      covered == n + 4L * (nChunks - 1) })
    val exact = TextOps.chunkDocuments(sample, "text", "doc_id", 16, 0)
      .groupBy("doc_id").agg(sum("n_tokens").as("covered"))
      .join(sample.select(col("doc_id"), TextOps.tokenCount(col("text")).cast("long").as("n")), "doc_id")
      .as[(Long, Long, Long)].collect()
    assert(exact.forall { case (_, covered, n) => covered == n })
    // zero shuffles: chunking must stay a narrow scan-speed explode
    // (pinned on the un-limited scan — the fixture's limit(200) adds
    // its own single-partition exchange)
    val plan = TextOps.chunkDocuments(
        TestSpark.table("documents"), "text", "doc_id", 16, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking plan must not shuffle:\n$plan")
  }

  test("chunkDocuments rejects degenerate geometry") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextOps.chunkDocuments(df, "text", "doc_id", chunkTokens = 4, overlap = 4)
    }
    intercept[IllegalArgumentException] {
      TextOps.chunkDocuments(df, "text", "doc_id", chunkTokens = 0, overlap = 0)
    }
  }

  private def profile(s: String): Seq[Long] = {
    val r = graft.functions.TextKernels.scriptProfile(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    (0 until 10).map(r.getLong)
  }

  test("scriptProfile: hand-counted per-script code points") {
    // "abc Привет 42." -> 14 cps: 3 latin, 6 cyrillic, 2 digit,
    // 3 other (two spaces + dot)
    assert(profile("abc Привет 42.") ==
      Seq(14L, 3L, 6L, 0L, 0L, 0L, 0L, 0L, 2L, 3L))
    // latin block edges: × (D7) and ÷ (F7) are OTHER, é/ÿ/Ā are latin
    assert(profile("é×ÿ÷Ā") == Seq(5L, 3L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 2L))
    // kana + unified + hangul all count as cjk; greek/arabic/hebrew/
    // devanagari blocks each land in their own bucket
    assert(profile("あ你한αبאन") == Seq(7L, 0L, 0L, 1L, 1L, 1L, 1L, 3L, 0L, 0L))
    // combining devanagari vowel signs are code points in 0900-097F
    assert(profile("नमस्ते") == Seq(6L, 0L, 0L, 0L, 0L, 0L, 6L, 0L, 0L, 0L))
    // non-BMP (emoji, 4-byte) counts one code point in OTHER — same as
    // DuckDB's length() over the single code point
    assert(profile("a😀b") == Seq(3L, 2L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 1L))
    assert(profile("") == Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
  }

  private def lcs(a: String, b: String): Long =
    graft.functions.LcsCount.tokenLcs(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("lcsCount: hand-traced token LCS, subsequence not substring") {
    assert(lcs("the quick brown fox jumps over the lazy dog",
      "quick fox jumps lazy dog") == 5L)
    assert(lcs("a b c d e", "x y z") == 0L)
    // interleaved repeats: LCS of 'a b a b a' / 'b a b' is 'b a b'
    assert(lcs("a b a b a", "b a b") == 3L)
    assert(lcs("hello", "hello") == 1L)
    // order matters: tokens common but reversed give only 1
    assert(lcs("a b c", "c b a") == 1L)
    // double spaces produce empty tokens that can match (the
    // string_split(' ') contract both engines share)
    assert(lcs("a  b", "c  d") == 1L)
    // brute-force cross-check on random-ish small token streams
    def brute(a: Seq[String], b: Seq[String]): Int = {
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
        else math.max(dp(i - 1)(j), dp(i)(j - 1))
      dp(a.length)(b.length)
    }
    val vocab = Array("w0", "w1", "w2", "w3")
    for (seed <- 1 to 20) {
      val a = (0 until 15).map(i => vocab((seed * 7 + i * 13) % 4))
      val b = (0 until 6).map(i => vocab((seed * 11 + i * 5) % 4))
      assert(lcs(a.mkString(" "), b.mkString(" ")) == brute(a, b).toLong,
        s"seed $seed")
    }
  }

  test("lcsCount kernel: SQL surface and null propagation") {
    val df = Seq((1L, "a b c", "a c"), (2L, null.asInstanceOf[String], "a"))
      .toDF("id", "a", "b")
    val got = df.select(col("id"),
        GraftFunctions.lcsCount(spark, col("a"), col("b")).as("l"))
      .orderBy("id").collect()
    assert(got(0).getLong(1) == 2L)
    assert(got(1).isNullAt(1))
  }

  test("scriptProfile kernel: SQL surface, null propagation, codegen") {
    val df = Seq((1L, "hi Привет"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val got = df.select(col("id"),
        GraftFunctions.scriptProfile(spark, col("text")).as("p"))
      .selectExpr("id", "p.n_chars", "p.n_latin", "p.n_cyrillic")
      .orderBy("id").collect()
    assert(got(0).getLong(1) == 9L && got(0).getLong(2) == 2L &&
      got(0).getLong(3) == 6L)
    assert(got(1).isNullAt(1))
    // the projection must stay inside whole-stage codegen (a literal
    // Seq collapses to LocalTableScan, so pin over a range scan)
    val plan = spark.range(10)
      .select(GraftFunctions.scriptProfile(spark,
        concat(lit("doc "), col("id").cast("string"))))
      .queryExecution.executedPlan.toString
    // "*(1) Project" = the projection fused into a WholeStageCodegen span
    assert(plan.contains("*(1) Project"), plan)
  }

  test("vocabularyGrowth: hand curve, first-occurrence attribution") {
    // ids 0..3, 2 buckets: {0,1} -> bucket 0, {2,3} -> bucket 1
    val docs = Seq(
      (0L, "a b a"),          // new: a, b      (3 tokens)
      (1L, "b c"),            // new: c         (2 tokens)
      (2L, "a c d d"),        // new: d         (4 tokens)
      (3L, "d e"))            // new: e         (2 tokens)
      .toDF("doc_id", "text")
    val got = TextOps.vocabularyGrowth(docs, "text", "doc_id", buckets = 2)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (0L, 2L, 5L, 3L, 5L, 3L),
      (1L, 2L, 6L, 2L, 11L, 5L)))
    // partitioning-invariant (integer core)
    val got7 = TextOps.vocabularyGrowth(docs.repartition(7), "text",
        "doc_id", buckets = 2)
      .orderBy("bucket").collect().map(r => r.toSeq)
    assert(got7.toSeq == got.map(_.productIterator.toSeq).toSeq)
    // a vocabulary-saturated corpus flattens: bucket 1 adds no types
    val sat = TextOps.vocabularyGrowth(
      Seq((0L, "x y"), (1L, "y x"), (2L, "x y x"), (3L, "y")).toDF("doc_id", "text"),
      "text", "doc_id", buckets = 2).orderBy("bucket").collect()
    assert(sat(0).getLong(3) == 2L && sat(1).getLong(3) == 0L)
    assert(sat(1).getLong(5) == 2L) // cum_types stays flat
  }

  test("hostBoilerplateScrub: host chrome removed, rare lines kept, small hosts untouched") {
    val pages = Seq(
      // host A (4 pages): NAV on all, PROMO on 2 (50% -> boiler at 0.5)
      (1L, "A", "NAV\ncontent one\nPROMO"),
      (2L, "A", "NAV\ncontent two"),
      (3L, "A", "NAV\ncontent three\nPROMO"),
      (4L, "A", "NAV\ncontent four"),
      // host B (2 pages < minPages 3): identical chrome survives
      (5L, "B", "NAV\nb content"),
      (6L, "B", "NAV\nb other")
    ).toDF("doc_id", "host", "page")
    val got = TextOps.hostBoilerplateScrub(pages, "page", "doc_id", "host",
        minPages = 3L, maxFrac = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == (("content one", 3L, 1L)))
    assert(got(2L) == (("content two", 2L, 1L)))
    assert(got(3L) == (("content three", 3L, 1L)))
    assert(got(4L) == (("content four", 2L, 1L)))
    // under minPages the host keeps everything, chrome included
    assert(got(5L) == (("NAV\nb content", 2L, 2L)))
    assert(got(6L) == (("NAV\nb other", 2L, 2L)))
    // line ORDER is preserved in the rebuild (not just membership)
    val keep = TextOps.hostBoilerplateScrub(
      Seq((1L, "A", "z last\nNAV\na first"), (2L, "A", "NAV\nmid"),
        (3L, "A", "NAV\nend")).toDF("doc_id", "host", "page"),
      "page", "doc_id", "host", minPages = 3L, maxFrac = 0.9)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(keep(1L) == "z last\na first")
    intercept[IllegalArgumentException] {
      TextOps.hostBoilerplateScrub(pages, "page", "doc_id", "host", minPages = 1L)
    }
  }

  test("langConfusability: identical profiles cosine 1, disjoint pairs absent, hand dot") {
    val docs = Seq(
      (1L, "abcd", "x"), (2L, "abcd", "y"),  // identical trigram profiles
      (3L, "zzzz", "w")                       // disjoint from both
    ).toDF("doc_id", "text", "lang")
    val got = TextOps.langConfusability(docs, "text", "lang")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // x and y both have {abc:1, bcd:1} -> cosine exactly 1.0
    assert(got(("x", "y")) == ((2L, 1.0)))
    // w shares no trigram with either -> no row at all (dot join)
    assert(!got.contains(("w", "x")) && !got.contains(("w", "y")) &&
      !got.contains(("x", "w")))
    // hand case: p = {aaa:2, aab:1} vs q = {aaa:1} ->
    // dot 2, norms sqrt(5)·1 -> 0.894427
    val h = TextOps.langConfusability(
      Seq((1L, "aaaab", "p"), (2L, "aaa", "q")).toDF("doc_id", "text", "lang"),
      "text", "lang").collect().head
    assert((h.getString(0), h.getString(1), h.getLong(2)) == (("p", "q", 1L)))
    assert(h.getDouble(3) ==
      BigDecimal(2.0 / math.sqrt(5.0)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("zipfFit: exact normal-equation replay on known counts; head cutoff; determinism") {
    // counts: aa 16, bb 8, cc 4, dd 2 (geometric head)
    val text = (Seq.fill(16)("aa") ++ Seq.fill(8)("bb") ++
      Seq.fill(4)("cc") ++ Seq.fill(2)("dd")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    def expected(counts: Seq[Long]): (Long, Double, Double, Double) = {
      val xy = counts.zipWithIndex.map { case (c, i) =>
        (math.log((i + 1).toDouble), math.log(c.toDouble))
      }
      val k = xy.size.toDouble
      val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
      val sxy = xy.map(p => p._1 * p._2).sum
      val sxx = xy.map(p => p._1 * p._1).sum
      val syy = xy.map(p => p._2 * p._2).sum
      val cov = k * sxy - sx * sy; val vx = k * sxx - sx * sx
      val vy = k * syy - sy * sy
      def r6(v: Double) =
        BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (k.toLong, r6(cov / vx), r6((sy - (cov / vx) * sx) / k),
        r6((cov * cov) / (vx * vy)))
    }
    val got = TextOps.zipfFit(docs, "text", headSize = 10).collect().head
    val (n, slope, icept, r2) = expected(Seq(16L, 8L, 4L, 2L))
    assert((got.getLong(0), got.getDouble(1), got.getDouble(2), got.getDouble(3))
      == ((n, slope, icept, r2)))
    assert(slope < 0, "frequency falls with rank")
    // headSize truncates the fit to the top ranks
    val head3 = TextOps.zipfFit(docs, "text", headSize = 3).collect().head
    assert(head3.getLong(0) == 3L)
    assert((head3.getDouble(1), head3.getDouble(2), head3.getDouble(3)) ==
      ((expected(Seq(16L, 8L, 4L))._2, expected(Seq(16L, 8L, 4L))._3,
        expected(Seq(16L, 8L, 4L))._4)))
    // layout-independent (rank ties break on the word)
    val p = TextOps.zipfFit(docs.repartition(5), "text", headSize = 10)
      .collect().head
    assert(p.toSeq == got.toSeq)
    intercept[IllegalArgumentException] {
      TextOps.zipfFit(docs, "text", headSize = 2)
    }
  }
}
