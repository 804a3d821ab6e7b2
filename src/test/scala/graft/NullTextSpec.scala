package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * NULL-text semantics through the REAL query entry points: the driver
 * fixture corpus has no NULL-text row, so the NULL-handling class
 * (LangIdKernel `'und'` fallthrough, q43's explicit guard before
 * `greatest`, corpus-filter rules over NULL) is invisible to the
 * oracle gate. This spec rebuilds a `documents` fixture with ~1% NULL
 * text and drives the affected `SparkEntry.queries` end-to-end
 * against it — the same functions the gate hashes, now exercised on
 * the rows the gate never sees. Two invariants per query: NULL rows
 * produce the DOCUMENTED value (never an exception), and non-NULL
 * rows are byte-identical to the same query over the NULL-free
 * corpus (NULL handling must be row-local).
 */
class NullTextSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // doc_id % 97 == 0 → NULL text (~1%), everything else untouched
  private lazy val dir: String = {
    val d = TestSpark.tmpDir("nulltext_sf")
    TestSpark.table("documents")
      .withColumn("text",
        when(col("doc_id") % 97 === 0, lit(null: String)).otherwise(col("text")))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def run(name: String) =
    SparkEntry.queries(name)(spark, dir)

  private def nullIds: Set[Long] =
    TestSpark.table("documents").filter(col("doc_id") % 97 === 0)
      .select("doc_id").as[Long].collect().toSet

  private def assertNonNullRowsUnchanged(name: String, idCol: String = "doc_id"): Unit = {
    val nulls = nullIds
    val withNulls = run(name).filter(!col(idCol).isin(nulls.toSeq: _*))
      .collect().map(_.toString).sorted
    val without = SparkEntry.queries(name)(spark, TestSpark.sfDir)
      .filter(!col(idCol).isin(nulls.toSeq: _*))
      .collect().map(_.toString).sorted
    assert(withNulls.toSeq == without.toSeq,
      s"$name: NULL rows changed non-NULL rows' results — NULL handling is not row-local")
  }

  test("q11 token counts: NULL text → NULL counts, every doc keeps a row") {
    val out = run("q11_token_count").collect()
    assert(out.length == 500)
    val nulls = nullIds
    out.filter(r => nulls(r.getLong(0))).foreach { r =>
      assert(r.isNullAt(1) && r.isNullAt(2), s"expected NULL counts: $r")
    }
    assertNonNullRowsUnchanged("q11_token_count")
  }

  test("q12 language ID: NULL text → 'und' (the oracle CASE fallthrough)") {
    val nulls = nullIds
    val preds = run("q12_lang_id").collect()
    assert(preds.length == 500)
    preds.filter(r => nulls(r.getLong(0))).foreach { r =>
      assert(r.getString(2) == "und", s"expected 'und' on NULL text: $r")
    }
    assertNonNullRowsUnchanged("q12_lang_id")
  }

  test("q13/q14 quality + fingerprint: NULL in, NULL out") {
    for (q <- Seq("q13_quality_score", "q14_fingerprint")) {
      val nulls = nullIds
      val out = run(q).collect()
      assert(out.length == 500, q)
      out.filter(r => nulls(r.getLong(0))).foreach { r =>
        assert(r.isNullAt(1), s"$q: expected NULL output on NULL text: $r")
      }
      assertNonNullRowsUnchanged(q)
    }
  }

  test("q43 repetition: the explicit NULL guard keeps NULL rows NULL (greatest would lie)") {
    val nulls = nullIds
    val out = run("q43_repetition").collect()
    assert(out.length == 500)
    out.filter(r => nulls(r.getLong(0))).foreach { r =>
      (1 until r.length).foreach(i =>
        assert(r.isNullAt(i), s"q43 col $i must be NULL on NULL text: $r"))
    }
    assertNonNullRowsUnchanged("q43_repetition")
  }

  test("q62 corpus-filter DSL: NULL text is dropped with a rule verdict, not an exception") {
    val nulls = nullIds
    val out = run("q62_corpus_filter_dsl").collect()
    assert(out.length == 500)
    out.filter(r => nulls(r.getLong(0))).foreach { r =>
      assert(!r.getBoolean(r.fieldIndex("kept")),
        s"a NULL-text doc must not be kept for training: $r")
    }
    assertNonNullRowsUnchanged("q62_corpus_filter_dsl")
  }

  test("q72 curation capstone runs end-to-end; NULL-text docs never reach packing") {
    val out = run("q72_curation_pipeline")
    val nulls = nullIds
    val packedNull = out.filter(col("doc_id").isin(nulls.toSeq: _*)).count()
    assert(packedNull == 0L, "NULL-text docs leaked through the quality fence into shards")
    assert(out.count() > 0L)
  }
}
