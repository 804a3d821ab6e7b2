package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, MetaRobots}

class MetaRobotsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def d(html: String): (Boolean, Boolean, String) = {
    val r = MetaRobots.directives(UTF8String.fromString(html))
    (r.getBoolean(0), r.getBoolean(1),
      if (r.isNullAt(2)) null else r.getUTF8String(2).toString)
  }

  test("robots meta: directives, shorthands, non-restrictive no-ops") {
    assert(d("""<meta name="robots" content="noindex">""") == ((true, false, null)))
    assert(d("""<meta name="robots" content="noindex, nofollow">""") ==
      ((true, true, null)))
    assert(d("""<meta name="robots" content="none">""") == ((true, true, null)))
    assert(d("""<meta name="robots" content="index, follow">""") ==
      ((false, false, null)))
    assert(d("""<meta name="robots" content="all">""") == ((false, false, null)))
    // unknown tokens are ignored, known ones still honored
    assert(d("""<meta name="robots" content="noarchive, noindex">""") ==
      ((true, false, null)))
  }

  test("robots meta: case, quoting, attribute order, spacing") {
    assert(d("""<META NAME="ROBOTS" CONTENT="NOINDEX">""") == ((true, false, null)))
    assert(d("<meta name=robots content=noindex>") == ((true, false, null)))
    assert(d("<meta name='robots' content='nofollow'>") == ((false, true, null)))
    assert(d("""<meta content="noindex" name="robots">""") == ((true, false, null)))
    assert(d("<meta   name = \"robots\"   content = \" noindex , nofollow \">") ==
      ((true, true, null)))
    // self-closing
    assert(d("""<meta name="robots" content="noindex"/>""") == ((true, false, null)))
  }

  test("robots meta: only name=robots counts; metas combine restrictively") {
    assert(d("""<meta name="description" content="noindex">""") ==
      ((false, false, null)))
    assert(d("""<meta name="googlebot" content="noindex">""") ==
      ((false, false, null)))
    assert(d("""<meta name="robots" content="index">""" +
      """<meta name="robots" content="noindex">""") == ((true, false, null)))
  }

  test("canonical link: rel token list, case, quoting, first wins") {
    assert(d("""<link rel="canonical" href="https://a/x">""") ==
      ((false, false, "https://a/x")))
    assert(d("""<link HREF='https://a/y' REL='Canonical'>""") ==
      ((false, false, "https://a/y")))
    assert(d("""<link rel="alternate canonical" href="https://a/z">""") ==
      ((false, false, "https://a/z")))
    assert(d("""<link rel="stylesheet" href="/s.css">""") == ((false, false, null)))
    assert(d("""<link rel="canonical" href="https://a/1">""" +
      """<link rel="canonical" href="https://a/2">""") ==
      ((false, false, "https://a/1")))
    // empty href is no declaration
    assert(d("""<link rel="canonical" href="">""") == ((false, false, null)))
  }

  test("tolerance: anywhere in the document, truncation, noise") {
    val page = """<!DOCTYPE html><html><head><title>t</title></head><body>
      |<p>body text</p><meta name="robots" content="noindex">
      |<link rel="canonical" href="https://a/c"></body></html>""".stripMargin
    assert(d(page) == ((true, false, "https://a/c")))
    // truncated mid-tag: directives before the cut still honored
    assert(d("""<meta name="robots" content="noindex"><link rel="canon""") ==
      ((true, false, null)))
    // '<metadata>' is not '<meta' (name-END check)
    assert(d("""<metadata name="robots" content="noindex"></metadata>""") ==
      ((false, false, null)))
    assert(d("no tags at all") == ((false, false, null)))
    assert(d("") == ((false, false, null)))
  }

  test("column surface: struct fields, sql registration, null propagation") {
    val df = Seq(
      (1L, """<meta name="robots" content="none"><link rel="canonical" href="https://a/1">"""),
      (2L, null.asInstanceOf[String])).toDF("id", "html")
    val got = df.select(col("id"),
        GraftFunctions.pageDirectives(spark, col("html")).as("d"))
      .select(col("id"), col("d.noindex"), col("d.nofollow"), col("d.canonical"))
      .orderBy("id").collect()
    assert(got(0).getBoolean(1) && got(0).getBoolean(2) &&
      got(0).getString(3) == "https://a/1")
    assert(got(1).isNullAt(1) && got(1).isNullAt(3))
    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      """SELECT graft_page_directives('<meta name="robots" content="noindex">').noindex""")
      .head.getBoolean(0)
    assert(viaSql)
  }
}
