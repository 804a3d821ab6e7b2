package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ExifExtract, GraftFunctions}
import graft.ops.Multimodal

class ExifSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def meta(p: Array[Byte]): Option[(Option[Int], Option[Int], Option[Int], Option[String], Option[String])] = {
    val r = ExifExtract.meta(p)
    if (r == null) None
    else Some((
      if (r.isNullAt(0)) None else Some(r.getInt(0)),
      if (r.isNullAt(1)) None else Some(r.getInt(1)),
      if (r.isNullAt(2)) None else Some(r.getInt(2)),
      if (r.isNullAt(3)) None else Some(r.getUTF8String(3).toString),
      if (r.isNullAt(4)) None else Some(r.getUTF8String(4).toString)))
  }

  test("demoJpeg roundtrip: both TIFF byte orders recover every field") {
    for (id <- Seq(2L, 7L)) { // even = II little-endian, odd = MM big-endian
      val m = meta(Multimodal.demoJpeg(id)).get
      assert(m._1.get == (200 + id % 30).toInt, "width")
      assert(m._2.get == (100 + id % 50).toInt, "height")
      assert(m._3.get == (id % 8 + 1).toInt, "orientation")
      assert(m._4.get == s"Cam${id % 3}", "make")
      assert(m._5.get == f"2026:01:${id % 27 + 1}%02d 12:00:00", "datetime")
    }
  }

  test("non-JPEG and truncated payloads degrade, never crash") {
    assert(meta("not a jpeg".getBytes) == None)
    assert(meta(Array[Byte]()) == None)
    assert(meta(null) == None)
    // truncated after SOI (3 bytes): nothing recoverable — null struct
    // (projected fields read as null, which is what q179 aggregates)
    assert(meta(Multimodal.demoJpeg(13L)) == None)
    // a longer truncation that still carries SOI + a cut APP1: a JPEG,
    // but with no recoverable fields yet
    val longer = java.util.Arrays.copyOfRange(Multimodal.demoJpeg(4L), 0, 8)
    assert(meta(longer).forall(m => m._3.isEmpty && m._4.isEmpty))
    // cut a valid fixture mid-APP1: fields before the cut unavailable,
    // parser stops cleanly
    val whole = Multimodal.demoJpeg(4L)
    val cut = java.util.Arrays.copyOfRange(whole, 0, 20)
    val m = meta(cut)
    assert(m.isEmpty || m.get._4.isEmpty) // no make recovered from a cut
  }

  test("SOF without EXIF yields dimensions only") {
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xff)
    b(0xFF); b(0xD8)
    b(0xFF); b(0xC0); b(0); b(11); b(8)
    b(1); b(0x2C) /* h=300 */ ; b(2); b(0x58) /* w=600 */
    b(1); b(1); b(0x11); b(0)
    b(0xFF); b(0xD9)
    assert(meta(out.toByteArray).get ==
      ((Some(600), Some(300), None, None, None)))
  }

  test("metadata scan stops at SOS: entropy bytes never parsed") {
    val head = Multimodal.demoJpeg(4L)
    val out = new java.io.ByteArrayOutputStream()
    out.write(head, 0, head.length - 2) // drop EOI
    // SOS marker then garbage that LOOKS like markers
    out.write(0xFF); out.write(0xDA); out.write(0); out.write(4)
    out.write(1); out.write(0)
    out.write(Array.fill[Byte](64)(0xFF.toByte))
    val m = meta(out.toByteArray).get
    assert(m._3.get == (4 % 8 + 1)) // fields before SOS intact
  }

  test("column surface: struct fields, null propagation, sql") {
    val df = Seq(1L, 13L).toDF("id")
      .select(col("id"), typedlit(Array.empty[Byte]).as("junk"))
    val payloads = Seq((1L, Multimodal.demoJpeg(1L)),
      (13L, Multimodal.demoJpeg(13L)),
      (99L, null.asInstanceOf[Array[Byte]])).toDF("id", "payload")
    val got = payloads.select(col("id"),
        GraftFunctions.exifMeta(spark, col("payload")).as("m"))
      .select(col("id"), col("m.orientation"), col("m.make"))
      .orderBy("id").collect()
    assert(got(0).getInt(1) == 2 && got(0).getString(2) == "Cam1")
    assert(got(1).isNullAt(1) && got(1).isNullAt(2)) // truncated: null fields
    assert(got(2).isNullAt(1)) // null payload: null struct
    GraftFunctions.register(spark)
    payloads.createOrReplaceTempView("exif_spec_t")
    val n = spark.sql(
      "SELECT count(*) FROM exif_spec_t WHERE graft_exif_meta(payload).orientation = 2")
      .head.getLong(0)
    assert(n == 1L)
    df.unpersist()
  }
}
