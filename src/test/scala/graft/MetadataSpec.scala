package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.Metadata

class MetadataSpec extends AnyFunSuite {

  test("parseType: base types") {
    assert(Metadata.parseType("string") == ((StringType, false)))
    assert(Metadata.parseType("double") == ((DoubleType, false)))
    assert(Metadata.parseType("int") == ((IntegerType, false)))
    assert(Metadata.parseType("integer") == ((IntegerType, false)))
    assert(Metadata.parseType("bigint") == ((LongType, false)))
    assert(Metadata.parseType("timestamp") == ((TimestampType, false)))
    assert(Metadata.parseType("date") == ((DateType, false)))
    assert(Metadata.parseType("binary") == ((BinaryType, false)))
  }

  test("parseType: '?' suffix marks nullable") {
    assert(Metadata.parseType("double?") == ((DoubleType, true)))
    assert(Metadata.parseType(" string? ") == ((StringType, true)))
  }

  test("parseType: decimal and array") {
    assert(Metadata.parseType("decimal(18,6)") == ((DecimalType(18, 6), false)))
    assert(Metadata.parseType("array<float>") == ((ArrayType(FloatType), false)))
  }

  test("parseType: unknown type fails loudly (no reference silent-string fallback)") {
    val e = intercept[IllegalArgumentException](Metadata.parseType("varchar"))
    assert(e.getMessage.contains("varchar"))
  }

  test("parseSpec: '!null' marker, comments and blank lines") {
    val fields = Metadata.parseSpec(
      """
      # a comment
      id: string !null

      latitude: double?
      name: string
      """)
    assert(fields == Seq(
      Metadata.FieldSpec("id", "string", Some(false)),
      Metadata.FieldSpec("latitude", "double?", None),
      Metadata.FieldSpec("name", "string", None)))
  }

  test("structFromSpec: explicit nullable flag wins over '?' suffix") {
    val st = Metadata.structFromSpec(
      """
      a: string !null
      b: double?
      c: string
      """)
    assert(st == StructType(Seq(
      StructField("a", StringType, nullable = false),
      StructField("b", DoubleType, nullable = true),
      StructField("c", StringType, nullable = false))))
  }

  test("brewerySilver mirrors the reference ingestion metadata") {
    val st = Metadata.brewerySilver
    assert(st.fieldNames.toSeq == Seq("id", "name", "brewery_type", "city",
      "state", "country", "updated_at", "ingestion_date"))
    assert(!st("id").nullable && !st("name").nullable && !st("state").nullable)
    assert(st("updated_at").dataType == TimestampType)
    assert(st("ingestion_date").dataType == DateType)
  }

  test("enforced schema on read projects away extra fields and nulls missing ones") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = TestSpark.tmpDir("meta_enforce")
    Seq("""{"id":"x","name":"N","extra_field":42}""").toDF("value")
      .write.mode("overwrite").text(dir)
    val st = Metadata.structFromSpec("id: string\nname: string\ncity: string")
    val row = spark.read.schema(st).json(dir).collect()(0)
    assert(row.getAs[String]("id") == "x")
    assert(row.getAs[String]("city") == null)
    assert(row.schema.fieldNames.toSeq == Seq("id", "name", "city"))
  }
}
