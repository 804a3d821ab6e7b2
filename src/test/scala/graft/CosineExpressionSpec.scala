package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions
import graft.ops.Similarity

/** The codegen'd cosine kernel vs the composable HOF formulation: must
  * be bit-identical on real data (it replaces the HOF version inside
  * oracle-checked queries). */
class CosineExpressionSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def emb = TestSpark.table("embeddings").limit(500)

  test("graft_cosine == HOF cosine, bit-identical, on all embedding pairs vs query") {
    val q = emb.filter(col("vec_id") === 1).select(col("embedding").as("q"))
    val both = emb.crossJoin(broadcast(q)).select(
      Similarity.cosine(col("embedding"), col("q")).as("hof"),
      Similarity.cosineFast(spark, col("embedding"), col("q")).as("fast"))
    assert(both.filter(col("hof") =!= col("fast")).count() == 0)
    assert(both.filter(col("fast") < -1.000001 || col("fast") > 1.000001).count() == 0)
  }

  test("registered in SQL: callable from raw SQL text after register()") {
    GraftFunctions.register(spark)
    emb.limit(10).createOrReplaceTempView("cos_test_emb")
    val rows = spark.sql(
      """SELECT a.vec_id, round(graft_cosine(a.embedding, b.embedding), 6) AS c
        |FROM cos_test_emb a JOIN cos_test_emb b ON b.vec_id = 1""".stripMargin)
      .collect()
    assert(rows.length == 10)
    assert(rows.find(_.getLong(0) == 1L).get.getDouble(1) == 1.0)
  }

  test("null semantics: null array or null element -> null") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Some(Seq(1.0f, 0.0f)), Some(Seq(1.0f, 0.0f))),
      (None: Option[Seq[Float]], Some(Seq(1.0f, 0.0f)))
    ).toDF("a", "b")
    val out = df.selectExpr("graft_cosine(a, b) AS c").collect()
    assert(out(0).getDouble(0) == 1.0)
    assert(out(1).isNullAt(0))
    val withNullElem = spark.sql(
      "SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS c").collect()
    assert(withNullElem(0).isNullAt(0))
  }

  test("degenerate inputs match the HOF twin: zero-norm and length mismatch -> null") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Seq(0.0f, 0.0f), Seq(1.0f, 2.0f)), // zero-norm left
      (Seq(1.0f, 2.0f), Seq(0.0f, 0.0f)), // zero-norm right
      (Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f)), // length mismatch
      (Seq(1.0f, 2.0f), Seq(1.0f, 2.0f)) // sane control row
    ).toDF("a", "b")
    val out = df.select(
      Similarity.cosine(col("a"), col("b")).as("hof"),
      Similarity.cosineFast(spark, col("a"), col("b")).as("fast")).collect()
    // HOF: Divide-by-zero -> null; zip_with pads short side with null -> null
    assert(out(0).isNullAt(0) && out(0).isNullAt(1))
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
    assert(out(2).isNullAt(0) && out(2).isNullAt(1))
    assert(!out(3).isNullAt(1) && out(3).getDouble(0) == out(3).getDouble(1))
    // interpreted path agrees on the degenerate cases too
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    def lit(xs: Float*) = Literal.create(xs.toArray, ArrayType(FloatType))
    assert(graft.functions.CosineSimilarity(lit(0f, 0f), lit(1f, 2f)).eval(null) == null)
    assert(graft.functions.CosineSimilarity(lit(1f, 2f, 3f), lit(1f, 2f)).eval(null) == null)
  }

  test("interpreted eval path agrees with codegen path") {
    // force the interpreted path by evaluating the expression directly
    val e = graft.functions.CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(3.0f, 4.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(4.0f, 3.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    val interpreted = e.eval(null).asInstanceOf[Double]
    assert(math.abs(interpreted - 24.0 / 25.0) < 1e-12)
    val viaCodegen = spark.sql(
      "SELECT graft_cosine(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)), " +
        "array(CAST(4.0 AS FLOAT), CAST(3.0 AS FLOAT)))").collect()(0).getDouble(0)
    assert(viaCodegen == interpreted)
  }
}
