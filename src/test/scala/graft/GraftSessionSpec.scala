package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftSessionSpec extends AnyFunSuite {

  test("builder applies configs and injects graft functions via the extensions hook") {
    TestSpark.spark // ensure the shared context exists first
    // extensions only apply at session construction; getOrCreate reuses
    // the active session, so detach it for the duration of this test
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = GraftSession.builder("graft-session-spec").master("local[2]").getOrCreate()
      assert(s.conf.get("spark.sql.sources.partitionOverwriteMode") == "dynamic")
      assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
      // graft_cosine resolvable WITHOUT explicit register(): proves the
      // SparkSessionExtensions injection path works
      val c = s.sql(
        "SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
          "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))").collect()(0).getDouble(0)
      assert(c == 1.0)
    } finally {
      SparkSession.setActiveSession(TestSpark.spark)
      SparkSession.setDefaultSession(TestSpark.spark)
    }
  }
}
