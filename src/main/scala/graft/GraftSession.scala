package graft

import org.apache.spark.sql.SparkSession

/**
 * Opinionated session builder: the configuration this engine is
 * designed against, in one place.
 *
 *  - graft SQL functions injected via the standard extensions hook
 *    (equivalent to `spark.sql.extensions=graft.functions.GraftExtensions`);
 *  - dynamic partition overwrite (silver re-runs replace only touched
 *    partitions — reference `breweries_transform_silver_notebook.py:35`);
 *  - AQE left ON (Spark 4 default) — runtime coalescing, skew-join
 *    splitting and broadcast demotion are part of the scale design;
 *  - UTC session timezone (all date/timestamp literals in the engine
 *    are timezone-free);
 *  - shuffle partitions default to the local core count rather than
 *    200 — callers on a real cluster should size this to data volume.
 */
object GraftSession {

  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .withExtensions(graft.functions.GraftFunctions.inject)
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors().toString)
}
