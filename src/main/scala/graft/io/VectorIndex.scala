package graft.io

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Clustering, Similarity}

/**
 * Durable IVF ANN index — the embedding-space member of the published
 * index family ([[SignatureIndex]] doc granularity, [[WindowIndex]]
 * token-window granularity, this one vector granularity). A 100 TB
 * corpus trains its coarse quantizer ONCE and serves every subsequent
 * similarity query from the stored inverted lists:
 *
 *  - `build` trains k-means centroids ([[Clustering.train]] — the
 *    oracle-replayable trainer) and writes the corpus PARTITIONED BY
 *    `list_id`, so each inverted list is its own parquet directory;
 *  - `probe` ranks the stored centroids against the query and reads
 *    ONLY the `nprobe` winning list directories — the partition filter
 *    is static (literal list ids), so pruning happens at PLANNING
 *    time: file listing, IO, and scan all shrink by ~nprobe/nlist.
 *    This is the storage-level realization of what q29/q61 do with an
 *    in-memory assignment join;
 *  - `append` assigns a new batch against the STORED centroids (the
 *    quantizer is frozen at build time — the standard IVF contract;
 *    retrain = rebuild) and appends into the matching list dirs;
 *  - `delete` is the takedown pass: one rewrite of the lists minus the
 *    deleted ids (broadcast anti-join), crash-safe via the family's
 *    stage + two-rename swap — the quantizer is untouched, so probes
 *    keep their pruning and simply stop surfacing forgotten vectors.
 *
 * Identity (id/vec columns, DIMS, nlist, iters) is committed to
 * `_graft_index.json` AFTER the data, same crash contract as the
 * sibling indexes: a crashed build leaves no readable index. Probes
 * read every parameter from the meta — they cannot drift — and every
 * write path validates vector width against the stored dims (a
 * malformed batch fails loudly instead of silently polluting a list
 * with unscorable vectors).
 */
object VectorIndex {

  /** Index identity, fixed at build time. */
  final case class Meta(idCol: String, vecCol: String, dims: Int, nlist: Int, iters: Int)

  private def listsPath(dir: String) = s"$dir/lists"
  private def centsPath(dir: String) = s"$dir/centroids"
  private def metaFile(dir: String) = new Path(dir, "_graft_index.json")
  private def prevPath(dir: String) = new Path(s"$dir/lists_prev")
  private def stagePath(dir: String) = s"$dir/lists_staging"

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Recover the live lists dir after a crashed [[delete]] — the
    * sibling indexes' two-rename window; no-op in the steady state. */
  private def ensureLive(spark: SparkSession, dir: String): Unit = {
    val live = new Path(listsPath(dir))
    val f = fs(spark, live)
    if (!f.exists(live) && f.exists(prevPath(dir))) {
      f.delete(new Path(stagePath(dir)), true)
      require(f.rename(prevPath(dir), live),
        s"failed to restore $live from ${prevPath(dir)}")
    }
  }

  /** Fail loudly on any vector whose width differs from the index
    * dims — one cheap aggregate over the (batch-sized) frame. */
  private def requireDims(df: DataFrame, vecCol: String, dims: Int, what: String): Unit = {
    val bad = df.filter(size(col(vecCol)) =!= dims).limit(1).count()
    require(bad == 0, s"$what contains vectors whose width != index dims ($dims)")
  }

  /** Train the quantizer and publish the index. Overwrites `dir`. */
  def build(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      nlist: Int,
      iters: Int): Unit = {
    require(idCol.matches("[A-Za-z_][A-Za-z0-9_]*") &&
      vecCol.matches("[A-Za-z_][A-Za-z0-9_]*"),
      "column names are stored in index meta and must be plain identifiers")
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = Clustering.train(corpus, idCol, vecCol, nlist, iters)
    val dims = cents.head._2.length
    requireDims(corpus, vecCol, dims, "build corpus")
    val root = new Path(dir)
    val f = fs(spark, root)
    f.delete(new Path(listsPath(dir)), true)
    f.delete(prevPath(dir), true)
    f.delete(new Path(stagePath(dir)), true)
    cents.toDF("cid", "cemb")
      .write.mode("overwrite").parquet(centsPath(dir))
    val assigned = Clustering.assign(corpus, idCol, vecCol, cents)
      .select(col(idCol), col("cluster").as("list_id"))
    corpus.select(col(idCol), col(vecCol))
      .join(assigned, Seq(idCol))
      .write.mode("overwrite").partitionBy("list_id").parquet(listsPath(dir))
    val json = s"""{"id_col": "$idCol", "vec_col": "$vecCol", """ +
      s""""dims": $dims, "nlist": $nlist, "iters": $iters}"""
    val out = f.create(metaFile(dir), true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** Read the index identity. Fails if `dir` holds no committed index. */
  def meta(spark: SparkSession, dir: String): Meta = {
    val p = metaFile(dir)
    require(fs(spark, p).exists(p), s"no vector index at $dir (missing ${p.getName})")
    val in = fs(spark, p).open(p)
    val json =
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
    def str(k: String) = s""""$k": "([^"]*)"""".r.findFirstMatchIn(json)
      .getOrElse(sys.error(s"bad index meta: missing $k")).group(1)
    def num(k: String) = s""""$k": (\\d+)""".r.findFirstMatchIn(json)
      .getOrElse(sys.error(s"bad index meta: missing $k")).group(1).toInt
    Meta(str("id_col"), str("vec_col"), num("dims"), num("nlist"), num("iters"))
  }

  /** The stored centroids as (cid, cemb) — nlist rows. */
  def centroids(spark: SparkSession, dir: String): DataFrame = {
    ensureLive(spark, dir)
    spark.read.parquet(centsPath(dir))
  }

  /**
   * ANN top-k against the stored lists: rank the (tiny) centroid table
   * by the query, collect the `nprobe` winning list ids (constant,
   * ≤ nlist rows on the driver — same footprint as the PQ codebooks),
   * and scan ONLY those list directories via a static partition
   * filter. Scoring is the codegen cosine kernel; ties → id asc.
   */
  def probe(
      queryDf: DataFrame,
      dir: String,
      k: Int,
      nprobe: Int): DataFrame = {
    val spark = queryDf.sparkSession
    ensureLive(spark, dir)
    val m = meta(spark, dir)
    requireDims(queryDf, m.vecCol, m.dims, "probe query")
    val q = queryDf.select(col(m.vecCol).as("__q"))
    val ranked = centroids(spark, dir)
      .crossJoin(broadcast(q))
      .select(col("cid"),
        Similarity.cosine(col("cemb").cast("array<double>"), col("__q")).as("__csim"))
      .orderBy(col("__csim").desc, col("cid").asc)
      .limit(nprobe)
      .select("cid")
      .collect().map(_.getLong(0))
    spark.read.parquet(listsPath(dir))
      .filter(col("list_id").isin(ranked: _*))
      .crossJoin(broadcast(q))
      .select(col(m.idCol),
        Similarity.cosineFast(spark, col(m.vecCol), col("__q")).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(m.idCol).asc)
      .limit(k)
  }

  /** Assign a new batch against the FROZEN stored quantizer and append
    * into the matching list dirs (dynamic partition append). */
  def append(newVecs: DataFrame, dir: String): Unit = {
    val spark = newVecs.sparkSession
    ensureLive(spark, dir)
    val m = meta(spark, dir)
    requireDims(newVecs, m.vecCol, m.dims, "append batch")
    val cents = centroids(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toSeq
    val assigned = Clustering.assign(newVecs, m.idCol, m.vecCol, cents)
      .select(col(m.idCol), col("cluster").as("list_id"))
    newVecs.select(col(m.idCol), col(m.vecCol))
      .join(assigned, Seq(m.idCol))
      .write.mode("append").partitionBy("list_id").parquet(listsPath(dir))
  }

  /**
   * Remove vectors from the index — the takedown pass: ONE rewrite of
   * the lists minus the deleted ids (broadcast anti-join preserving
   * the list partitioning), behind the family's crash-safe stage + two
   * renames. The quantizer is untouched (centroids carry no
   * per-vector data), so probe pruning is unchanged and a forgotten
   * vector simply stops surfacing — equivalent to an index whose
   * lists never held it (spec-pinned). Single-writer contract:
   * serialize with appends.
   */
  def delete(deletedIds: DataFrame, dir: String): Unit = {
    val spark = deletedIds.sparkSession
    ensureLive(spark, dir)
    val m = meta(spark, dir)
    val live = new Path(listsPath(dir))
    val f = fs(spark, live)
    spark.read.parquet(listsPath(dir))
      .join(broadcast(deletedIds.select(col(deletedIds.columns.head).as(m.idCol))),
        Seq(m.idCol), "left_anti")
      .write.mode("overwrite").partitionBy("list_id").parquet(stagePath(dir))
    f.delete(prevPath(dir), true) // leftover from an ancient crash
    require(f.rename(live, prevPath(dir)), s"delete: failed to retire $live")
    require(f.rename(new Path(stagePath(dir)), live),
      s"delete: failed to promote rewritten lists (recoverable — " +
        s"${prevPath(dir)} holds the previous index)")
    f.delete(prevPath(dir), true)
  }
}
