package graft.io

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

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
 *    in-memory assignment join. [[probeBatch]] is the query-SET form:
 *    every query ranks its own nprobe lists, the scan covers the
 *    UNION of probed lists (still a static partition filter), and one
 *    job returns per-query rankings;
 *  - `append` assigns a new batch against the STORED centroids (the
 *    quantizer is frozen at build time — the standard IVF contract;
 *    retrain = rebuild) and lands it as a COMMITTED BATCH: the data
 *    goes under `lists/batch=<tag>/list_id=*` where the tag is a
 *    deterministic function of the batch's ids, and the batch is live
 *    only once its `_graft_committed` marker exists (written last).
 *    A retried or re-drained batch recomputes the same tag and
 *    OVERWRITES its own partition — idempotent, never double-inserted
 *    (the [[WindowIndex]] exactly-once recipe); a crashed append
 *    leaves an invisible orphan that [[compact]]/[[delete]] garbage-
 *    collect;
 *  - `delete` is the takedown pass: one rewrite of the live lists
 *    minus the deleted ids (broadcast anti-join), crash-safe via the
 *    family's stage + two-rename swap — the quantizer is untouched,
 *    so probes keep their pruning and simply stop surfacing forgotten
 *    vectors.
 *
 * Identity (id/vec columns + their types, DIMS, nlist, iters) is
 * committed to `_graft_index.json` AFTER the data, same crash contract
 * as the sibling indexes: a crashed build leaves no readable index.
 * Probes read every parameter from the meta — they cannot drift — and
 * every write path validates vector width against the stored dims (a
 * malformed batch fails loudly instead of silently polluting a list
 * with unscorable vectors). An index whose vectors have ALL been
 * deleted stays readable (the stored schema reconstructs the empty
 * frame) and probes return zero rows rather than a schema-inference
 * error.
 */
object VectorIndex {

  /** Index identity, fixed at build time. `schemaDdl` is the DDL of
    * the (id, vec) data columns — reconstructs reads of an index whose
    * lists are empty (every vector deleted). */
  final case class Meta(
      idCol: String, vecCol: String, dims: Int, nlist: Int, iters: Int,
      schemaDdl: String)

  private def listsPath(dir: String) = s"$dir/lists"
  private def centsPath(dir: String) = s"$dir/centroids"
  private def metaFile(dir: String) = new Path(dir, "_graft_index.json")
  private def prevPath(dir: String) = new Path(s"$dir/lists_prev")
  private def stagePath(dir: String) = s"$dir/lists_staging"
  private def centsPrevPath(dir: String) = new Path(s"$dir/centroids_prev")
  private def centsStagePath(dir: String) = new Path(s"$dir/centroids_staging")
  private val marker = "_graft_committed"
  private val retireFile = "_graft_retire"
  private val baseTag = "__base__"

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Recover the live lists dir after a crashed [[delete]]/[[compact]]
    * — the sibling indexes' two-rename window; no-op in steady state.
    * Also restores the centroids dir after a crashed [[maintainLists]]
    * quantizer swap (same two-rename recovery). */
  private def ensureLive(spark: SparkSession, dir: String): Unit = {
    val live = new Path(listsPath(dir))
    val f = fs(spark, live)
    if (!f.exists(live) && f.exists(prevPath(dir))) {
      f.delete(new Path(stagePath(dir)), true)
      require(f.rename(prevPath(dir), live),
        s"failed to restore $live from ${prevPath(dir)}")
    }
    val cents = new Path(centsPath(dir))
    if (!f.exists(cents) && f.exists(centsPrevPath(dir))) {
      f.delete(centsStagePath(dir), true)
      require(f.rename(centsPrevPath(dir), cents),
        s"failed to restore $cents from ${centsPrevPath(dir)}")
    }
  }

  /** Fail loudly on any vector whose width differs from the index
    * dims — one cheap aggregate over the (batch-sized) frame. */
  private def requireDims(df: DataFrame, vecCol: String, dims: Int, what: String): Unit = {
    val bad = df.filter(size(col(vecCol)) =!= dims).limit(1).count()
    require(bad == 0, s"$what contains vectors whose width != index dims ($dims)")
  }

  /** Deterministic batch tag from the batch's vector ids — same delta
    * → same tag → a crashed or retried append OVERWRITES its own
    * partition instead of accreting (the [[WindowIndex.batchTag]]
    * convention: order-insensitive XOR of per-id hashes + count). */
  def batchTag(vecs: DataFrame, idCol: String): String = {
    val r = vecs.agg(
      count(lit(1)).as("c"),
      coalesce(expr(s"bit_xor(xxhash64(cast($idCol as string)))"), lit(0L)).as("h"))
      .head()
    s"b${r.getLong(0)}x${java.lang.Long.toHexString(r.getLong(1))}"
  }

  /** Tags whose commit marker exists — the only batches a reader
    * sees; orphans of crashed appends stay invisible. */
  private def liveTags(spark: SparkSession, dir: String): Seq[String] = {
    ensureLive(spark, dir)
    val lists = new Path(listsPath(dir))
    val f = fs(spark, lists)
    if (!f.exists(lists)) Nil
    else f.listStatus(lists).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .filter(nm => f.exists(new Path(lists, s"$nm/$marker")))
      .map(_.stripPrefix("batch="))
  }

  /** Does any live batch hold at least one parquet file? (An index
    * whose vectors were all deleted has committed batches but no
    * files — `spark.read.parquet` would die on schema inference.) */
  private def liveHasFiles(spark: SparkSession, dir: String, tags: Seq[String]): Boolean =
    tags.exists { t =>
      val p = new Path(s"${listsPath(dir)}/batch=$t")
      val f = fs(spark, p)
      val it = f.listFiles(p, true)
      var found = false
      while (!found && it.hasNext)
        found = it.next().getPath.getName.endsWith(".parquet")
      found
    }

  /** The live stored vectors (idCol, vecCol, list_id) — committed
    * batches only; empty-but-valid frame (schema from meta) when every
    * vector has been deleted. The `batch`/`list_id` predicates are
    * partition filters, so callers layering a `list_id` IN-filter on
    * top keep planning-time directory pruning. */
  private def liveLists(spark: SparkSession, dir: String, m: Meta): DataFrame = {
    val tags = liveTags(spark, dir)
    if (tags.isEmpty || !liveHasFiles(spark, dir, tags))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType.fromDDL(m.schemaDdl).add("list_id", LongType))
    else {
      // retired (batch, list) partitions are superseded by a newer
      // maintenance batch — excluded with partition-column predicates,
      // so directory pruning still plans around them
      val retired = liveRetirements(spark, dir, tags)
      val keep = retired.foldLeft(col("batch").isin(tags: _*)) {
        case (p, (t, ls)) =>
          p && !(col("batch") === t && col("list_id").isin(ls: _*))
      }
      spark.read.parquet(listsPath(dir))
        .filter(keep)
        .drop("batch")
    }
  }

  /** The ids currently stored in the index — the processed-vectors
    * LEDGER for incremental maintainers (id column only; parquet
    * column pruning keeps the float vectors on disk). */
  def storedIds(spark: SparkSession, dir: String): DataFrame = {
    ensureLive(spark, dir)
    val m = meta(spark, dir)
    liveLists(spark, dir, m).select(m.idCol)
  }

  /** Write one committed batch under `root/batch=tag` (partitioned by
    * list_id), marker last — the create is the commit point. `retire`
    * names (older batch tag → list ids) partitions this batch
    * SUPERSEDES ([[maintainLists]]): written before the marker, so the
    * new data and the retirements become one visibility unit. */
  private def writeBatch(
      assigned: DataFrame, root: String, tag: String, spark: SparkSession,
      retire: Seq[(String, Seq[Long])] = Nil): Unit = {
    assigned.write.mode("overwrite").partitionBy("list_id")
      .parquet(s"$root/batch=$tag")
    if (retire.nonEmpty) {
      val rf = new Path(s"$root/batch=$tag/$retireFile")
      val out = fs(spark, rf).create(rf, true)
      try out.write(retire
        .map { case (t, ls) => s"$t:${ls.sorted.mkString(",")}" }
        .mkString("\n").getBytes("UTF-8"))
      finally out.close()
    }
    val mk = new Path(s"$root/batch=$tag/$marker")
    fs(spark, mk).create(mk, true).close()
  }

  /** Retirements declared by LIVE batches: batch tag → list ids whose
    * partitions in that batch are superseded. Cost ∝ batch count. */
  private def liveRetirements(
      spark: SparkSession, dir: String, tags: Seq[String]): Map[String, Seq[Long]] = {
    val lists = new Path(listsPath(dir))
    val f = fs(spark, lists)
    tags.flatMap { t =>
      val rf = new Path(lists, s"batch=$t/$retireFile")
      if (!f.exists(rf)) Nil
      else {
        val in = f.open(rf)
        val txt =
          try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
          finally in.close()
        txt.split("\n").filter(_.nonEmpty).toSeq.map { line =>
          val Array(tag, ls) = line.split(":", 2)
          tag -> ls.split(",").filter(_.nonEmpty).map(_.toLong).toSeq
        }
      }
    }.groupBy(_._1).map { case (t, xs) => t -> xs.flatMap(_._2).distinct.sorted }
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
    require(!corpus.isEmpty,
      s"cannot build a vector index over an empty corpus ($dir): " +
        "the quantizer has nothing to train on")
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
    val data = corpus.select(col(idCol), col(vecCol)).join(assigned, Seq(idCol))
    writeBatch(data, listsPath(dir), baseTag, spark)
    val ddl = corpus.select(col(idCol), col(vecCol)).schema.toDDL
    val json = s"""{"id_col": "$idCol", "vec_col": "$vecCol", """ +
      s""""dims": $dims, "nlist": $nlist, "iters": $iters, """ +
      s""""schema": "$ddl"}"""
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
    Meta(str("id_col"), str("vec_col"), num("dims"), num("nlist"), num("iters"),
      str("schema"))
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
   * Exactly one query row ([[probeBatch]] for query sets — two rows
   * here would interleave both queries' candidates into one
   * meaningless ranking).
   */
  def probe(
      queryDf: DataFrame,
      dir: String,
      k: Int,
      nprobe: Int): DataFrame = {
    val spark = queryDf.sparkSession
    ensureLive(spark, dir)
    val m = meta(spark, dir)
    val nq = queryDf.limit(2).count()
    require(nq == 1,
      s"probe expects exactly one query row, got ${if (nq == 0) "none" else "2+"} — " +
        "use probeBatch for query sets")
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
    liveLists(spark, dir, m)
      .filter(col("list_id").isin(ranked: _*))
      .crossJoin(broadcast(q))
      .select(col(m.idCol),
        Similarity.cosineFast(spark, col(m.vecCol), col("__q")).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(m.idCol).asc)
      .limit(k)
  }

  /**
   * [[probe]] for a query SET — ONE job for N queries: each query
   * ranks its own `nprobe` lists against the broadcast centroid table
   * (per-query window over a queries×nlist frame — tiny), the scan
   * covers the UNION of probed list directories (still a static,
   * planning-time partition filter: ≤ nlist literal ids), and each
   * candidate list is scored only against the queries that probed it
   * (broadcast join on list_id). Final ranking is the salted
   * two-stage [[Similarity.perQueryTopK]]. Output: (query_id, rank,
   * idCol, cosine_sim).
   */
  def probeBatch(
      queries: DataFrame,
      qidCol: String,
      dir: String,
      k: Int,
      nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    ensureLive(spark, dir)
    val m = meta(spark, dir)
    requireDims(queries, m.vecCol, m.dims, "probe queries")
    val q = queries.select(col(qidCol).as("query_id"), col(m.vecCol).as("__q"))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("__csim").desc, col("cid").asc)
    // (query_id, list_id, __q): ≤ queries × nprobe rows — materialized
    // once, read twice (list-id union + scoring join)
    val pairs = centroids(spark, dir)
      .crossJoin(broadcast(q))
      .select(col("query_id"), col("cid"), col("__q"),
        Similarity.cosine(col("cemb").cast("array<double>"), col("__q")).as("__csim"))
      .withColumn("__rn", row_number().over(wq))
      .filter(col("__rn") <= nprobe)
      .select(col("query_id"), col("cid").as("list_id"), col("__q"))
      .localCheckpoint()
    val listIds = pairs.select("list_id").distinct().collect().map(_.getLong(0))
    val scored = liveLists(spark, dir, m)
      .filter(col("list_id").isin(listIds: _*))
      .join(broadcast(pairs), "list_id")
      .select(col("query_id"), col(m.idCol),
        Similarity.cosineFast(spark, col(m.vecCol), col("__q")).as("cosine_sim"))
    Similarity.perQueryTopK(scored, "query_id", m.idCol, "cosine_sim", k)
      .select(col("query_id"), col("rank"), col(m.idCol), col("cosine_sim"))
  }

  /**
   * Threshold probe — [[probeBatch]] with "every candidate ≥
   * `minCosine` in the probed lists" instead of a top-k cutoff: the
   * dedup/takedown primitive, where an arbitrary k would silently drop
   * the (k+1)-th true near-duplicate. Same plan shape (static
   * partition filter over the probed list union, broadcast pair join);
   * the output is bounded by the true match count, not a rank.
   * Output: (query_id, idCol, cosine_sim), all matches ≥ threshold.
   */
  def probeThreshold(
      queries: DataFrame,
      qidCol: String,
      dir: String,
      minCosine: Double,
      nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    ensureLive(spark, dir)
    val m = meta(spark, dir)
    requireDims(queries, m.vecCol, m.dims, "probe queries")
    val q = queries.select(col(qidCol).as("query_id"), col(m.vecCol).as("__q"))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("__csim").desc, col("cid").asc)
    val pairs = centroids(spark, dir)
      .crossJoin(broadcast(q))
      .select(col("query_id"), col("cid"), col("__q"),
        Similarity.cosine(col("cemb").cast("array<double>"), col("__q")).as("__csim"))
      .withColumn("__rn", row_number().over(wq))
      .filter(col("__rn") <= nprobe)
      .select(col("query_id"), col("cid").as("list_id"), col("__q"))
      .localCheckpoint()
    val listIds = pairs.select("list_id").distinct().collect().map(_.getLong(0))
    liveLists(spark, dir, m)
      .filter(col("list_id").isin(listIds: _*))
      .join(broadcast(pairs), "list_id")
      .select(col("query_id"), col(m.idCol),
        Similarity.cosineFast(spark, col(m.vecCol), col("__q")).as("cosine_sim"))
      .filter(col("cosine_sim") >= minCosine)
  }

  /**
   * Predicate-aware [[probeBatch]] — "top-k WHERE <predicate>" against
   * the published lists, with the nprobe-ESCALATION analog of
   * [[graft.ops.GraphNav.filteredSearchBatch]]'s over-retrieve ladder
   * (Filtered-DiskANN's baseline, Gollapudi et al. WWW 2023, in the
   * IVF regime): each rung probes `nprobe · growth^rung` lists (capped
   * at `nlist`), filters the scored candidates, and a query whose
   * filtered cut holds `k` matches FINALIZES there — only still-thin
   * queries re-probe wider, so one selective query never drags the
   * batch. A rung that already covers ALL `nlist` lists is terminal
   * regardless of remaining budget (wider cannot exist: the filtered
   * result is exact and `thin` means the store truly holds < k
   * matches). `thin_result` rides every row of a query whose FINAL
   * rung stayed short (the row-carried contract of the graph family —
   * a zero-match query signals through its absent rows).
   *
   * `predicate` sees (query_id, idCol, cosine_sim) — deterministic id
   * arithmetic or a pre-joined id set; attribute predicates join their
   * attribute table on `idCol` downstream of [[probeThreshold]] if
   * they need scores too. Per rung the plan is exactly
   * [[probeBatch]]'s: static partition filter over the probed-list
   * union, broadcast pair join, salted two-stage ranking — plus one
   * ≤|queries|-row count collect driving the per-query pick.
   *
   * Output: (query_id, rank, idCol, cosine_sim, thin_result),
   * rank 1..≤k per query by (cosine desc, id asc).
   */
  def probeFilteredBatch(
      queries: DataFrame,
      qidCol: String,
      dir: String,
      predicate: Column,
      k: Int,
      nprobe: Int,
      escalations: Int = 1,
      growth: Int = 4): DataFrame = {
    val spark = queries.sparkSession
    ensureLive(spark, dir)
    val m = meta(spark, dir)
    require(k >= 1 && nprobe >= 1 && escalations >= 0 && growth >= 1,
      "degenerate escalation geometry")
    requireDims(queries, m.vecCol, m.dims, "probe queries")
    val q = queries.select(col(qidCol).cast("long").as("query_id"),
      col(m.vecCol).as("__q")).localCheckpoint() // re-read per rung
    var active = q.select("query_id").collect().map(_.getLong(0)).toSeq
    require(active.nonEmpty, "probeFilteredBatch: empty query set")
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("__csim").desc, col("cid").asc)
    val cents = centroids(spark, dir)
    val lists = liveLists(spark, dir, m)
    var rung = 0
    var out: DataFrame = null
    var doneLoop = false
    while (!doneLoop) {
      // Long-guarded rung width (the graph ladder's overflow rule),
      // capped at nlist — the cap is what makes the ladder terminal
      val width = (1 to rung).foldLeft(nprobe.toLong) {
        case (acc, _) => if (acc > m.nlist) acc else acc * growth
      }
      val effNprobe = math.min(width, m.nlist.toLong).toInt
      val qr = q.filter(col("query_id").isin(active: _*))
      val pairs = cents
        .crossJoin(broadcast(qr))
        .select(col("query_id"), col("cid"), col("__q"),
          Similarity.cosine(col("cemb").cast("array<double>"), col("__q"))
            .as("__csim"))
        .withColumn("__rn", row_number().over(wq))
        .filter(col("__rn") <= effNprobe)
        .select(col("query_id"), col("cid").as("list_id"), col("__q"))
        .localCheckpoint()
      val listIds = pairs.select("list_id").distinct().collect()
        .map(_.getLong(0))
      val kept = lists
        .filter(col("list_id").isin(listIds: _*))
        .join(broadcast(pairs), "list_id")
        .select(col("query_id"), col(m.idCol),
          Similarity.cosineFast(spark, col(m.vecCol), col("__q"))
            .as("cosine_sim"))
        .filter(predicate)
        .localCheckpoint() // counts + cut: one pruned list scan, not two
      val counts = kept.groupBy("query_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val thin = active.filter(qid => counts.getOrElse(qid, 0L) < k)
      val terminal = rung >= escalations || effNprobe >= m.nlist
      val settled = if (terminal) active else active.diff(thin)
      if (settled.nonEmpty) {
        val thinSet = thin.toSet
        val cut = Similarity.perQueryTopK(
            kept.filter(col("query_id").isin(settled: _*)),
            "query_id", m.idCol, "cosine_sim", k)
          .select(col("query_id"), col("rank"), col(m.idCol),
            col("cosine_sim"),
            col("query_id").isin(thinSet.toSeq: _*).as("thin_result"))
        out = if (out == null) cut else out.unionByName(cut)
      }
      if (terminal || thin.isEmpty) doneLoop = true
      else { active = thin; rung += 1 }
    }
    out
  }

  /** Assign a new batch against the FROZEN stored quantizer and land
    * it as one committed batch — idempotent per vector set
    * (deterministic tag + overwrite + marker-last commit). */
  def append(newVecs: DataFrame, dir: String): Unit = {
    val spark = newVecs.sparkSession
    Commits.withClaim(spark, dir)(appendLocked(newVecs, dir))
  }

  /** [[append]] for callers that ALREADY hold the store's drain claim
    * (the streaming maintainers serialize their whole drain — silver,
    * decisions, index — under one claim; re-acquiring here would
    * self-conflict). */
  private[graft] def appendLocked(newVecs: DataFrame, dir: String): Unit = {
    val spark = newVecs.sparkSession
    ensureLive(spark, dir)
    val m = meta(spark, dir)
    requireDims(newVecs, m.vecCol, m.dims, "append batch")
    val cents = centroids(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toSeq
    val assigned = Clustering.assign(newVecs, m.idCol, m.vecCol, cents)
      .select(col(m.idCol), col("cluster").as("list_id"))
    val data = newVecs.select(col(m.idCol), col(m.vecCol)).join(assigned, Seq(m.idCol))
    writeBatch(data, listsPath(dir), batchTag(newVecs, m.idCol), spark)
  }

  /** Rewrite the whole lists store as ONE committed `__base__` batch
    * holding `data`, swapped in crash-safely (stage → retire live →
    * promote stage → drop prev) — the shared tail of [[compact]] and
    * [[delete]]. Orphans of crashed appends are NOT carried over. */
  private def rewriteLists(spark: SparkSession, dir: String, data: DataFrame): Unit = {
    val live = new Path(listsPath(dir))
    val f = fs(spark, live)
    f.delete(new Path(stagePath(dir)), true)
    writeBatch(data, stagePath(dir), baseTag, spark)
    f.delete(prevPath(dir), true) // leftover from an ancient crash
    require(f.rename(live, prevPath(dir)), s"rewrite: failed to retire $live")
    require(f.rename(new Path(stagePath(dir)), live),
      s"rewrite: failed to promote rewritten lists (recoverable — " +
        s"${prevPath(dir)} holds the previous index)")
    f.delete(prevPath(dir), true)
  }

  /** Fold the live batches into one `__base__` batch and drop orphan
    * garbage from crashed appends. Single-writer contract: serialize
    * with appends. */
  def compact(spark: SparkSession, dir: String): Unit =
    Commits.withClaim(spark, dir) {
      ensureLive(spark, dir)
      val m = meta(spark, dir)
      rewriteLists(spark, dir, liveLists(spark, dir, m))
    }

  /**
   * Remove vectors from the index — the takedown pass: ONE rewrite of
   * the live lists minus the deleted ids (broadcast anti-join
   * preserving the list partitioning), behind the family's crash-safe
   * stage + two renames. The quantizer is untouched (centroids carry
   * no per-vector data), so probe pruning is unchanged and a forgotten
   * vector simply stops surfacing — equivalent to an index whose
   * lists never held it (spec-pinned). Deleting EVERY vector leaves a
   * valid empty index (probes return zero rows). Single-writer
   * contract: serialize with appends.
   */
  def delete(deletedIds: DataFrame, dir: String): Unit = {
    val spark = deletedIds.sparkSession
    Commits.withClaim(spark, dir) {
    ensureLive(spark, dir)
    val m = meta(spark, dir)
    val ids = deletedIds
      .select(col(deletedIds.columns.head).as(m.idCol))
      .dropDuplicates(m.idCol)
    rewriteLists(spark, dir,
      liveLists(spark, dir, m).join(broadcast(ids), Seq(m.idCol), "left_anti"))
  } }

  /** Crash-safe quantizer swap — the [[rewriteLists]] two-rename
    * protocol on the centroids dir ([[ensureLive]] recovers the
    * window). */
  private def swapCentroids(
      spark: SparkSession, dir: String, cents: Seq[(Long, Seq[Double])]): Unit = {
    import spark.implicits._
    val live = new Path(centsPath(dir))
    val f = fs(spark, live)
    f.delete(centsStagePath(dir), true)
    cents.toDF("cid", "cemb").coalesce(1)
      .write.mode("overwrite").parquet(centsStagePath(dir).toString)
    f.delete(centsPrevPath(dir), true)
    require(f.rename(live, centsPrevPath(dir)),
      s"maintain: failed to retire $live")
    require(f.rename(centsStagePath(dir), live),
      s"maintain: failed to promote centroids (recoverable — " +
        s"${centsPrevPath(dir)} holds the previous quantizer)")
    f.delete(centsPrevPath(dir), true)
  }

  /**
   * IVF list maintenance — the FAISS-practice answer to quantizer
   * drift (appends assign against FROZEN centroids, so a shifting
   * corpus slowly concentrates mass in lists whose centroid no longer
   * sits at the member mean, and probe recall decays):
   *
   *  1. AUDIT (the q254 drift report, per list): member count and the
   *     cosine drift `1 − cos(stored centroid, member mean)` — means
   *     rounded per the [[graft.ops.Clustering.train]] convention, so
   *     an SQL engine replays the whole report;
   *  2. lists whose drift exceeds `driftThreshold` RETRAIN: their
   *     centroid moves to the member mean (one local Lloyd update) and
   *     ONLY their vectors reassign against the updated centroid set —
   *     cost ∝ the drifted lists, never the corpus;
   *  3. the reassignment lands as one committed maintenance batch
   *     whose retire spec names the superseded (older batch, drifted
   *     list) partitions — written before the batch marker, so data
   *     and retirements become one visibility unit (a crash leaves an
   *     invisible orphan; old partitions are only LOGICALLY retired
   *     and physically reclaimed by [[compact]]);
   *  4. the quantizer swaps last ([[swapCentroids]], crash-recovered
   *     by [[ensureLive]]). A crash between 3 and 4 degrades recall
   *     only (vectors sit in lists of the new centroids while probes
   *     rank the old) — re-running maintenance heals forward.
   *
   * Non-drifted lists are untouched: their partitions are neither
   * read, rewritten, nor retired (spec-pinned). Single-writer
   * contract: serialize with appends. Returns the audit report
   * (list_id, n_members, drift, retrained) — drift is NULL for an
   * empty list (nothing to compare), which never retrains.
   */
  def maintainLists(
      spark: SparkSession, dir: String, driftThreshold: Double): DataFrame =
    Commits.withClaim(spark, dir) {
    ensureLive(spark, dir)
    val m = meta(spark, dir)
    val live = liveLists(spark, dir, m)
    val meanArr = live
      .select(col("list_id"), posexplode(col(m.vecCol)).as(Seq("__d", "__v")))
      .groupBy(col("list_id"), col("__d"))
      .agg(round(avg(col("__v").cast("double")), 6).as("__m"))
      .groupBy(col("list_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("__d"), col("__m")))),
        x => x.getField("__m")).as("__mean"))
    val counts = live.groupBy(col("list_id"))
      .agg(count(lit(1)).as("n_members"))
    val drift = round(
      greatest(lit(0.0), // float guard: true cosine ≤ 1, rounding can graze it
        lit(1.0) - graft.ops.Similarity.cosine(
          col("cemb").cast("array<double>"), col("__mean"))), 6)
    val report = centroids(spark, dir)
      .select(col("cid").as("list_id"), col("cemb"))
      .join(meanArr, Seq("list_id"), "left")
      .join(counts, Seq("list_id"), "left")
      .select(
        col("list_id"),
        coalesce(col("n_members"), lit(0L)).as("n_members"),
        when(col("__mean").isNull, lit(null).cast("double"))
          .otherwise(drift).as("drift"),
        col("__mean"))
      .withColumn("retrained",
        coalesce(col("drift") > driftThreshold, lit(false)))
      .localCheckpoint() // nlist rows; sever from the dirs swapped below
    val drifted = report.filter(col("retrained"))
      .select(col("list_id"), col("__mean"))
      .collect() // ≤ nlist rows — the Clustering.train driver footprint
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    if (drifted.nonEmpty) {
      val newCents = centroids(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toSeq
        .map { case (cid, c) => cid -> drifted.getOrElse(cid, c) }
        .sortBy(_._1)
      val driftedIds = drifted.keys.toSeq.sorted
      val affected = live
        .filter(col("list_id").isin(driftedIds: _*)) // partition-pruned
        .select(col(m.idCol), col(m.vecCol))
      val data = Clustering.assign(affected, m.idCol, m.vecCol, newCents)
        .select(col(m.idCol), col(m.vecCol), col("cluster").as("list_id"))
        .localCheckpoint() // sever from a same-tag dir being overwritten
      // "m" namespace: a maintenance tag must never collide with (and
      // overwrite) the APPEND batch of the same vector set
      val tag = "m" + batchTag(affected, m.idCol)
      writeBatch(data, listsPath(dir), tag, spark,
        retire = liveTags(spark, dir).filterNot(_ == tag)
          .map(t => t -> driftedIds))
      swapCentroids(spark, dir, newCents)
    }
    report.drop("__mean")
    }
}
