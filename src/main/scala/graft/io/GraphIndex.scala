package graft.io

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.ops.Nsw

/**
 * Durable navigation-graph ANN index — the graph-regime member of the
 * published index family ([[SignatureIndex]] doc granularity,
 * [[VectorIndex]] IVF lists, [[WindowIndex]] token windows). NSW's
 * whole point in production is INCREMENTAL insert (Malkov & Yashunin
 * 2018: new points are connected by searching the standing graph), so
 * this store is built once and then maintained by daily
 * search-then-link drains instead of rebuilt per batch.
 *
 * Layout (the [[graft.streaming.SearchIngest]] merge-on-read recipe,
 * applied to adjacency lists):
 *
 *  - `adj/gen=<n>/` — adjacency rows (id, nbr, cos_micro), id-sorted
 *    within files so point lookups prune on footer min/max. A node's
 *    FULL adjacency list lives in exactly one generation;
 *  - `ledger/v=<m>/` — (id, gen): which generation holds each node's
 *    live adjacency. Versioned through [[Commits.commitVersion]], so
 *    every drain's edge flips go live all-or-nothing and a racing
 *    writer fails visibly on the CAS;
 *  - `_graft_index.json` — identity + search geometry (committed LAST
 *    at build: a crashed build leaves no readable index).
 *
 * A drain ([[ingestBatch]]) is O(batch), never O(graph): each new
 * vector runs one beam search over the standing graph
 * ([[Nsw.graphSearchBatch]] — all searches share each round's
 * pruned point lookups), links forward to its top-`k` candidates and
 * backward from them, and only the TOUCHED nodes' adjacency lists are
 * rewritten into the new generation (degree re-pruned to `k` by
 * (cos_micro desc, nbr asc) — the NSW neighbor-selection bound that
 * keeps search cost flat as the graph grows). Untouched nodes' rows
 * are never rewritten. Batch-internal candidates are exact
 * (batch×batch cosine) and FENCED: a drain above `maxBatchLink` fails
 * loudly asking to be split, because batch² past that is the honest
 * quadratic this family refuses to pay silently.
 *
 * Crash/concurrency contract (the maintainer family's): the drain
 * runs under the store's exclusive claim; the adjacency generation is
 * written FIRST under a never-reused number (max-on-disk + 1), so a
 * crash before the ledger CAS leaves an invisible orphan; the ledger
 * CAS is the single commit point; a replayed batch anti-joins the
 * ledger (already-indexed ids skip) and heals to the same state.
 * Dead generations are pruned by [[compact]], never by drains.
 */
object GraphIndex {

  /** Index identity + search geometry, fixed at build time.
    * `alphaNum/alphaDen` > 0 selects the DIVERSIFIED (α-RNG /
    * DiskANN RobustPrune) adjacency policy — every prune (build,
    * insert-merge) goes through [[graft.ops.GraphNav.alphaPrunedGraph]]
    * with a `candidateK`-wide pool instead of plain top-k; 0 = the
    * classic top-k store (and the value absent metas read as, so
    * pre-α stores keep their committed behavior). */
  final case class Meta(
      idCol: String, embCol: String, dims: Int, k: Int,
      planesPerBand: Int, bands: Int, maxBucketSize: Int,
      nEntries: Int, beamWidth: Int, maxSteps: Int,
      candidateK: Int, alphaNum: Int, alphaDen: Int)

  private def adjPath(dir: String) = s"$dir/adj"
  private def ledgerDir(dir: String) = s"$dir/ledger"
  private def metaFile(dir: String) = new Path(dir, "_graft_index.json")

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Highest adjacency generation ON DISK (committed or orphaned) —
    * the collision-free source of the next one (a crashed drain's
    * orphan number is never reused; [[graft.streaming.SearchIngest]]'s
    * lesson). */
  private def maxGenOnDisk(spark: SparkSession, dir: String): Int = {
    val p = new Path(adjPath(dir))
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) -1
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("gen="))
      .flatMap(n => scala.util.Try(n.stripPrefix("gen=").toInt).toOption)
      .reduceOption(_ max _).getOrElse(-1)
  }

  /** Per-id top-`k` adjacency from symmetric candidate edges — the
    * shared pruning rule of build and drain: dedup (id, nbr) to max
    * cos_micro, then keep k by (cos_micro desc, nbr asc) via the
    * bounded array_sort aggregation (never a corpus window). */
  private def pruneDegree(edges: DataFrame, k: Int): DataFrame =
    edges
      .groupBy(col("id"), col("nbr"))
      .agg(max(col("cos_micro")).as("cos_micro"))
      .select(col("id"),
        struct((-col("cos_micro")).as("nc"), col("nbr").as("nbr")).as("e"))
      .groupBy("id")
      .agg(slice(array_sort(collect_list(col("e"))), 1, k).as("top"))
      .select(col("id"), explode(col("top")).as("e"))
      .select(col("id"), col("e.nbr").as("nbr"), (-col("e.nc")).as("cos_micro"))

  /**
   * Build the index from scratch: [[Nsw.knnGraph]] over the
   * corpus → adjacency generation 0 → ledger v0 → meta LAST.
   * Overwrites any previous index at `dir`.
   */
  def build(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      dir: String,
      dims: Int,
      k: Int = 8,
      planesPerBand: Int = 6,
      bands: Int = 4,
      maxBucketSize: Int = 400,
      nEntries: Int = 4,
      beamWidth: Int = 16,
      maxSteps: Int = 10,
      candidateK: Int = 0,
      alphaNum: Int = 0,
      alphaDen: Int = 10): Unit = {
    require(Seq(idCol, embCol).forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      "id/emb columns must be plain identifiers (stored in index meta)")
    val spark = corpus.sparkSession
    val base = new Path(dir)
    val fs = fsOf(spark, base)
    // targeted reset: only the index's own parts — a maintainer's held
    // drain claim (and its durable folded-files record) must survive a
    // bootstrap build running UNDER that claim
    fs.delete(metaFile(dir), false)
    fs.delete(new Path(adjPath(dir)), true)
    fs.delete(new Path(ledgerDir(dir)), true)
    val poolK = if (alphaNum > 0) math.max(candidateK, k) else k
    val g0 = Nsw.knnGraph(corpus, idCol, embCol,
      planesPerBand, bands, dims, poolK, minCosine = -1.0, maxBucketSize)
    val g = (if (alphaNum <= 0) g0
      else graft.ops.GraphNav.alphaPrunedGraph(
        g0, corpus, idCol, embCol, r = k, alphaNum, alphaDen))
      .select(col("id").cast("long").as("id"), col("nbr").cast("long").as("nbr"),
        col("cos_micro").cast("long").as("cos_micro"))
      .withColumn("gen", lit(0))
    g.sortWithinPartitions("id") // footer min/max → point-lookup pruning
      .write.mode("overwrite").partitionBy("gen").parquet(adjPath(dir))
    // ledger = EVERY corpus id (isolated vectors hold an empty list):
    // the indexed-set record the maintainer's replay anti-join needs,
    // and the hook back-links attach to when neighbors arrive later
    Commits.commitVersion(
      corpus.select(col(idCol).cast("long").as("id")).distinct()
        .withColumn("gen", lit(0)),
      ledgerDir(dir), -1)
    val json =
      s"""{"id_col": "$idCol", "emb_col": "$embCol", "dims": $dims, """ +
        s""""k": $k, "planes_per_band": $planesPerBand, "bands": $bands, """ +
        s""""max_bucket_size": $maxBucketSize, "n_entries": $nEntries, """ +
        s""""beam_width": $beamWidth, "max_steps": $maxSteps, """ +
        s""""candidate_k": ${math.max(candidateK, k)}, """ +
        s""""alpha_num": $alphaNum, "alpha_den": $alphaDen}"""
    val out = fs.create(metaFile(dir), true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** Read the index identity. Fails if `dir` holds no committed index. */
  def meta(spark: SparkSession, dir: String): Meta = {
    val p = metaFile(dir)
    val fs = fsOf(spark, p)
    require(fs.exists(p), s"no graph index at $dir (missing ${p.getName})")
    val in = fs.open(p)
    val json =
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
    def str(k: String) = s""""$k": "([^"]*)"""".r.findFirstMatchIn(json)
      .getOrElse(sys.error(s"bad graph index meta: missing $k")).group(1)
    def num(k: String) = s""""$k": (\\d+)""".r.findFirstMatchIn(json)
      .getOrElse(sys.error(s"bad graph index meta: missing $k")).group(1).toInt
    // absent in pre-α metas → the classic top-k policy, unchanged
    def numOr(k: String, d: Int) = s""""$k": (\\d+)""".r
      .findFirstMatchIn(json).map(_.group(1).toInt).getOrElse(d)
    Meta(str("id_col"), str("emb_col"), num("dims"), num("k"),
      num("planes_per_band"), num("bands"), num("max_bucket_size"),
      num("n_entries"), num("beam_width"), num("max_steps"),
      numOr("candidate_k", num("k")), numOr("alpha_num", 0),
      numOr("alpha_den", 10))
  }

  /** The live adjacency (id, nbr, cos_micro): generation rows
    * restricted to each node's ledger generation (broadcast semi-join
    * — the ledger is ids-only, the MoR resolve of
    * [[graft.streaming.SearchIngest.readIndex]]). */
  def edges(spark: SparkSession, dir: String): DataFrame = {
    val ledger = Commits.readVersioned(spark, ledgerDir(dir))
      .getOrElse(sys.error(s"no committed ledger under ${ledgerDir(dir)}"))
      ._2.select(col("id"), col("gen"))
    // an EDGE-FREE graph is a valid state (single-vector bootstrap, a
    // delete-all followed by compact): Spark's dynamic-partition writer
    // creates no files for zero rows, so read with the explicit schema
    // and hand back an empty frame instead of a schema-inference crash
    // (the VectorIndex empty-but-readable contract)
    val p = new Path(adjPath(dir))
    val fs = fsOf(spark, p)
    def hasData: Boolean = fs.exists(p) && fs.listStatus(p)
      .filter(_.isDirectory).exists(g => fs.listStatus(g.getPath)
        .exists(f => f.isFile && f.getPath.getName.endsWith(".parquet")))
    val adjSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("nbr",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("cos_micro",
        org.apache.spark.sql.types.LongType, nullable = true)))
    if (!hasData)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], adjSchema)
    else spark.read.parquet(adjPath(dir))
      .join(broadcast(ledger), Seq("id", "gen"), "left_semi")
      .select(col("id"), col("nbr"), col("cos_micro"))
  }

  /** Ids currently in the graph (the ledger — adjacency-holding nodes). */
  def storedIds(spark: SparkSession, dir: String): DataFrame =
    Commits.readVersioned(spark, ledgerDir(dir))
      .getOrElse(sys.error(s"no committed ledger under ${ledgerDir(dir)}"))
      ._2.select(col("id"))

  /** Beam search over the stored graph with the geometry committed at
    * build time — [[Nsw.graphSearchBatch]] against the MoR
    * adjacency; per-round point lookups prune on the id-sorted files.
    * `corpus` supplies the vectors (the graph stores topology only). */
  def searchBatch(
      spark: SparkSession,
      dir: String,
      corpus: DataFrame,
      queries: DataFrame,
      qidCol: String,
      k: Int,
      entries: Seq[Long] = Nil): DataFrame = {
    val m = meta(spark, dir)
    Nsw.graphSearchBatch(corpus, m.idCol, m.embCol,
      queries, qidCol, edges(spark, dir), k,
      m.nEntries, m.beamWidth, m.maxSteps, entries)
  }

  /** Attribute-FILTERED batch search over the stored graph — the
    * production "top-k WHERE <predicate>" against a PUBLISHED index:
    * [[graft.ops.GraphNav.filteredSearchBatch]]'s per-query
    * over-retrieve escalation (Filtered-DiskANN's baseline, Gollapudi
    * et al. WWW 2023) wired to the MoR adjacency, walking with the
    * geometry committed at build time. Each rung's merged point
    * lookups prune on the id-sorted generation files exactly as
    * [[searchBatch]]'s do; `predicate` sees (query_id, idCol,
    * cosine_sim). Output: (qidCol, rank, idCol, cosine_sim,
    * thin_result), rank 1..≤k per query. */
  def filteredSearchBatch(
      spark: SparkSession,
      dir: String,
      corpus: DataFrame,
      queries: DataFrame,
      qidCol: String,
      predicate: org.apache.spark.sql.Column,
      k: Int,
      entries: Seq[Long] = Nil,
      overFetch: Int = 4,
      escalations: Int = 1,
      growth: Int = 4): DataFrame = {
    val m = meta(spark, dir)
    graft.ops.GraphNav.filteredSearchBatch(corpus, m.idCol, m.embCol,
      queries, qidCol, edges(spark, dir), predicate, k,
      m.nEntries, m.beamWidth, m.maxSteps, entries,
      overFetch, escalations, growth)
  }

  /** Single-query [[searchBatch]]: (idCol, cosine_sim), top-k.
    * `entries` overrides the corner seeds (the stride policy the r17
    * recall audit recommends — replayable spread seeds). */
  def search(
      spark: SparkSession,
      dir: String,
      corpus: DataFrame,
      queryDf: DataFrame,
      k: Int,
      entries: Seq[Long] = Nil): DataFrame = {
    val m = meta(spark, dir)
    searchBatch(spark, dir, corpus,
        queryDf.select(lit(0L).as("__qid"), col(m.embCol)), "__qid", k,
        entries)
      .select(col(m.idCol), col("cosine_sim"))
  }

  /**
   * Search-then-link drain: insert `newVecs` into the standing graph.
   * `corpus` must hold the standing vectors AND the batch (the vector
   * store this index navigates). Already-indexed ids are skipped (the
   * ledger anti-join — a replayed batch heals to the committed state).
   * Returns the number of vectors actually inserted.
   */
  def ingestBatch(
      spark: SparkSession,
      dir: String,
      corpus: DataFrame,
      newVecs: DataFrame,
      maxBatchLink: Int = 4096): Long =
    Commits.withClaim(spark, dir)(
      ingestLocked(spark, dir, corpus, newVecs, maxBatchLink))

  /** [[ingestBatch]] for callers that ALREADY hold the store's drain
    * claim (the streaming maintainer serializes silver + index under
    * one claim — re-acquiring here would self-conflict; the
    * [[VectorIndex.appendLocked]] convention). */
  private[graft] def ingestLocked(
      spark: SparkSession,
      dir: String,
      corpus: DataFrame,
      newVecs: DataFrame,
      maxBatchLink: Int): Long = {
    val m = meta(spark, dir)
    val (ledgerVersion, ledger) =
      Commits.readVersioned(spark, ledgerDir(dir))
        .getOrElse(sys.error(s"no committed ledger under ${ledgerDir(dir)}"))
    // one vector per id per drain is the landing-zone contract; an
    // at-least-once producer can still violate it, and a duplicate id
    // would otherwise throw inside the batch search and WEDGE a
    // replaying maintainer (the fresh files never fold) — resolve to
    // the max embedding (array ordering), deterministically
    val batch = newVecs
      .select(col(m.idCol).cast("long").as("id"), col(m.embCol).as("__e"))
      .filter(col("id").isNotNull)
      .groupBy("id").agg(max(col("__e")).as("__e"))
      .join(broadcast(ledger.select(col("id"))), Seq("id"), "left_anti")
      .localCheckpoint() // feeds searches, internal pairs, and the link
    val nDelta = batch.count()
    if (nDelta == 0) 0L
    else {
      require(nDelta <= maxBatchLink,
        s"graph drain of $nDelta vectors exceeds maxBatchLink=$maxBatchLink " +
          "— batch-internal linking is exact (batch²); split the drain")
      require(batch.filter(size(col("__e")) =!= m.dims).limit(1).count() == 0,
        s"batch contains vectors whose width != index dims (${m.dims})")
      // standing = corpus minus the batch (broadcast anti-join on the
      // BATCH ids — batch-sized, never ledger-sized)
      val standing = corpus.join(
        broadcast(batch.select(col("id").as(m.idCol))), Seq(m.idCol), "left_anti")
      val standingEdges = edges(spark, dir).localCheckpoint()
      // per-store prune policy: plain top-k, or the α-RNG RobustPrune
      // (the DiskANN insert rule). The candidate list is PRE-CUT to
      // the meta's candidateK pool through the bounded top-k kernel
      // BEFORE the occlusion greedy: alphaPrunedGraph's pairwise pass
      // is O(candidates²) per node, and a near-maxBatchLink drain
      // feeds each new id ~batch internal candidates (a hot standing
      // node collects ~batch back-links) — uncapped, that is a
      // batch²-per-node join; capped, it is the documented n·O(k²)
      // contract with the same greedy semantics on the sorted prefix.
      def prune(edges: DataFrame): DataFrame =
        if (m.alphaNum <= 0) pruneDegree(edges, m.k)
        else graft.ops.GraphNav.alphaPrunedGraph(
            pruneDegree(edges, m.candidateK),
            corpus, m.idCol, m.embCol, r = m.k, m.alphaNum, m.alphaDen)
          .select(col("id"), col("nbr"), col("cos_micro"))
      // one shared-rounds search per new vector over the standing
      // graph; an α store walks a candidateK-wide pool so RobustPrune
      // has diverse candidates to keep (the DiskANN visited-set role;
      // the meta normalizes candidate_k >= k at build time)
      val poolK = if (m.alphaNum > 0) m.candidateK else m.k
      val walks = Nsw.graphSearchBatch(
        standing, m.idCol, m.embCol,
        batch.select(col("id").as("__bq"), col("__e").as(m.embCol)), "__bq",
        standingEdges, poolK, m.nEntries, m.beamWidth, m.maxSteps)
      // exact batch-internal candidates (fenced above)
      val b2 = batch.select(col("id").as("__ib"), col("__e").as("__e2"))
      val internal = broadcast(batch).join(b2, col("id") =!= col("__ib"))
        .withColumn("__sim",
          Similarity.cosineFast(spark, col("__e"), col("__e2")))
        .filter(col("__sim").isNotNull)
        .select(col("id").as("query_id"), col("__ib").as("nbr"),
          col("__sim").as("cosine_sim"))
      // forward links: per new id, top-k of (walk ∪ internal) by
      // (cos_micro desc, nbr asc) — the stored graph's micro-integer
      // rank order, applied through the same pruning kernel
      val fwd = prune(
        walks.select(col("query_id").as("id"),
            col(m.idCol).cast("long").as("nbr"),
            round(col("cosine_sim") * 1e6, 0).cast("long").as("cos_micro"))
          .unionByName(internal.select(col("query_id").as("id"),
            col("nbr").cast("long").as("nbr"),
            round(col("cosine_sim") * 1e6, 0).cast("long").as("cos_micro"))))
      val sym = fwd.unionByName(fwd.select(col("nbr").as("id"),
        col("id").as("nbr"), col("cos_micro")))
      // touched = linked nodes ∪ the WHOLE batch: a batch vector that
      // found no links still enters the ledger (indexed, empty list)
      val touched = sym.select(col("id"))
        .unionByName(batch.select(col("id")))
        .distinct().localCheckpoint()
      val merged = prune(
        standingEdges.join(broadcast(touched), Seq("id"), "left_semi")
          .unionByName(sym))
        .localCheckpoint() // sized ∝ touched·k; feeds adj AND ledger
      // adjacency generation FIRST (orphan if we crash), ledger CAS LAST
      val gen = maxGenOnDisk(spark, dir) + 1
      merged.withColumn("gen", lit(gen))
        .sortWithinPartitions("id")
        .write.mode("append").partitionBy("gen").parquet(adjPath(dir))
      val newLedger = ledger
        .join(touched, Seq("id"), "left_anti")
        .unionByName(touched.withColumn("gen", lit(gen)))
      Commits.commitVersion(newLedger, ledgerDir(dir), ledgerVersion)
      nDelta
    }
  }

  /**
   * Remove vectors from the graph — the takedown /
   * right-to-be-forgotten pass of the index family
   * ([[SignatureIndex.delete]], [[VectorIndex.delete]], graph form):
   * deleted ids leave the ledger (their adjacency lists become
   * unreachable — physically reclaimed by [[compact]]), and every
   * surviving node that POINTED at a deleted id rewrites its list
   * minus those edges into a fresh generation. Cost ∝ the deleted
   * ids' in/out neighborhoods — untouched nodes' rows never rewrite.
   *
   * Equivalent to dropping every edge incident to a deleted id
   * (spec-pinned). Survivor navigability can degrade vs a full
   * rebuild — the honest NSW deletion trade; the public practice is
   * periodic re-link (a [[ingestBatch]] of the affected region) or
   * rebuild on schedule. Callers must also forget the vectors in the
   * corpus store they search with. Returns ids actually removed.
   */
  def delete(spark: SparkSession, dir: String, deletedIds: DataFrame): Long =
    Commits.withClaim(spark, dir) {
      val (ledgerVersion, ledger) =
        Commits.readVersioned(spark, ledgerDir(dir))
          .getOrElse(sys.error(s"no committed ledger under ${ledgerDir(dir)}"))
      val del = deletedIds
        .select(col(deletedIds.columns.head).cast("long").as("id"))
        .distinct()
        .join(ledger.select("id"), Seq("id"), "left_semi") // unknown ids no-op
        .localCheckpoint()
      val nDel = del.count()
      if (nDel == 0) 0L
      else {
        val live = edges(spark, dir).localCheckpoint()
        // survivors whose lists reference a deleted id rewrite, minus
        // those edges; a list can legitimately empty out (the node
        // stays in the ledger with no out-edges)
        val owners = live
          .join(broadcast(del.select(col("id").as("nbr"))), Seq("nbr"), "left_semi")
          .select(col("id")).distinct()
          .join(broadcast(del), Seq("id"), "left_anti")
          .localCheckpoint()
        val rewritten = live
          .join(broadcast(owners), Seq("id"), "left_semi")
          .join(broadcast(del.select(col("id").as("nbr"))), Seq("nbr"), "left_anti")
          .select(col("id"), col("nbr"), col("cos_micro"))
        val gen = maxGenOnDisk(spark, dir) + 1
        rewritten.withColumn("gen", lit(gen))
          .sortWithinPartitions("id")
          .write.mode("append").partitionBy("gen").parquet(adjPath(dir))
        val newLedger = ledger
          .join(broadcast(del), Seq("id"), "left_anti")
          .join(owners, Seq("id"), "left_anti")
          .unionByName(owners.withColumn("gen", lit(gen)))
        Commits.commitVersion(newLedger, ledgerDir(dir), ledgerVersion)
        nDel
      }
    }

  /**
   * Merge-on-read compaction: rewrite every LIVE adjacency list into
   * one fresh generation (max-on-disk + 1 — a crashed compaction's
   * number is never reused), swap the ledger all-or-nothing, then
   * prune dead generation directories. Cost ∝ live edges, paid on
   * schedule instead of per drain. Returns directories pruned.
   */
  def compact(spark: SparkSession, dir: String): Int =
    Commits.withClaim(spark, dir) {
      val live = edges(spark, dir).localCheckpoint()
      val gen = maxGenOnDisk(spark, dir) + 1
      live.withColumn("gen", lit(gen))
        .sortWithinPartitions("id")
        .write.mode("append").partitionBy("gen").parquet(adjPath(dir))
      val (ledgerVersion, ledger) =
        Commits.readVersioned(spark, ledgerDir(dir))
          .getOrElse(sys.error(s"no committed ledger under ${ledgerDir(dir)}"))
      Commits.commitVersion(
        ledger.select(col("id")).withColumn("gen", lit(gen)),
        ledgerDir(dir), ledgerVersion)
      val p = new Path(adjPath(dir))
      val fs = fsOf(spark, p)
      val dead = fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
        .filter { d =>
          d.getName.startsWith("gen=") &&
            scala.util.Try(d.getName.stripPrefix("gen=").toInt).toOption
              .exists(_ < gen)
        }
      dead.foreach(fs.delete(_, true))
      dead.length
    }
}
