package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableSql
import graft.functions.PortableSql.{DuckDialect => DD, SparkDialect => SD}
import graft.io.Layers
import graft.ops.{Aggregate, Clean, Dedup, ImageDedup, Multimodal, Quality, Similarity}
import graft.ops.Aggregate.{AggSpec, Metric}

/** io slice of the [[SparkEntry]] registry — reference parity (q01-q10, q26-q28) + config/pipeline surface + storage/layout/io: roundtrips, z-order, compaction, zone maps, SCD2/CDC, time travel.
  * Split by family for maintainability; entries and oracles are
  * verbatim registry content (no behavior change). */
private[graft] trait EntryIo extends EntryContext {

  protected def ioQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_silver_clean" -> ((s, dir) => {
      val base = T(s, dir, "customer")
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
      val dups = base.filter(col("c_custkey") % 20 === 0)
        .withColumn("c_name", concat(lit(" "), col("c_name"), lit("  ")))
      val nulls = base.filter(col("c_custkey") % 20 === 7)
        .withColumn("c_name", lit(null).cast("string"))
      val injected = base.unionByName(dups).unionByName(nulls)
      val deduped = Clean.dedupLatest(injected, Seq("c_custkey"),
        Seq(col("c_name").asc_nulls_first))
      val dropped = Clean.dropNullKeys(deduped, Seq("c_custkey", "c_name"))
      Clean.normalize(dropped, Seq("c_name", "c_mktsegment"))
    }),


    // ---- reference parity: gold 3-branch union of rollups (A1-A3+U1+P3+P4)
    "q02_gold_union3" -> ((s, dir) =>
      Aggregate.unionRollups(
        T(s, dir, "orders"),
        Seq(
          AggSpec(Seq("o_orderstatus"),
            Seq(Metric("total_orders", "count(*)")), "by_status"),
          AggSpec(Seq("o_orderpriority", "o_orderstatus"),
            Seq(Metric("total_orders", "count(*)")), "by_priority_status"),
          AggSpec(Seq("o_orderstatus", "o_orderpriority"),
            Seq(Metric("total_orders", "count(*)")), "by_status_priority")),
        "2025-10-15")),


    // ---- optimized twin: single-scan GROUPING SETS (SURVEY §4.3)
    "q03_grouping_sets" -> ((s, dir) =>
      Aggregate.groupingSetsRollup(
        T(s, dir, "orders"),
        Seq(
          "g_status" -> Seq("o_orderstatus"),
          "g_priority_status" -> Seq("o_orderstatus", "o_orderpriority")),
        Seq(
          Metric("total_orders", "count(*)"),
          Metric("sum_price", dsum("o_totalprice"))),
        "2025-10-15")),


    // ---- quality-rule engine, single-pass (Q1, SURVEY §2.8)
    "q04_quality_report" -> ((s, dir) =>
      Quality.report(
        T(s, dir, "lineitem"),
        Seq(
          Quality.NotNull("non_null_returnflag", "l_returnflag"),
          Quality.GreaterThanZero("positive_quantity", "l_quantity"),
          Quality.ExprRule("discount_range", "l_discount >= 0 and l_discount <= 0.1")))),


    // ---- declarative agg DSL (A4) — TPC-H-Q1-shaped
    "q05_agg_dsl" -> ((s, dir) =>
      Aggregate.run(
        T(s, dir, "lineitem"),
        AggSpec(
          Seq("l_returnflag", "l_linestatus"),
          Seq(
            Metric("count_order", "count(*)"),
            Metric("sum_qty", dsum("l_quantity")),
            Metric("sum_base_price", dsum("l_extendedprice")),
            Metric("sum_disc_price",
              "cast(sum(cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(4,2)))) as double)"),
            Metric("avg_qty", s"${dsum("l_quantity")} / count(*)")),
          "q1"))),


    // ---- exact dedup (D1 full-row distinct)
    "q06_dedup_exact" -> ((s, dir) =>
      Dedup.exact(T(s, dir, "documents").select("lang", "source"), Seq("lang", "source"))),


    // ---- bronze stamp + enforced projection (P1 + P5)
    "q07_ingest_stamp" -> ((s, dir) =>
      T(s, dir, "customer")
        .select("c_custkey", "c_name", "c_mktsegment")
        .withColumn("ingestion_date", lit("2025-10-15").cast("date"))),


    // ---- JSONL sink + schema-enforced JSONL scan roundtrip (K1/K2 + S2/S3)
    "q08_jsonl_roundtrip" -> ((s, dir) => {
      val out = tmp("q08_jsonl")
      Layers.writeJsonl(T(s, dir, "customer"), out)
      Layers.readJsonl(s, out, graft.schema.Metadata.structFromSpec(
        """
        c_custkey: long
        c_name: string
        c_nationkey: int
        c_acctbal: double
        c_mktsegment: string
        """))
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n_customers"),
          expr(dsum("c_acctbal")).as("sum_acctbal"))
    }),


    // ---- partitioned parquet sink w/ dynamic overwrite + readback (K3 + S4)
    "q09_partition_roundtrip" -> ((s, dir) => {
      val out = tmp("q09_silver")
      Layers.writeSilver(
        T(s, dir, "customer"), out, partitionCols = Seq("c_mktsegment"))
      Layers.readParquet(s, out)
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n_customers"),
          expr(dsum("c_acctbal")).as("sum_acctbal"))
    }),


    // ---- latest-successful-run resolution (O3 analog)
    "q10_latest_run" -> ((s, dir) => {
      val base = tmp("q10_runs")
      val cust = T(s, dir, "customer")
      Layers.writeJsonl(cust.filter(col("c_custkey") % 2 === 0), base, Some("20251014"))
      Layers.writeJsonl(cust, base, Some("20251015"))
      val latest = Layers.latestSuccessfulRun(s, base).get
      Layers.readJsonl(s, latest, graft.schema.Metadata.structFromSpec(
        "c_custkey: long"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("c_custkey")).as("sum_key"))
    }),


    // ---- O1/O2/K4/K5: config-assembled medallion pipeline end-to-end
    //      (bronze JSONL → silver clean parquet → gold rollups → quality
    //      report artifact), result = the gold table it published
    "q26_pipeline_gold" -> ((s, dir) => {
      val base = tmp("q26_pipeline")
      val conf = graft.config.PipelineConfig.parse(pipelineYaml)
      val meta = graft.config.PipelineConfig.parseMetadata(metadataYaml)
      val (report, goldPath) = graft.pipeline.Medallion.run(
        s, conf, meta,
        source = sp => T(sp, dir, "customer"),
        baseDir = base, runId = "20251015", transformationDate = "2025-10-15",
        clean = graft.pipeline.Medallion.CleanSpec(
          dedupKeys = Seq("c_custkey"),
          requiredCols = Seq("c_custkey", "c_name", "c_mktsegment"),
          normalizeCols = Seq("c_name", "c_mktsegment"),
          order = Seq(col("c_name").asc_nulls_first)))
      require(report.succeeded, s"pipeline failed:\n${report.toJson}")
      Layers.readParquet(s, goldPath)
        .select("c_mktsegment", "c_nationkey", "total_customers", "sum_acctbal",
          "aggregation", "transformation_date")
    }),


    // ---- S2: schema-inferred JSONL scan (bronze exploration path)
    "q27_jsonl_inferred" -> ((s, dir) => {
      val out = tmp("q27_jsonl")
      Layers.writeJsonl(T(s, dir, "customer"), out)
      Layers.readJsonlInferred(s, out)
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n_customers"),
          sum(col("c_custkey")).as("sum_key"))
    }),


    // ---- relational surface: pivot (wide roll-up). Spark plans this
    //      as a single two-phase aggregation over pivot-value CASE
    //      branches — same cost as the manual conditional aggregation
    //      the oracle spells out. Explicit value list: at scale you
    //      never let pivot() run its implicit distinct-collect pass.
    "q48_pivot" -> ((s, dir) =>
      T(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(
          col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))),


    // ---- north-star: declarative corpus-quality filter chain (Gopher
    //      shape) bound from YAML. The SAME filter objects generate the
    //      Spark expression AND the DuckDB oracle below, so the config
    //      surface itself is correctness-gated.
    "q62_corpus_filter_dsl" -> ((s, dir) =>
      graft.ops.CorpusFilters.decide(
        T(s, dir, "documents"), "text", "doc_id",
        graft.config.PipelineConfig.parseCorpusFilters(corpusFilterYaml))),


    // ---- north-star: batched model-scoring seam (mapPartitions,
    //      per-partition model init, fixed micro-batches). The stub
    //      model is pure integer arithmetic, so the oracle checks the
    //      WHOLE seam end-to-end — swapping in a real model changes
    //      only the scorer, not the plan.
    "q45_model_score" -> ((s, dir) =>
      graft.ops.Scoring.scoreDocs(
        T(s, dir, "documents"), "doc_id", "text",
        () => new graft.ops.Scoring.StubScorer, batchSize = 64)),


    // ---- K6: range-clustered parquet sink — every output file covers
    //      a disjoint o_orderdate range (footer min/max → file skipping
    //      for high-cardinality keys where partitionBy would explode).
    //      Roundtrip + range-filter aggregate; oracle replays the
    //      filter on the source table (layout changes I/O, not answers).
    "q57_range_clustered" -> ((s, dir) => {
      val out = tmp("q57_range")
      Layers.writeRangeClustered(
        T(s, dir, "orders"), out, Seq("o_orderdate"), numFiles = 8)
      Layers.readParquet(s, out)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .agg(
          count(lit(1)).as("n_orders"),
          expr(s"${dsum("o_totalprice")} AS sum_price"))
    }),


    // ---- S1: page-partitioned bounded source (DataSourceV2) — pages
    //      fetched in parallel, per-page retry inside the reader
    "q28_paged_source" -> ((s, dir) => {
      val out = tmp("q28_paged")
      Layers.writeJsonl(T(s, dir, "customer").coalesce(1), out)
      val file = new java.io.File(out).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".json"))
        .getOrElse(sys.error(s"no jsonl part file under $out")).getPath
      s.read.format("graft.sources.PagedJsonlSource")
        .option("path", file).option("pageSize", "100")
        .load()
        .select(col("page"),
          from_json(col("value"), graft.schema.Metadata.structFromSpec(
            "c_custkey: long")).getField("c_custkey").as("c_custkey"))
        .agg(
          countDistinct(col("page")).as("n_pages"),
          count(lit(1)).as("n_rows"),
          sum(col("c_custkey")).as("sum_key"))
    }),


    // ---- north-star: Z-order (Morton) cluster key — integer rank
    //      buckets against full-table bounds, bits interleaved; the
    //      arithmetic the z-ordered sink sorts by, oracle-checked
    //      value-for-value on a deterministic slice.
    "q120_zvalues" -> ((s, dir) =>
      Layers.zValues(
          T(s, dir, "lineitem"), Seq("l_orderkey", "l_partkey"),
          bits = 8, zCol = "zval")
        .filter(col("l_orderkey") <= 400)
        .select("l_orderkey", "l_partkey", "zval")),


    // ---- north-star: Z-order clustered sink roundtrip — layout
    //      changes I/O (multi-column file skipping, LayersSpec), never
    //      answers: the box-filter aggregate must equal the source.
    "q121_zorder_roundtrip" -> ((s, dir) => {
      val out = tmp("q121_zorder")
      Layers.writeZOrdered(
        T(s, dir, "lineitem"), out, Seq("l_orderkey", "l_partkey"),
        numFiles = 8)
      Layers.readParquet(s, out)
        .filter(col("l_orderkey").between(3000, 6000) &&
          col("l_partkey").between(500, 900))
        .agg(
          count(lit(1)).as("n_rows"),
          sum("l_orderkey").as("sum_ok"),
          sum("l_partkey").as("sum_pk"),
          expr(s"${dsum("l_quantity")} AS sum_qty"))
    }),


    // ---- north-star: SCD2 versioned-dimension merge — corpus
    //      metadata (source registries, licenses) maintained with full
    //      history; batch-∝: only touched keys' open rows enter the
    //      window, closed history passes through. Batch synthesized
    //      in-query: real updates (ts 10), no-op churn (ts 20, must
    //      NOT create versions), and brand-new keys.
    "q122_scd2_merge" -> ((s, dir) => {
      val cust = T(s, dir, "customer")
      val state0 = cust.select(col("c_custkey"), col("c_mktsegment"),
        lit(0L).as("valid_from"), lit(null).cast("long").as("valid_to"),
        lit(true).as("is_current"))
      val upd = cust.filter(col("c_custkey") % 5 === 0)
        .select(col("c_custkey"),
          concat(col("c_mktsegment"), lit("_U")).as("c_mktsegment"),
          lit(10L).as("ts"))
        .unionByName(cust.filter(col("c_custkey") % 10 === 0)
          .select(col("c_custkey"),
            concat(col("c_mktsegment"), lit("_U")).as("c_mktsegment"),
            lit(20L).as("ts")))
        .unionByName(cust.filter(col("c_custkey") % 25 === 0)
          .select((col("c_custkey") + 100000L).as("c_custkey"),
            lit("NEW_SEG").as("c_mktsegment"), lit(10L).as("ts")))
      graft.ops.Scd.mergeScd2(state0, upd, "c_custkey", "ts",
        Seq("c_mktsegment"))
    }),


    // ---- north-star: small-files compaction \u2014 the table-maintenance
    //      op long-lived sinks need (planning cost grows with FILE
    //      COUNT, not bytes). A deliberately fragmented 48-file copy is
    //      compacted by input-byte budget; the oracle aggregates the
    //      compacted dir against the SOURCE table \u2014 layout changes I/O,
    //      never the answer (the q121 invariant).
    "q129_compaction" -> ((s, dir) => {
      val frag = tmp("compact_frag")
      val out = tmp("compact_out")
      T(s, dir, "documents").repartition(48)
        .write.mode("overwrite").parquet(frag)
      val (nBefore, nAfter, _) =
        graft.io.Layers.compact(s, frag, out, targetFileBytes = 4L << 20)
      require(nAfter < nBefore,
        s"compaction must reduce file count, got $nBefore -> $nAfter")
      graft.io.Layers.readParquet(s, out)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"))
    }),


    // ---- north-star: schema-drift union \u2014 two producer versions of
    //      the same feed (v1: int ids + float score, no n_chars; v2:
    //      long ids + double score + n_chars) read as ONE frame through
    //      explicit numeric widening; Spark's mergeSchema hard-fails on
    //      exactly this int-vs-long footer conflict. max(q) (not sum)
    //      keeps the float\u2192double widening check order-insensitive.
    "q130_schema_drift" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val v1 = tmp("drift_v1")
      val v2 = tmp("drift_v2")
      docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").cast("int").as("doc_id"), col("lang"),
          (col("n_chars") / lit(100.0)).cast("float").as("q"))
        .write.mode("overwrite").parquet(v1)
      docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("lang"),
          (col("n_chars") / lit(100.0)).cast("double").as("q"),
          col("n_chars"))
        .write.mode("overwrite").parquet(v2)
      graft.io.Layers.readDrifted(s, Seq(v1, v2))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("doc_id")).as("sum_id"),
          sum(when(col("n_chars").isNull, 1L).otherwise(0L)).as("n_chars_missing"),
          max(col("q")).as("max_q"))
    }),


    // ---- north-star: CDC apply — materialize an I/U/D change log onto
    //      a current-state table (the flat-state sibling of q122's
    //      SCD2: serving shape, no history). Winner per key via ONE
    //      decomposable max_by aggregate; the state is pruned by a
    //      broadcast anti-join, never reshuffled. Changes synthesized
    //      in-query: updates (ts 10), deletes (ts 20, overriding the
    //      update where keys overlap), a LATE update (ts 5, must lose
    //      to the delete), and brand-new inserts.
    "q137_cdc_apply" -> ((s, dir) => {
      val cust = T(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      val upd = cust.filter(col("c_custkey") % 5 === 0).select(
        col("c_custkey"), lit(10L).as("ts"), lit("U").as("op"),
        concat(col("c_mktsegment"), lit("_U")).as("c_mktsegment"),
        (col("c_acctbal") + lit(100.0)).as("c_acctbal"))
      val del = cust.filter(col("c_custkey") % 7 === 0).select(
        col("c_custkey"), lit(20L).as("ts"), lit("D").as("op"),
        lit(null).cast("string").as("c_mktsegment"),
        lit(null).cast("double").as("c_acctbal"))
      val late = cust.filter(col("c_custkey") % 7 === 0).select(
        col("c_custkey"), lit(5L).as("ts"), lit("U").as("op"),
        lit("LATE").as("c_mktsegment"), lit(0.0).as("c_acctbal"))
      val ins = cust.filter(col("c_custkey") % 25 === 0).select(
        (col("c_custkey") + 1000000L).as("c_custkey"),
        lit(10L).as("ts"), lit("I").as("op"),
        lit("NEW_SEG").as("c_mktsegment"), lit(1.5).as("c_acctbal"))
      graft.ops.Cdc.applyCdc(cust,
          upd.unionByName(del).unionByName(late).unionByName(ins),
          "c_custkey", "ts", "op", Seq("c_mktsegment", "c_acctbal"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_rows"),
          sum("c_custkey").as("sum_keys"),
          expr("cast(sum(cast(c_acctbal as decimal(18,6))) as double)")
            .as("sum_bal"))
    }),


    // ---- north-star: WARC web-archive ingestion roundtrip — documents
    //      land as one gzip member per record via the distributed sink,
    //      then the DataSourceV2 reader re-ingests them across
    //      record-boundary-aware splits (splitBytes forced tiny so the
    //      sync path actually runs); the per-bucket aggregate proves no
    //      record is lost, duplicated, or byte-shifted vs the table the
    //      archive was rendered from (content_length = UTF-8 bytes,
    //      decoded chars = source chars).
    "q139_warc_source" -> ((s, dir) => {
      val out = tmp("q139_warc")
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      graft.sources.WarcIO.writeWarc(
        docs.select(
          concat(lit("http://corpus.local/doc/"), col("doc_id")).as("target_uri"),
          lit("2026-01-01T00:00:00Z").as("warc_date"),
          concat(lit("<urn:graft:doc:"), col("doc_id"), lit(">")).as("record_id"),
          lit("text/plain").as("content_type"),
          encode(col("text"), "UTF-8").as("payload"))
          .repartition(4),
        out)
      s.read.format("graft.sources.WarcSource")
        .option("path", out).option("splitBytes", "16384").load()
        .select(
          regexp_extract(col("target_uri"), "doc/([0-9]+)$", 1)
            .cast("long").as("doc_id"),
          col("content_length"),
          length(decode(col("payload"), "UTF-8")).as("n_chars"))
        .groupBy((col("doc_id") % 7).as("bucket"))
        .agg(
          count(lit(1)).as("n_records"),
          sum(col("content_length")).as("sum_bytes"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("doc_id")).as("sum_doc"))
    }),


    // ---- north-star: ORC interchange — the second columnar format a
    //      lakehouse ingests from; write documents to ORC, read back
    //      through a pushdown-eligible filter, and the roundtrip must
    //      reproduce the source aggregates exactly.
    "q161_orc_roundtrip" -> ((s, dir) => {
      val out = tmp("q161_orc")
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      docs.select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
        .write.mode("overwrite").orc(out)
      s.read.orc(out)
        .filter(col("n_chars") >= 20)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("doc_id")).as("sum_ids"),
          countDistinct(col("source")).as("n_sources"))
    }),


    // ---- north-star: CSV interchange with hostile fields — embedded
    //      commas, RFC 4180 double-quote escaping, and a literal
    //      NEWLINE inside a quoted field (the multiLine trap that
    //      breaks naive line-split readers); every payload must
    //      round-trip byte-exactly (n_exact = n_rows).
    "q162_csv_roundtrip" -> ((s, dir) => {
      val out = tmp("q162_csv")
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val payload = concat(lit("pre,"), col("text"), lit(" \"q\" end"),
        lit("\nline2 "), col("doc_id"))
      docs.select(col("doc_id"), payload.as("payload"), col("lang"))
        .write.mode("overwrite")
        .option("header", "true").option("escape", "\"")
        .csv(out)
      val back = s.read
        .option("header", "true").option("multiLine", "true")
        .option("escape", "\"")
        .schema("doc_id LONG, payload STRING, lang STRING")
        .csv(out)
      back
        .join(docs.select(col("doc_id"),
          concat(lit("pre,"), col("text"), lit(" \"q\" end"),
            lit("\nline2 "), col("doc_id")).as("expected")), "doc_id")
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("payload") === col("expected"), 1L).otherwise(0L))
            .as("n_exact"),
          sum(length(col("payload"))).as("sum_chars"))
    }),


    // ---- north-star: BUCKETED co-located join — the 100 TB join
    //      pattern: both fact tables land bucketed (+ bucket-sorted)
    //      on the join key, so the sort-merge join consumes bucket
    //      files directly with ZERO shuffle of either side
    //      (BucketedJoinSpec pins the exchange-free plan); the `merge`
    //      hint keeps the demonstration honest at fixture scale, where
    //      AQE would otherwise broadcast the small side.
    "q165_bucketed_join" -> ((s, dir) => {
      val liPath = tmp("q165_li")
      val ordPath = tmp("q165_ord")
      s.sql("DROP TABLE IF EXISTS graft_li_bucketed")
      s.sql("DROP TABLE IF EXISTS graft_ord_bucketed")
      T(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", liPath).saveAsTable("graft_li_bucketed")
      T(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", ordPath).saveAsTable("graft_ord_bucketed")
      s.table("graft_li_bucketed").hint("merge")
        .join(s.table("graft_ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
        .agg(
          count(lit(1)).as("n_items"),
          countDistinct(col("o_orderkey")).as("n_orders"),
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          expr(dsum("l_extendedprice")).as("sum_price"))
    }),


    // ---- north-star: zone-map data-skipping stats — per-file min/max
    //      over a range-clustered layout (16 files on o_orderdate) for
    //      the clustered column AND an uncorrelated one; the pruned
    //      flags show a date predicate skipping most files while the
    //      price predicate skips none — the audit a clustering
    //      decision is made from. File ids are closed-form range bins
    //      (engine-replayable, unlike sampled range boundaries).
    "q208_zone_map" -> ((s, dir) => {
      val orders = T(s, dir, "orders")
      val withF = graft.io.ZoneMap.assignFiles(
        orders, col("o_orderdate").cast("timestamp"), nFiles = 16)
      val st = graft.io.ZoneMap.stats(
        withF, "file_id", Seq("o_orderdate", "o_totalprice"))
      val dLo = lit("1997-01-01 00:00:00").cast("timestamp")
      val dHi = lit("1997-03-31 00:00:00").cast("timestamp")
      st.select(col("file_id"), col("n_rows"),
        col("o_orderdate_mn"), col("o_orderdate_mx"),
        col("o_totalprice_mn"), col("o_totalprice_mx"),
        graft.io.ZoneMap.prunedFlag(
          col("o_orderdate_mn"), col("o_orderdate_mx"), dLo, dHi)
          .as("pruned_date"),
        graft.io.ZoneMap.prunedFlag(
          col("o_totalprice_mn"), col("o_totalprice_mx"),
          lit(100000.0), lit(150000.0)).as("pruned_price"))
    }),


    // ---- north-star: compaction plan — merge bins of ≈2000 rows over
    //      a 64-file range-clustered stats ledger, ordered by zone
    //      floor so compaction PRESERVES the clustering the zone maps
    //      exist for; the plan window runs over |files| rows, never
    //      data rows.
    "q230_compaction_plan" -> ((s, dir) => {
      val orders = T(s, dir, "orders")
      val withF = graft.io.ZoneMap.assignFiles(
        orders, col("o_orderdate").cast("timestamp"), nFiles = 64)
      val st = graft.io.ZoneMap.stats(withF, "file_id", Seq("o_orderdate"))
      graft.io.ZoneMap.compactionPlan(
        st, "o_orderdate_mn", "n_rows", targetRows = 2000L)
    }),


    // ---- north-star: time-travel reads of the versioned sink — every
    //      _SUCCESS-gated run is a pinned table version (q10 reads the
    //      latest; this reads ALL of them by index): the audit-replay
    //      primitive of the lakehouse pattern.
    "q232_time_travel" -> ((s, dir) => {
      val base = tmp("q232_runs")
      val cust = T(s, dir, "customer")
      Layers.writeJsonl(cust.filter(col("c_custkey") % 3 === 0),
        base, Some("20250101"))
      Layers.writeJsonl(cust.filter(col("c_custkey") % 2 === 0),
        base, Some("20250102"))
      Layers.writeJsonl(cust, base, Some("20250103"))
      val schema = graft.schema.Metadata.structFromSpec("c_custkey: long")
      Layers.successfulRuns(s, base).zipWithIndex.map { case (p, v) =>
        Layers.readJsonl(s, p, schema)
          .agg(count(lit(1)).as("n_rows"), sum(col("c_custkey")).as("sum_key"))
          .select(lit(v).as("version"), col("n_rows"), col("sum_key"))
      }.reduce(_ unionByName _)
    }),


    // ---- north-star: content-defined chunking block dedup (LBFS
    //      Rabin boundaries) — a shared license tail appended at
    //      DIFFERENT offsets per doc still yields identical chunks
    //      (boundaries are content-derived), so the report must show
    //      the shared bytes on every third doc; pure-Rabin form,
    //      oracle-exact.
    "q235_cdc_dedup" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val lic = (" license clause alpha beta gamma delta epsilon " +
        "zeta eta theta iota kappa applies to this corpus document ") * 4
      val page = when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(lic))).otherwise(col("text"))
      Dedup.cdcDedupReport(
        docs.select(col("doc_id"), page.as("page")),
        "page", "doc_id", k = 5, divisor = 64L)
    }),


    // ---- north-star: VACUUM planning for the versioned sink — gated
    //      runs beyond keepLast plan as expire, unmarked directories
    //      report as orphans (never auto-deleted: indistinguishable
    //      from a write in flight); joined with per-version counts so
    //      the plan is content-checkable.
    "q247_vacuum_plan" -> ((s, dir) => {
      val base = tmp("q247_runs")
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val cust = T(s, dir, "customer")
      Layers.writeJsonl(cust.filter(col("c_custkey") % 3 === 0),
        base, Some("20250101"))
      Layers.writeJsonl(cust.filter(col("c_custkey") % 2 === 0),
        base, Some("20250102"))
      Layers.writeJsonl(cust.filter(col("c_custkey") % 5 === 0),
        base, Some("20250103"))
      Layers.writeJsonl(cust, base, Some("20250104"))
      new java.io.File(s"$base/run_20250105_partial").mkdirs()
      val plan = Layers.vacuumPlan(s, base, keepLast = 2)
      val schema = graft.schema.Metadata.structFromSpec("c_custkey: long")
      val counts = Layers.successfulRuns(s, base).map { p =>
        val name = p.substring(p.lastIndexOf('/') + 1)
        Layers.readJsonl(s, p, schema)
          .agg(count(lit(1)).as("n_rows"))
          .select(lit(name).as("run_name"), col("n_rows"))
      }.reduce(_ unionByName _)
      plan.join(counts, Seq("run_name"), "left_outer")
        .select(col("run_name"), col("version"), col("status"),
          col("n_rows"))
    }),


    // ---- north-star: zone-map skip-rate report — clustered-on-the-
    //      predicate-column layout vs orderkey (insertion-order) layout
    //      for a 3-predicate workload: the measured CLUSTER BY decision.
    "q249_skip_rate" -> ((s, dir) =>
      graft.io.ZoneMap.skipRateReport(
        T(s, dir, "orders"),
        layoutA = col("o_totalprice"), layoutB = col("o_orderkey"),
        valueCol = "o_totalprice", nFiles = 32,
        predicates = Seq((1000.0, 50000.0), (100000.0, 200000.0),
          (400000.0, 500000.0)))),


    // ---- north-star: doc-granular search-index upsert — the stale
    //      index (every 10th doc carries outdated text) takes the
    //      re-crawled batch via tombstone + append, and phrase search
    //      over the MERGED index must answer as if rebuilt fresh.
    "q261_index_upsert" -> ((s, dir) => {
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
      val stale = docs.withColumn("text",
        when(col("doc_id") % 10 === 0,
          concat(lit("stale page marker "), col("text")))
          .otherwise(col("text")))
      val stored = graft.ops.Search.invertedIndex(stale, "text", "doc_id")
      val merged = graft.ops.Search.upsertIndex(stored,
        docs.filter(col("doc_id") % 10 === 0), "text", "doc_id")
      graft.ops.Search.phraseSearch(merged, Seq("spark", "window"))
    }),


    // ---- north-star: merge-on-read index lifecycle end-to-end — two
    //      landed waves (the second re-crawls every 10th doc), then
    //      COMPACTION folds live postings into one generation and
    //      prunes the dead ones; phrase answers must match current
    //      text throughout.
    "q267_index_compaction" -> ((s, dir) => {
      val base = tmp("q267_idx")
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val docs = T(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), col("text"))
      val stale = docs.withColumn("text",
        when(col("doc_id") % 10 === 0,
          concat(lit("stale page marker "), col("text")))
          .otherwise(col("text")))
      val schema = graft.schema.Metadata.structFromSpec(
        "doc_id: long\ntext: string")
      def drain() = graft.streaming.SearchIngest.maintainIndex(
        s, s"$base/landing/run_*", schema, "doc_id", "text",
        silverDir = s"$base/silver", checkpointDir = s"$base/ckpt",
        indexDir = s"$base/index", buckets = 8)
      Layers.writeJsonl(stale, s"$base/landing", Some("w1"))
      drain()
      Layers.writeJsonl(docs.filter(col("doc_id") % 10 === 0),
        s"$base/landing", Some("w2"))
      drain()
      val pruned = graft.streaming.SearchIngest.compactIndex(
        s, s"$base/index")
      val live = graft.streaming.SearchIngest.readIndex(s, s"$base/index")
      graft.ops.Search.phraseSearch(live, Seq("spark", "window"))
        .withColumn("n_pruned_generations", lit(pruned))
    })
  )

  protected def ioOracles: Map[String, String] = Map(
    "q01_silver_clean" ->
      s"""WITH base AS (SELECT $custSchemaCols FROM customer),
         |inj AS (
         |  SELECT * FROM base
         |  UNION ALL SELECT c_custkey, concat(' ', c_name, '  '), c_mktsegment, c_acctbal FROM base WHERE c_custkey % 20 = 0
         |  UNION ALL SELECT c_custkey, NULL, c_mktsegment, c_acctbal FROM base WHERE c_custkey % 20 = 7
         |), d AS (
         |  SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY c_name ASC NULLS FIRST) AS rn FROM inj
         |)
         |SELECT c_custkey, trim(lower(c_name)) AS c_name, trim(lower(c_mktsegment)) AS c_mktsegment, c_acctbal
         |FROM d WHERE rn = 1 AND c_name IS NOT NULL""".stripMargin,


    "q02_gold_union3" ->
      s"""SELECT o_orderstatus, NULL AS o_orderpriority, count(*) AS total_orders, 'by_status' AS aggregation, '2025-10-15' AS transformation_date FROM orders GROUP BY o_orderstatus
         |UNION ALL
         |SELECT o_orderstatus, o_orderpriority, count(*) AS total_orders, 'by_priority_status' AS aggregation, '2025-10-15' AS transformation_date FROM orders GROUP BY o_orderstatus, o_orderpriority
         |UNION ALL
         |SELECT o_orderstatus, o_orderpriority, count(*) AS total_orders, 'by_status_priority' AS aggregation, '2025-10-15' AS transformation_date FROM orders GROUP BY o_orderstatus, o_orderpriority""".stripMargin,


    "q03_grouping_sets" ->
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS total_orders,
         |  ${dsum("o_totalprice")} AS sum_price,
         |  CASE concat(CAST(GROUPING(o_orderstatus) AS VARCHAR), CAST(GROUPING(o_orderpriority) AS VARCHAR))
         |    WHEN '01' THEN 'g_status' WHEN '00' THEN 'g_priority_status' END AS aggregation,
         |  '2025-10-15' AS transformation_date
         |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderstatus, o_orderpriority))""".stripMargin,


    "q04_quality_report" ->
      s"""WITH w AS (SELECT
         |  CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS non_null_returnflag,
         |  CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS positive_quantity,
         |  CAST(sum(CASE WHEN NOT coalesce(l_discount >= 0 AND l_discount <= 0.1, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS discount_range
         | FROM lineitem)
         |SELECT 'non_null_returnflag' AS rule, non_null_returnflag AS invalid_count, non_null_returnflag = 0 AS passed FROM w
         |UNION ALL SELECT 'positive_quantity', positive_quantity, positive_quantity = 0 FROM w
         |UNION ALL SELECT 'discount_range', discount_range, discount_range = 0 FROM w""".stripMargin,


    "q05_agg_dsl" ->
      s"""SELECT l_returnflag, l_linestatus, count(*) AS count_order,
         |  ${dsum("l_quantity")} AS sum_qty,
         |  ${dsum("l_extendedprice")} AS sum_base_price,
         |  cast(sum(cast(l_extendedprice as decimal(18,2)) * (1 - cast(l_discount as decimal(4,2)))) as double) AS sum_disc_price,
         |  ${dsum("l_quantity")} / count(*) AS avg_qty,
         |  'q1' AS aggregation
         |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,


    "q06_dedup_exact" -> "SELECT DISTINCT lang, source FROM documents",


    "q07_ingest_stamp" ->
      "SELECT c_custkey, c_name, c_mktsegment, DATE '2025-10-15' AS ingestion_date FROM customer",


    "q08_jsonl_roundtrip" ->
      s"""SELECT c_mktsegment, count(*) AS n_customers, ${dsum("c_acctbal")} AS sum_acctbal
         |FROM customer GROUP BY c_mktsegment""".stripMargin,


    "q09_partition_roundtrip" ->
      s"""SELECT c_mktsegment, count(*) AS n_customers, ${dsum("c_acctbal")} AS sum_acctbal
         |FROM customer GROUP BY c_mktsegment""".stripMargin,


    "q10_latest_run" ->
      "SELECT count(*) AS n_rows, CAST(sum(c_custkey) AS BIGINT) AS sum_key FROM customer",


    "q26_pipeline_gold" ->
      s"""WITH silver AS (
         |  SELECT c_custkey, trim(lower(c_name)) AS c_name, c_nationkey, c_acctbal,
         |         trim(lower(c_mktsegment)) AS c_mktsegment
         |  FROM customer
         |)
         |SELECT c_mktsegment, CAST(NULL AS INTEGER) AS c_nationkey,
         |  count(*) AS total_customers, ${dsum("c_acctbal")} AS sum_acctbal,
         |  'by_segment' AS aggregation, '2025-10-15' AS transformation_date
         |FROM silver GROUP BY c_mktsegment
         |UNION ALL
         |SELECT c_mktsegment, c_nationkey, count(*), ${dsum("c_acctbal")},
         |  'by_segment_nation', '2025-10-15'
         |FROM silver GROUP BY c_mktsegment, c_nationkey""".stripMargin,


    "q27_jsonl_inferred" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        |  CAST(sum(c_custkey) AS BIGINT) AS sum_key
        |FROM customer GROUP BY c_mktsegment""".stripMargin,


    "q28_paged_source" ->
      """SELECT CAST(ceil(count(*) / 100.0) AS BIGINT) AS n_pages,
        |  count(*) AS n_rows, CAST(sum(c_custkey) AS BIGINT) AS sum_key
        |FROM customer""".stripMargin,


    "q62_corpus_filter_dsl" ->
      graft.ops.CorpusFilters.oracleSql(
        graft.config.PipelineConfig.parseCorpusFilters(corpusFilterYaml),
        "documents", "text", "doc_id"),


    // zone-map replay: identical closed-form range binning (multiply
    // before divide, clamp), min/max stats, overlap flags
    "q208_zone_map" ->
      """WITH b AS (SELECT min(epoch(o_orderdate)) AS lo,
        |                  max(epoch(o_orderdate)) AS hi FROM orders),
        |f AS (SELECT o.*,
        |    CASE WHEN b.hi = b.lo THEN 0
        |         ELSE least(15, greatest(0, CAST(floor(
        |           (epoch(o_orderdate) - b.lo) * 16 / (b.hi - b.lo))
        |           AS INT))) END AS file_id
        |  FROM orders o, b),
        |st AS (SELECT file_id, count(*) AS n_rows,
        |    min(o_orderdate) AS o_orderdate_mn,
        |    max(o_orderdate) AS o_orderdate_mx,
        |    min(o_totalprice) AS o_totalprice_mn,
        |    max(o_totalprice) AS o_totalprice_mx
        |  FROM f GROUP BY file_id)
        |SELECT file_id, n_rows, o_orderdate_mn, o_orderdate_mx,
        |  o_totalprice_mn, o_totalprice_mx,
        |  NOT (o_orderdate_mx >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND o_orderdate_mn <= TIMESTAMP '1997-03-31 00:00:00')
        |    AS pruned_date,
        |  NOT (o_totalprice_mx >= 100000.0 AND o_totalprice_mn <= 150000.0)
        |    AS pruned_price
        |FROM st""".stripMargin,


    // compaction-plan replay: the q208 binning at 64 files, running-sum
    // bins at 2000 target rows
    "q230_compaction_plan" ->
      """WITH b AS (SELECT min(epoch(o_orderdate)) AS lo,
        |                  max(epoch(o_orderdate)) AS hi FROM orders),
        |f AS (SELECT o.*,
        |    CASE WHEN b.hi = b.lo THEN 0
        |         ELSE least(63, greatest(0, CAST(floor(
        |           (epoch(o_orderdate) - b.lo) * 64 / (b.hi - b.lo))
        |           AS INT))) END AS file_id
        |  FROM orders o, b),
        |st AS (SELECT file_id, count(*) AS n_rows,
        |    min(o_orderdate) AS mn FROM f GROUP BY file_id),
        |w AS (SELECT *,
        |    sum(n_rows) OVER (ORDER BY mn, n_rows
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM st)
        |SELECT CAST(floor((cum - n_rows) / 2000) AS BIGINT) AS bin,
        |  count(*) AS n_files, CAST(sum(n_rows) AS BIGINT) AS total_rows
        |FROM w GROUP BY 1""".stripMargin,


    // time-travel replay: each version's filter re-derived
    "q232_time_travel" ->
      """SELECT 0 AS version, count(*) AS n_rows,
        |  CAST(sum(c_custkey) AS BIGINT) AS sum_key
        |FROM customer WHERE c_custkey % 3 = 0
        |UNION ALL
        |SELECT 1, count(*), CAST(sum(c_custkey) AS BIGINT)
        |FROM customer WHERE c_custkey % 2 = 0
        |UNION ALL
        |SELECT 2, count(*), CAST(sum(c_custkey) AS BIGINT)
        |FROM customer""".stripMargin,


    // CDC replay: q49's polynomial hash terms at k=5, cut positions
    // i+4 where h%64=0, bounds-window chunks, md5 identity, spread>=2
    "q235_cdc_dedup" -> {
      val k = 5
      val terms = (0 until k).map { j =>
        val pow = BigInt(257).pow(k - 1 - j).toLong
        s"ascii(substr(page, __i + $j, 1)) * $pow"
      }.mkString("(", " + ", ")")
      val lic = (" license clause alpha beta gamma delta epsilon " +
        "zeta eta theta iota kappa applies to this corpus document ") * 4
      s"""WITH pages AS (SELECT doc_id,
         |    CASE WHEN doc_id % 3 = 0 THEN text || '$lic'
         |         ELSE text END AS page
         |  FROM documents WHERE text IS NOT NULL),
         |hs AS (SELECT doc_id, page,
         |    CASE WHEN length(page) >= $k THEN list_transform(
         |      generate_series(1, length(page) - ${k - 1}),
         |      __i -> $terms % 1000003) ELSE [] END AS h
         |  FROM pages),
         |cuts AS (SELECT doc_id, page,
         |    list_sort(list_distinct(
         |      [CAST(0 AS BIGINT)] ||
         |      list_transform(
         |        list_filter(generate_series(1, len(h)),
         |          __i -> h[CAST(__i AS INT)] % 64 = 0),
         |        __i -> __i + ${k - 1}) ||
         |      [CAST(length(page) AS BIGINT)])) AS b
         |  FROM hs),
         |chunks AS (SELECT doc_id, page,
         |    b[CAST(gi AS INT)] + 1 AS s,
         |    b[CAST(gi AS INT) + 1] - b[CAST(gi AS INT)] AS l
         |  FROM cuts, unnest(generate_series(1, len(b) - 1)) AS u(gi)
         |  WHERE len(b) >= 2),
         |ch AS (SELECT doc_id,
         |    md5(substr(page, CAST(s AS INT), CAST(l AS INT))) AS h2,
         |    l FROM chunks),
         |spread AS (SELECT h2 FROM ch GROUP BY h2
         |           HAVING count(DISTINCT doc_id) >= 2),
         |tot AS (SELECT doc_id, count(*) AS n_chunks,
         |    CAST(sum(l) AS BIGINT) AS total_bytes FROM ch GROUP BY doc_id),
         |shr AS (SELECT doc_id, count(*) AS n_shared_chunks,
         |    CAST(sum(l) AS BIGINT) AS shared_bytes
         |  FROM ch WHERE h2 IN (SELECT h2 FROM spread) GROUP BY doc_id)
         |SELECT t.doc_id, t.n_chunks,
         |  coalesce(s.n_shared_chunks, 0) AS n_shared_chunks,
         |  coalesce(s.shared_bytes, 0) AS shared_bytes,
         |  t.total_bytes,
         |  round(CAST(coalesce(s.shared_bytes, 0) AS DOUBLE)
         |    / t.total_bytes, 6) AS dup_ratio
         |FROM tot t LEFT JOIN shr s ON s.doc_id = t.doc_id""".stripMargin
    },


    // vacuum replay: pinned run ids make names deterministic; content
    // counts re-derive from the version filters; the orphan reports
    // with NULL version/rows
    "q247_vacuum_plan" ->
      """SELECT 'run_20250101' AS run_name, CAST(0 AS BIGINT) AS version,
        |  'expire' AS status,
        |  (SELECT count(*) FROM customer WHERE c_custkey % 3 = 0) AS n_rows
        |UNION ALL
        |SELECT 'run_20250102', CAST(1 AS BIGINT), 'expire',
        |  (SELECT count(*) FROM customer WHERE c_custkey % 2 = 0)
        |UNION ALL
        |SELECT 'run_20250103', CAST(2 AS BIGINT), 'keep',
        |  (SELECT count(*) FROM customer WHERE c_custkey % 5 = 0)
        |UNION ALL
        |SELECT 'run_20250104', CAST(3 AS BIGINT), 'keep',
        |  (SELECT count(*) FROM customer)
        |UNION ALL
        |SELECT 'run_20250105_partial', CAST(NULL AS BIGINT), 'orphan',
        |  CAST(NULL AS BIGINT)""".stripMargin,


    // skip-rate replay: the q208 range-bin file assignment per layout,
    // per-file min/max zones, overlap counting per predicate
    "q249_skip_rate" -> {
      def layout(cluster: String, tag: String) =
        s"""b_$tag AS (SELECT min(CAST($cluster AS DOUBLE)) AS lo,
           |    max(CAST($cluster AS DOUBLE)) AS hi FROM orders),
           |f_$tag AS (SELECT CASE WHEN b.hi = b.lo THEN 0
           |    ELSE least(31, greatest(0,
           |      CAST(floor((CAST($cluster AS DOUBLE) - b.lo) * 32
           |        / (b.hi - b.lo)) AS INT))) END AS file_id,
           |    o_totalprice AS v
           |  FROM orders, b_$tag b),
           |s_$tag AS (SELECT file_id, min(v) AS mn, max(v) AS mx
           |  FROM f_$tag GROUP BY file_id),
           |o_$tag AS (SELECT pred_lo, pred_hi, count(*) AS ft,
           |    CAST(sum(CASE WHEN mx >= pred_lo AND mn <= pred_hi
           |      THEN 1 ELSE 0 END) AS BIGINT) AS opened
           |  FROM s_$tag CROSS JOIN preds GROUP BY 1, 2)""".stripMargin
      s"""WITH preds AS (SELECT CAST(pl AS DOUBLE) AS pred_lo,
         |    CAST(ph AS DOUBLE) AS pred_hi
         |  FROM (VALUES (1000.0, 50000.0), (100000.0, 200000.0),
         |    (400000.0, 500000.0)) AS t(pl, ph)),
         |${layout("o_totalprice", "a")},
         |${layout("o_orderkey", "b")}
         |SELECT a.pred_lo, a.pred_hi, a.ft AS files_a,
         |  a.opened AS open_a,
         |  round(CAST(a.ft - a.opened AS DOUBLE) / a.ft, 6) AS skip_rate_a,
         |  b.ft AS files_b, b.opened AS open_b,
         |  round(CAST(b.ft - b.opened AS DOUBLE) / b.ft, 6) AS skip_rate_b
         |FROM o_a a JOIN o_b b
         |  ON b.pred_lo = a.pred_lo AND b.pred_hi = a.pred_hi""".stripMargin
    },


    // index-upsert replay: the merged index must answer phrase queries
    // as if rebuilt over CURRENT text — q152's positional replay,
    // per-doc rows
    "q261_index_upsert" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |m AS (
        |  SELECT doc_id,
        |    len(list_filter(range(1, len(toks)),
        |      i -> toks[i] = 'spark' AND toks[i+1] = 'window')) AS occ,
        |    list_min(list_filter(range(1, len(toks)),
        |      i -> toks[i] = 'spark' AND toks[i+1] = 'window')) AS first1
        |  FROM tk)
        |SELECT doc_id, CAST(occ AS BIGINT) AS n_occurrences,
        |  CAST(first1 - 1 AS INT) AS first_pos
        |FROM m WHERE occ > 0""".stripMargin,


    // compaction replay: after the second wave the live index IS the
    // current corpus, and exactly two dead generations (0 and 1) fall
    // to the compactor — the phrase rows are q261's replay
    "q267_index_compaction" ->
      """WITH tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |m AS (
        |  SELECT doc_id,
        |    len(list_filter(range(1, len(toks)),
        |      i -> toks[i] = 'spark' AND toks[i+1] = 'window')) AS occ,
        |    list_min(list_filter(range(1, len(toks)),
        |      i -> toks[i] = 'spark' AND toks[i+1] = 'window')) AS first1
        |  FROM tk)
        |SELECT doc_id, CAST(occ AS BIGINT) AS n_occurrences,
        |  CAST(first1 - 1 AS INT) AS first_pos,
        |  2 AS n_pruned_generations
        |FROM m WHERE occ > 0""".stripMargin,


    "q48_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY o_orderpriority""".stripMargin,


    "q45_model_score" ->
      """SELECT doc_id,
        |  CAST((length(text) * 2654435761) % 1000003 AS DOUBLE) / 1000003.0 AS score
        |FROM documents""".stripMargin,


    "q57_range_clustered" ->
      s"""SELECT count(*) AS n_orders, ${dsum("o_totalprice")} AS sum_price
         |FROM orders
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin,


    // compaction is pure layout: the answers come straight from the
    // source table (the q121 invariant for the file-count dimension)
    "q129_compaction" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang""".stripMargin,


    // WARC replay: the archive is rendered FROM documents, so a
    // lossless roundtrip must reproduce the table's own per-bucket
    // byte/char/key sums (strlen = UTF-8 bytes = Content-Length)
    "q139_warc_source" ->
      """SELECT doc_id % 7 AS bucket, count(*) AS n_records,
        |  CAST(sum(strlen(text)) AS BIGINT) AS sum_bytes,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_chars,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_doc
        |FROM documents WHERE text IS NOT NULL GROUP BY 1""".stripMargin,


    // ORC replay: lossless roundtrip ⇒ the filtered aggregates equal
    // the source table's
    "q161_orc_roundtrip" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
        |  count(DISTINCT source) AS n_sources
        |FROM documents WHERE text IS NOT NULL AND n_chars >= 20
        |GROUP BY lang""".stripMargin,


    // CSV replay: payload = 'pre,' + text + ' "q" end' + newline +
    // 'line2 ' + id ⇒ length = len(text) + 19 + digits(id); exactness
    // asserted by n_exact = n_rows
    "q162_csv_roundtrip" ->
      """SELECT lang, count(*) AS n_rows, count(*) AS n_exact,
        |  CAST(sum(length(text) + 19 + length(CAST(doc_id AS VARCHAR))) AS BIGINT)
        |    AS sum_chars
        |FROM documents WHERE text IS NOT NULL GROUP BY lang""".stripMargin,


    // bucketed-join replay: bucketing changes the PLAN, not the
    // answer — plain join + rollup
    "q165_bucketed_join" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, count(*) AS n_items,
        |  count(DISTINCT o_orderkey) AS n_orders,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  cast(sum(cast(l_extendedprice as decimal(18,6))) as double) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,


    // CDC replay: latest change per key via row_number over ts desc
    // ((key, ts) unique by construction), delete removes, I/U replaces,
    // untouched state passes through the anti-join
    "q137_cdc_apply" ->
      """WITH cd_c AS (
        |  SELECT c_custkey, 10 AS ts, 'U' AS op,
        |    c_mktsegment || '_U' AS seg, c_acctbal + 100.0 AS bal
        |  FROM customer WHERE c_custkey % 5 = 0
        |  UNION ALL
        |  SELECT c_custkey, 20, 'D', NULL, NULL
        |  FROM customer WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  SELECT c_custkey, 5, 'U', 'LATE', 0.0
        |  FROM customer WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 10, 'I', 'NEW_SEG', 1.5
        |  FROM customer WHERE c_custkey % 25 = 0),
        |cd_w AS (SELECT * FROM (
        |  SELECT c_custkey, op, seg, bal,
        |    row_number() OVER (PARTITION BY c_custkey ORDER BY ts DESC) AS rn
        |  FROM cd_c) WHERE rn = 1),
        |cd_f AS (
        |  SELECT c.c_custkey, c.c_mktsegment AS seg, c.c_acctbal AS bal
        |  FROM customer c LEFT JOIN cd_w w ON c.c_custkey = w.c_custkey
        |  WHERE w.c_custkey IS NULL
        |  UNION ALL
        |  SELECT c_custkey, seg, bal FROM cd_w WHERE op <> 'D')
        |SELECT seg AS c_mktsegment, count(*) AS n_rows,
        |  CAST(sum(c_custkey) AS BIGINT) AS sum_keys,
        |  cast(sum(cast(bal as decimal(18,6))) as double) AS sum_bal
        |FROM cd_f GROUP BY seg""".stripMargin,


    "q130_schema_drift" ->
      """WITH v1 AS (
        |  SELECT CAST(doc_id AS INTEGER) AS doc_id, lang,
        |         CAST(n_chars / 100.0 AS REAL) AS q
        |  FROM documents WHERE doc_id % 2 = 0),
        |v2 AS (
        |  SELECT doc_id, lang, CAST(n_chars / 100.0 AS DOUBLE) AS q, n_chars
        |  FROM documents WHERE doc_id % 2 = 1),
        |u AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
        |         CAST(q AS DOUBLE) AS q, CAST(NULL AS BIGINT) AS n_chars
        |  FROM v1
        |  UNION ALL
        |  SELECT doc_id, lang, q, n_chars FROM v2)
        |SELECT lang, count(*) AS n_rows,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_id,
        |  CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_chars_missing,
        |  max(q) AS max_q
        |FROM u GROUP BY lang""".stripMargin,


    // Morton-key replay: same integer bucketing (bit-exact // div)
    // and the same bit-interleave positions (col i bit j → j·k + i)
    "q120_zvalues" -> {
      val bits = 8
      val terms = (0 until bits).flatMap(j => Seq(
        s"(((bk1 >> $j) & 1) << ${2 * j})",
        s"(((bk2 >> $j) & 1) << ${2 * j + 1})"))
      s"""WITH b AS (SELECT CAST(min(l_orderkey) AS BIGINT) AS mn1,
         |                  CAST(max(l_orderkey) AS BIGINT) AS mx1,
         |                  CAST(min(l_partkey) AS BIGINT) AS mn2,
         |                  CAST(max(l_partkey) AS BIGINT) AS mx2 FROM lineitem),
         |k AS (SELECT l_orderkey, l_partkey,
         |        ((CAST(l_orderkey AS BIGINT) - b.mn1) * 256) // (b.mx1 - b.mn1 + 1) AS bk1,
         |        ((CAST(l_partkey AS BIGINT) - b.mn2) * 256) // (b.mx2 - b.mn2 + 1) AS bk2
         |      FROM lineitem, b WHERE l_orderkey <= 400)
         |SELECT l_orderkey, l_partkey,
         |  CAST(${terms.mkString(" | ")} AS BIGINT) AS zval
         |FROM k""".stripMargin
    },


    // z-ordering is pure layout: the box filter answers come straight
    // from the source table
    "q121_zorder_roundtrip" ->
      s"""SELECT count(*) AS n_rows,
         |  CAST(sum(l_orderkey) AS BIGINT) AS sum_ok,
         |  CAST(sum(l_partkey) AS BIGINT) AS sum_pk,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
         |FROM lineitem
         |WHERE l_orderkey BETWEEN 3000 AND 6000
         |  AND l_partkey BETWEEN 500 AND 900""".stripMargin,


    // SCD2 replay: candidate sequencing (open row first on ties),
    // null-safe no-op suppression, lead() closing, anti-join
    // pass-through of untouched keys
    "q122_scd2_merge" ->
      s"""WITH s0 AS (SELECT c_custkey AS k, c_mktsegment AS seg,
         |             CAST(0 AS BIGINT) AS vf FROM customer),
         |u AS (SELECT c_custkey AS k, c_mktsegment || '_U' AS seg,
         |        CAST(10 AS BIGINT) AS vf FROM customer WHERE c_custkey % 5 = 0
         |      UNION ALL
         |      SELECT c_custkey, c_mktsegment || '_U', 20
         |      FROM customer WHERE c_custkey % 10 = 0
         |      UNION ALL
         |      SELECT c_custkey + 100000, 'NEW_SEG', 10
         |      FROM customer WHERE c_custkey % 25 = 0),
         |uk AS (SELECT DISTINCT k FROM u),
         |cand AS (SELECT s0.k, s0.seg, s0.vf, 0 AS src FROM s0 JOIN uk USING (k)
         |         UNION ALL SELECT k, seg, vf, 1 FROM u),
         |seq AS (SELECT *, lag(seg) OVER (PARTITION BY k ORDER BY vf, src) AS prev
         |        FROM cand),
         |kept AS (SELECT k, seg, vf, src FROM seq
         |         WHERE prev IS NULL OR seg IS DISTINCT FROM prev),
         |ver AS (SELECT k, seg, vf,
         |          lead(vf) OVER (PARTITION BY k ORDER BY vf, src) AS vt
         |        FROM kept)
         |SELECT k AS c_custkey, seg AS c_mktsegment, vf AS valid_from,
         |  vt AS valid_to, vt IS NULL AS is_current
         |FROM ver
         |UNION ALL
         |SELECT s0.k, s0.seg, s0.vf, CAST(NULL AS BIGINT), TRUE
         |FROM s0 ANTI JOIN uk USING (k)""".stripMargin
  )
}
