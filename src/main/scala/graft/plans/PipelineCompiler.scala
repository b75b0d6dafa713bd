package graft.plans

import graft.operators.Transforms
import graft.sources.{Sources, Sinks, WarehouseSinks}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, expr, greatest, lit, octet_length, regexp_replace, round}

/** Operator registry + spec→DataFrame compiler — the Spark-native
  * counterpart of the reference's config registry and task wiring
  * (mycelial `config_registry/src/lib.rs:26-39`,
  * `myceliald/src/scheduler.rs:189-324`).
  *
  * Where the reference spawns one tokio task per section connected by
  * depth-1 channels, we compile the whole chain into ONE declarative
  * DataFrame: Catalyst then fuses the narrow transforms into a single
  * whole-stage-codegen pass and handles pushdown/pruning — strictly better
  * than per-section channel hops at any scale, and the only design that
  * survives 1000 executors.
  */
object SectionRegistry {
  import SectionIO._

  type Compile = (SparkSession, Map[String, String], Option[DataFrame]) => Option[DataFrame]

  final case class Entry(io: SectionIOSpec, compile: Compile)

  private def cfg(c: Map[String, String], k: String): String =
    c.getOrElse(k, throw new IllegalArgumentException(s"missing config key '$k'"))

  private def in(df: Option[DataFrame]): DataFrame =
    df.getOrElse(throw new IllegalArgumentException("section requires an input"))

  /** `train_max_vectors` — the quantizer-training sample cap every
    * trained-ANN section forwards (see
    * [[graft.operators.Ann.DefaultMaxTrainVectors]]); 0 disables. */
  /** `train_max_docs` — bounded-sample cap for the BPE trainer
    * ([[graft.operators.Corpus.bpeTrain]]'s `maxTrainDocs`): merge
    * statistics learned from a seeded deterministic sample of at most
    * this many documents; 0 (the default) trains on everything. */
  private def trainDocsCap(c: Map[String, String]): Long =
    c.getOrElse("train_max_docs", "0").toLong

  private def trainCap(c: Map[String, String]): Int =
    c.getOrElse("train_max_vectors",
      graft.operators.Ann.DefaultMaxTrainVectors.toString).toInt

  /** `train_max_bytes` — the byte budget bounding what the trainers
    * collect to the driver ([[graft.operators.Ann.DefaultMaxTrainBytes]],
    * 64 MB); 0 disables. */
  private def trainBytes(c: Map[String, String]): Long =
    c.getOrElse("train_max_bytes",
      graft.operators.Ann.DefaultMaxTrainBytes.toString).toLong

  /** Registered sections. Source/transform/destination names follow the
    * reference registry (`config_registry/src/lib.rs:26-39`). */
  val entries: Map[String, Entry] = Map(
    // ---- sources (SURVEY §2.1) ----
    "parquet_source" -> Entry(SectionIOSpec(None, DataFrameIO),
      (s, c, _) => Some(Sources.parquet(s, cfg(c, "path"), c.get("origin")))),
    "dir_source" -> Entry(SectionIOSpec(None, DataFrameIO),
      (s, c, _) => Some(Sources.dir(s, cfg(c, "path"),
        c.getOrElse("pattern", ".*"), c.getOrElse("stream_binary", "false").toBoolean,
        c.getOrElse("start_after", "")))),
    "file_source" -> Entry(SectionIOSpec(None, Bin),
      (s, c, _) => Some(Sources.fileBinary(s, cfg(c, "path")))),
    "csv_source" -> Entry(SectionIOSpec(None, DataFrameIO),
      (s, c, _) => Some(Sources.csv(s, cfg(c, "path"), c.get("origin")))),
    "excel_source" -> Entry(SectionIOSpec(None, DataFrameIO),
      (s, c, _) => Some(graft.sources.ExcelSource.read(s, cfg(c, "path"),
        c.getOrElse("sheet", "*"),
        c.getOrElse("stringify", "true").toBoolean))),
    "sqlite_source" -> Entry(SectionIOSpec(None, DataFrameIO),
      (s, c, _) => Some(Sources.jdbc(s, cfg(c, "url"), cfg(c, "query"), c.get("origin")))),
    "sqlite_file_source" -> Entry(SectionIOSpec(None, DataFrameIO),
      (s, c, _) => Some(graft.sources.SqliteFile.read(s, cfg(c, "path"),
        cfg(c, "table"), c.getOrElse("stringify", "true").toBoolean))),
    // SQLite PHYSICAL replication (S10): changed-page snapshot rows from
    // the live db+WAL; a FULL snapshot on first run (the incremental
    // cursor rides SqliteReplication.tick via the stateful runner —
    // this stateless form emits the diff against empty state)
    "sqlite_replication_source" -> Entry(SectionIOSpec(None, DataFrameIO),
      (s, c, _) => Some(graft.sources.SqliteReplication.snapshotFrame(
        s, cfg(c, "path"), Map.empty))),
    "postgres_source" -> Entry(SectionIOSpec(None, DataFrameIO),
      (s, c, _) => Some(Sources.jdbc(s, cfg(c, "url"), cfg(c, "query"), c.get("origin")))),
    "mysql_source" -> Entry(SectionIOSpec(None, DataFrameIO),
      (s, c, _) => Some(Sources.jdbc(s, cfg(c, "url"), cfg(c, "query"), c.get("origin")))),
    "kafka_source" -> Entry(SectionIOSpec(None, BinOrDataFrame),
      (s, c, _) => Some(Sources.kafka(s, cfg(c, "brokers"), cfg(c, "topic")))),
    "sql_source" -> Entry(SectionIOSpec(None, DataFrameIO),
      (s, c, _) => Some(s.sql(cfg(c, "query")))),
    // ORC rides Spark's native reader: same pushdown/pruning guarantees as
    // parquet (PushedFilters/ReadSchema reach the OrcScan)
    "orc_source" -> Entry(SectionIOSpec(None, DataFrameIO),
      (s, c, _) => Some {
        val df = s.read.orc(cfg(c, "path"))
        c.get("origin").fold(df)(o => df.withColumn("origin", lit(o)))
      }),
    // Arrow IPC shards — the reference's inter-daemon wire format
    // (formats/arrow_msg) as an operator-facing source/sink
    "arrow_source" -> Entry(SectionIOSpec(None, DataFrameIO),
      (s, c, _) => Some {
        val df = graft.sources.ArrowInterchange.readArrow(s, cfg(c, "path"))
        c.get("origin").fold(df)(o => df.withColumn("origin", lit(o)))
      }),
    "json_source" -> Entry(SectionIOSpec(None, DataFrameIO),
      (s, c, _) => Some {
        val df = s.read.option("multiLine", c.getOrElse("multiline", "false"))
          .json(cfg(c, "path"))
        c.get("origin").fold(df)(o => df.withColumn("origin", lit(o)))
      }),
    // Streaming file source (SURVEY §7.2 step 7: same specs, streaming
    // mode): schema probed from a batch read of the same location, files
    // tracked in the checkpoint, rate-limited by maxFilesPerTrigger.
    // Narrow transforms downstream work unchanged on the streaming frame.
    // Schema drift between runs (SURVEY §7.4.2 — the reference restarts
    // the task on per-chunk schema change): the probed schema is recorded
    // next to the checkpoint and compared on every compile. On drift,
    // `on_schema_drift: widen` (default) restarts the query with the
    // merged schema — old files are not replayed (checkpoint keeps file
    // offsets), new files carry the wider shape; `fail` raises instead.
    "stream_parquet_source" -> Entry(SectionIOSpec(None, DataFrameIO),
      (s, c, _) => Some {
        val dir = cfg(c, "path")
        // drift detection needs a record location ON THE SOURCE section
        // ("schema_record", typically the sink's checkpoint dir) — an
        // explicit policy without one would be silently inert, so reject it
        val recordPath = c.get("schema_record").orElse(c.get("checkpoint"))
        if (c.contains("on_schema_drift") && recordPath.isEmpty)
          throw new IllegalArgumentException(
            "stream_parquet_source: on_schema_drift is set but there is no " +
            "schema_record location to compare against — add \"schema_record\"")
        // the probe must see exactly the files the STREAM will read — same
        // glob — or a multi-table directory merges unrelated schemas
        var probeRdr = s.read.option("mergeSchema", "true")
        c.get("glob").foreach(g => probeRdr = probeRdr.option("pathGlobFilter", g))
        val schema = SchemaDrift.resolve(s,
          probe = probeRdr.format("parquet").load(dir).schema,
          recordPath = recordPath,
          policy = c.getOrElse("on_schema_drift", "widen"))
        var rdr = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", c.getOrElse("max_files_per_trigger", "16"))
        c.get("glob").foreach(g => rdr = rdr.option("pathGlobFilter", g))
        rdr.parquet(dir)
      }),

    // ---- transforms (SURVEY §2.2) ----
    "typecast" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(Transforms.typecast(
        c.getOrElse("column", "*"), cfg(c, "target"))(in(df)))),
    "tagging" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(Transforms.tagging(cfg(c, "column"), cfg(c, "text"))(in(df)))),
    "origin_regex" -> Entry(SectionIOSpec(BinOrDataFrame, BinOrDataFrame),
      (_, c, df) => Some(Transforms.originRegex(
        cfg(c, "pattern"), cfg(c, "replacement"))(in(df)))),
    "origin_time_nanos" -> Entry(SectionIOSpec(BinOrDataFrame, BinOrDataFrame),
      (_, c, df) => Some(Transforms.originTimeNanos(cfg(c, "pattern"))(in(df)))),
    "from_csv" -> Entry(SectionIOSpec(Bin, DataFrameIO),
      (_, c, df) => Some(Transforms.fromCsv(cfg(c, "header").split(",").toSeq)(in(df)))),
    "to_csv" -> Entry(SectionIOSpec(DataFrameIO, Bin),
      (_, _, df) => Some(Transforms.toCsv(in(df)))),
    "inspect" -> Entry(SectionIOSpec(BinOrDataFrame, BinOrDataFrame),
      (_, _, df) => Some(Transforms.inspect(in(df)))),
    // production inspect: zero-cost observe() metrics (row count + null
    // count of an optional key column) readable from query listeners —
    // no second scan, unlike show()
    "observe" -> Entry(SectionIOSpec(BinOrDataFrame, BinOrDataFrame),
      (_, c, df) => Some(Transforms.observed(
        c.getOrElse("name", "observe"), c.get("key_column"))(in(df)))),
    // exec df mode (reference default): one process per row, --col=val arg
    // expansion, frame passes through (ack deferred to the sink). Bin mode
    // ("mode": "bin") pipes the raw payload bytes of the canonical
    // (origin, value) frame through one child per message. "env" is the
    // reference's comma-separated K=V child-environment string
    // (`sections/exec/src/section/mod.rs:16-26`); "timeout_ms" bounds each
    // child's wall clock.
    "exec" -> Entry(SectionIOSpec(BinOrDataFrame, BinOrDataFrame),
      (_, c, df) => {
        val cmd = cfg(c, "command").split(" ").toSeq
        val env = c.get("env").map(Transforms.parseEnv).getOrElse(Map.empty)
        val timeoutMs = c.get("timeout_ms").map(_.toLong).getOrElse(0L)
        if (c.getOrElse("mode", "df") == "bin")
          Some(Transforms.execBin(cmd, env, timeoutMs)(in(df)))
        else Some(Transforms.execDf(cmd, env, timeoutMs)(in(df)))
      }),
    "stub" -> Entry(SectionIOSpec(BinOrDataFrame, None),
      (_, _, df) => Some(Transforms.stub(in(df)))),
    "sql" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(Transforms.sql(cfg(c, "query"))(in(df)))),

    // ---- training-data pipeline sections (spec-accessible forms of the
    // graft.operators library; SURVEY extensions, first-class) ----
    "dedup_exact" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(Transforms.dedupExact(
        cfg(c, "keys").split(",").toSeq,
        c.get("tie_break").map(_.split(",").toSeq).getOrElse(Nil))(in(df)))),
    // near-dup survivors: (id, n_merged) — one row per kept document
    "dedup_near" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(graft.operators.NearDup.survivors(in(df),
        idCol = c.getOrElse("id_column", "doc_id"),
        textCol = c.getOrElse("text_column", "text"),
        threshold = c.getOrElse("threshold", "0.2").toDouble))),
    // verified near-dup pairs: (a_id, b_id, jaccard)
    "near_dup_pairs" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(graft.operators.NearDup.pairs(in(df),
        idCol = c.getOrElse("id_column", "doc_id"),
        textCol = c.getOrElse("text_column", "text"),
        threshold = c.getOrElse("threshold", "0.2").toDouble))),
    // quality-aware dedup: near-dup clusters each keep their best member
    // by the `score` SQL expression (ties → lowest id) instead of min-id
    "dedup_best_copy" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => {
        val frame = in(df)
        val id = c.getOrElse("id_column", "doc_id")
        val members = graft.operators.Clustering.connectedComponents(
          frame.select(col(id).as("id")),
          graft.operators.NearDup.pairs(frame, idCol = id,
            textCol = c.getOrElse("text_column", "text"),
            threshold = c.getOrElse("threshold", "0.2").toDouble)
            .select(col("a_id"), col("b_id")))
        val scores = frame.select(col(id).as("id"),
          expr(cfg(c, "score")).as("score"))
        Some(graft.operators.Clustering.representatives(members, scores))
      }),
    // text analysis over a text column: append language/quality/token
    // columns (narrow, codegen'd — no shuffle)
    "text_analysis" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => {
        val tcName = c.getOrElse("text_column", "text")
        val textCol = col(tcName)
        val frame = in(df)
        val feats = c.getOrElse("features", "lang,quality,tokens").split(",").toSeq
        Some(feats.foldLeft(frame) { (d, f) => f.trim match {
          case "lang" => d.withColumn("pred_lang",
            graft.functions.TextFunctions.languageId(textCol))
          case "quality" => d.withColumn("quality_score",
            graft.functions.TextFunctions.qualityFeatures(textCol)
              .getField("quality_score"))
          case "tokens" => d.withColumn("n_tokens",
            graft.functions.TextFunctions.tokenCount(textCol).cast("long"))
          case "fingerprint" => d.withColumn("fingerprint",
            graft.functions.TextFunctions.fingerprint(
              graft.functions.TextFunctions.tokens(textCol)))
          case "gopher" => d.withColumn("gopher_pass",
            graft.functions.TextFunctions.gopherRules(textCol)
              .getField("gopher_pass"))
          // DEFLATE ratio (low => repetitive boilerplate) — deterministic
          // on the JVM, not oracle-portable; see functions.DeflateLength
          case "compress_ratio" => d.withColumn("compress_ratio",
            graft.functions.DeflateLength(textCol).cast("double") /
              greatest(octet_length(textCol).cast("double"), lit(1.0)))
          // Flesch reading-ease (ta_readability's exact formula)
          case "readability" => d.withColumn("flesch", {
            val tE = s"CASE WHEN trim(`$tcName`) = '' THEN array() " +
              s"ELSE split(trim(`$tcName`), '\\\\s+') END"
            val w = expr(s"size($tE)").cast("double")
            val sRaw = expr(s"size(filter(regexp_extract_all(`$tcName`, " +
              "'[^.!?]+[.!?]*', 0), p -> length(trim(p)) > 0))").cast("double")
            val syl = expr(s"aggregate(transform($tE, t -> greatest(1, " +
              "size(regexp_extract_all(lower(t), '[aeiouy]+', 0)))), 0, " +
              "(acc, x) -> acc + x)").cast("double")
            org.apache.spark.sql.functions.when(w === 0,
              lit(null).cast("double"))
              .otherwise(org.apache.spark.sql.functions.round(lit(206.835)
                - lit(1.015) * (w / greatest(sRaw, lit(1.0)))
                - lit(84.6) * (syl / w), 6))
          })
          case other => throw new IllegalArgumentException(
            s"text_analysis feature must be lang|quality|tokens|fingerprint|" +
            s"gopher|compress_ratio|readability, got $other")
        }})
      }),
    // unigram-LM quality scoring (CCNet-style bits/token against the
    // corpus's own unigram distribution; see Corpus.lmQualityScore)
    "lm_score" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(graft.operators.Corpus.lmQualityScore(in(df),
        vocabSize = c.getOrElse("vocab_size", "65536").toInt,
        idCol = c.getOrElse("id_column", "doc_id"),
        textCol = c.getOrElse("text_column", "text")))),
    // bigram LM with stupid backoff (order-sensitive quality scoring)
    "bigram_lm_score" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(graft.operators.Corpus.bigramLmScore(in(df),
        vocabSize = c.getOrElse("vocab_size", "65536").toInt,
        bigramMinCount = c.getOrElse("bigram_min_count", "2").toLong,
        alpha = c.getOrElse("alpha", "0.4").toDouble,
        idCol = c.getOrElse("id_column", "doc_id"),
        textCol = c.getOrElse("text_column", "text")))),
    // per-document character entropy (gibberish / encoding-noise signal)
    "char_entropy" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(graft.operators.Corpus.charEntropy(in(df),
        idCol = c.getOrElse("id_column", "doc_id"),
        textCol = c.getOrElse("text_column", "text")))),
    // PII redaction: regex detect+replace over a text column
    "pii_redact" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => {
        val textCol = c.getOrElse("text_column", "text")
        val pattern = c.getOrElse("pattern",
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")
        val replacement = c.getOrElse("replacement", "<PII>")
        Some(in(df).withColumn(textCol,
          regexp_replace(col(textCol), pattern, replacement)))
      }),
    // ANN top-k over (vec_id, embedding): variant =
    // brute|lsh|lsh_single|lsh_probe|lsh_multi|ivf; query_where (and ivf's
    // optional centroid_where) = SQL predicates over vec_id (vec_id only:
    // they are evaluated on derived frames carrying just the id).
    // Defaults a user should get: `lsh` resolves to the MULTI-TABLE
    // variant (single-table recall@10 is ~0.14 on this corpus shape — a
    // silent-quality trap; `lsh_single` keeps it reachable, documented);
    // `ivf` without centroid_where TRAINS its quantizer (sampled k-means,
    // K ~ sqrt(n)) instead of demanding K hand-picked member rows.
    // `project_dims` (optional) JL-compresses the embeddings first
    // (VectorFunctions.randomProject) — composes with every variant
    "ann_topk" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => {
        val raw = in(df).select(col("vec_id"), col("embedding"))
        val projDims = c.get("project_dims").map(_.toInt)
        val frame = projDims.map { pd =>
          // the projection's INPUT dimensionality is `dims_in` ONLY —
          // `dims` configures the LSH planes over the (projected) vectors
          // and defaults match, so reusing it here would silently project
          // from a prefix of each input vector
          val inDims = c.getOrElse("dims_in", "64").toInt
          raw.select(col("vec_id"),
            graft.functions.VectorFunctions
              .randomProject(col("embedding"), pd, inDims)
              .as("embedding"))
        }.getOrElse(raw)
        val isQuery = expr(cfg(c, "query_where"))
        val k = c.getOrElse("k", "5").toInt
        def bits = c.getOrElse("bits", "4").toInt
        // LSH planes must span the vectors the variant actually sees:
        // after a JL projection that is project_dims components, so
        // `dims` follows project_dims unless set — and setting both to
        // different values is a config error, not a silent truncation
        // (ArrayDotProduct dots only the common prefix otherwise)
        def dims = (c.get("dims").map(_.toInt), projDims) match {
          case (Some(d), Some(pd)) =>
            require(d == pd, s"ann_topk: dims=$d conflicts with " +
              s"project_dims=$pd — the LSH planes must match the " +
              "projected dimensionality; drop `dims` or set them equal")
            d
          case (Some(d), scala.None) => d
          case (scala.None, Some(pd)) => pd
          case (scala.None, scala.None) => 64
        }
        val out = c.getOrElse("variant", "brute") match {
          case "brute" => graft.operators.Ann.bruteForceTopK(frame, isQuery, k)
          case "lsh" | "lsh_multi" => graft.operators.Ann.lshMultiTopK(
            frame, isQuery, k, nBits = bits, dims = dims,
            tables = c.getOrElse("tables", "4").toInt)
          case "lsh_single" => graft.operators.Ann.lshTopK(frame, isQuery, k,
            nBits = bits, dims = dims)
          case "lsh_probe" => graft.operators.Ann.lshMultiProbeTopK(
            frame, isQuery, k, nBits = bits, dims = dims)
          case "ivf" => c.get("centroid_where") match {
            case Some(w) => graft.operators.Ann.ivfTopK(frame, isQuery,
              isCentroid = expr(w), k,
              nProbe = c.getOrElse("probes", "2").toInt)
            case scala.None =>
              // TRAINED default is the BALANCED quantizer: hot cells
              // above `balance_factor ×` mean auto-split at train time
              // (a no-op on balanced corpora — identical centroids —
              // but a skewed corpus no longer ships a 10× hot cell by
              // default; measured `ivf_cell_balance.skewed` 11.3 → ~2).
              // `balance_factor: 0` opts back into the raw trainer.
              val bf = c.getOrElse("balance_factor", "3.0").toDouble
              if (bf > 0.0) graft.operators.Ann.ivfTopKTrainedBalanced(
                frame, isQuery, k,
                nProbe = c.getOrElse("probes", "2").toInt,
                kCentroids = c.getOrElse("k_centroids", "0").toInt,
                iters = c.getOrElse("train_iters", "5").toInt,
                seed = c.getOrElse("seed", "ivf"),
                sampleRate = c.getOrElse("train_sample_rate", "1.0").toDouble,
                balanceFactor = bf,
                maxTrainVectors = trainCap(c))
              else graft.operators.Ann.ivfTopKTrained(
                frame, isQuery, k,
                nProbe = c.getOrElse("probes", "2").toInt,
                kCentroids = c.getOrElse("k_centroids", "0").toInt,
                iters = c.getOrElse("train_iters", "5").toInt,
                seed = c.getOrElse("seed", "ivf"),
                sampleRate = c.getOrElse("train_sample_rate", "1.0").toDouble,
                maxTrainVectors = trainCap(c))
          }
          // product quantization: trained codebooks + ADC serving — the
          // compressed-corpus path (codes, not floats, ride the scoring).
          // `refine: R` adds the exact-rerank pass (PQ top-R candidates
          // re-scored with true vectors — FAISS RefineFlat)
          case "pq" =>
            val refine = c.getOrElse("refine", "0").toInt
            if (refine > 0) graft.operators.Ann.pqTopKRefined(frame, isQuery,
              k,
              subspaces = c.getOrElse("subspaces", "8").toInt,
              codes = c.getOrElse("codes", "256").toInt,
              refine = refine,
              iters = c.getOrElse("train_iters", "4").toInt,
              seed = c.getOrElse("seed", "pq"),
              sampleRate = c.getOrElse("train_sample_rate", "1.0").toDouble,
              maxTrainVectors = trainCap(c))
            else graft.operators.Ann.pqTopK(frame, isQuery, k,
              subspaces = c.getOrElse("subspaces", "8").toInt,
              codes = c.getOrElse("codes", "256").toInt,
              iters = c.getOrElse("train_iters", "4").toInt,
              seed = c.getOrElse("seed", "pq"),
              sampleRate = c.getOrElse("train_sample_rate", "1.0").toDouble,
              maxTrainVectors = trainCap(c))
          // residual IVF-PQ (the FAISS IVFx,PQy shape): coarse cells
          // prune, residual codes score — the at-scale default.
          // `refine: R` = IVFx,PQy,RFlat (exact-rerank the PQ top-R)
          case "ivf_pq" =>
            val refine = c.getOrElse("refine", "0").toInt
            if (refine > 0) graft.operators.Ann.ivfPqTopKRefined(frame,
              isQuery, k,
              kCentroids = c.getOrElse("k_centroids", "16").toInt,
              subspaces = c.getOrElse("subspaces", "8").toInt,
              codes = c.getOrElse("codes", "256").toInt,
              nProbe = c.getOrElse("probes", "2").toInt,
              refine = refine,
              seed = c.getOrElse("seed", "ivf"),
              pqSeed = c.getOrElse("pq_seed", "pq"),
              sampleRate = c.getOrElse("train_sample_rate", "1.0").toDouble,
              maxTrainVectors = trainCap(c))
            else graft.operators.Ann.ivfPqTopK(frame, isQuery, k,
              kCentroids = c.getOrElse("k_centroids", "16").toInt,
              subspaces = c.getOrElse("subspaces", "8").toInt,
              codes = c.getOrElse("codes", "256").toInt,
              nProbe = c.getOrElse("probes", "2").toInt,
              seed = c.getOrElse("seed", "ivf"),
              pqSeed = c.getOrElse("pq_seed", "pq"),
              sampleRate = c.getOrElse("train_sample_rate", "1.0").toDouble,
              maxTrainVectors = trainCap(c))
          // OPQ (learned rotation before the PQ split — Ge et al. CVPR
          // 2013, the FAISS OPQx pretransform): trains rotation +
          // codebooks, serves rotated ADC; `refine: R` adds the exact
          // pass over the TRUE (unrotated) vectors (OPQx,PQy,RFlat).
          // `model_path` serves a stored opq_model with zero retraining.
          case "opq" =>
            val refine = c.getOrElse("refine", "0").toInt
            val (rotM, cbM) = c.get("model_path") match {
              case Some(p) => graft.operators.Ann.opqModelRead(
                frame.sparkSession, p)
              case scala.None => graft.operators.Ann.opqTrain(frame,
                subspaces = c.getOrElse("subspaces", "8").toInt,
                codes = c.getOrElse("codes", "256").toInt,
                iters = c.getOrElse("train_iters", "4").toInt,
                opqIters = c.getOrElse("opq_iters", "5").toInt,
                seed = c.getOrElse("seed", "opq"),
                sampleRate = c.getOrElse("train_sample_rate", "1.0").toDouble,
                maxTrainVectors = trainCap(c))
            }
            if (refine > 0) graft.operators.Ann.opqTopKRerank(frame,
              isQuery, rotM, cbM, k, refine = refine)
            else graft.operators.Ann.opqTopKFrom(frame, isQuery, rotM, cbM, k)
          case other => throw new IllegalArgumentException(
            s"ann_topk variant must be brute|lsh|lsh_single|lsh_probe|" +
            s"lsh_multi|ivf|pq|ivf_pq|opq, got $other")
        }
        Some(out.select("q_id", "n_id", "cosine", "rk"))
      }),
    // kNN label propagation: majority label of each query's k nearest
    // neighbors (weak supervision); variant picks the neighbor source —
    // brute for exactness, trained IVF for the at-scale path
    "knn_classify" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => {
        val labelCol = c.getOrElse("label_column", "label")
        val frame = in(df).select(col("vec_id"), col("embedding"), col(labelCol))
        val vecs = frame.select(col("vec_id"), col("embedding"))
        val isQuery = expr(cfg(c, "query_where"))
        val k = c.getOrElse("k", "10").toInt
        val top = c.getOrElse("variant", "brute") match {
          case "brute" => graft.operators.Ann.bruteForceTopK(vecs, isQuery, k)
          case "ivf" => graft.operators.Ann.ivfTopKTrained(vecs, isQuery, k,
            nProbe = c.getOrElse("probes", "2").toInt,
            kCentroids = c.getOrElse("k_centroids", "0").toInt)
          case other => throw new IllegalArgumentException(
            s"knn_classify variant must be brute|ivf, got $other")
        }
        Some(graft.operators.Ann.knnClassifyFrom(top, frame, labelCol))
      }),
    // custom-state sessionization (flatMapGroupsWithState): one row per
    // closed session (key, session_start, n); batch frames close at
    // end-of-input, streaming frames via event-time timeout
    // dense-grid forward-fill resample (batch or streaming; the streaming
    // path emits buckets as the watermark finalizes them)
    "resample_ffill" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(graft.streaming.StatefulResample.resample(in(df),
        keyCol = c.getOrElse("key_column", "user_id"),
        tsCol = c.getOrElse("ts_column", "ts"),
        tieCol = c.getOrElse("tie_column", "event_id"),
        valCol = c.getOrElse("value_column", "value"),
        bucketSeconds = c.getOrElse("bucket_seconds", "3600").toLong,
        watermark = c.getOrElse("watermark", "1 hour")).toDF())),
    "sessionize" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => {
        val frame = in(df)
        val key = c.getOrElse("key_column", "user_id")
        val ts = c.getOrElse("ts_column", "ts")
        val gap = c.getOrElse("gap_seconds", "1800").toLong
        if (frame.isStreaming)
          Some(graft.streaming.StatefulSessions.sessionize(
            frame, key, ts, gap,
            watermark = c.getOrElse("watermark", "0 seconds")).toDF())
        else
          Some(graft.streaming.StatefulSessions.sessionizeBatchComplete(
            frame, key, ts, gap))
      }),
    // streaming-capable chat assembly: the custom-state transcript path
    // on a streaming frame (sessions close at the watermark), the
    // sentinel-completed batch twin otherwise — same rows either way
    "chat_assembly_stateful" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => {
        val frame = in(df)
        val turn = expr(cfg(c, "turn_expr"))
        val key = c.getOrElse("key_column", "user_id")
        val ts = c.getOrElse("ts_column", "ts")
        val tie = c.getOrElse("tie_column", "event_id")
        val gap = c.getOrElse("gap_seconds", "1800").toLong
        if (frame.isStreaming)
          Some(graft.streaming.StatefulChat.assemble(frame, turn, key, ts,
            tie, gap, watermark = c.getOrElse("watermark", "0 seconds")).toDF())
        else
          Some(graft.streaming.StatefulChat.assembleBatchComplete(
            frame, turn, key, ts, tie, gap))
      }),
    // deterministic hash-bucket train/valid/test split: RNG-free,
    // shuffle-free, stable across runs and engines (validates percentages)
    "dataset_split" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(in(df).withColumn("split",
        Transforms.splitColumn(col(c.getOrElse("id_column", "doc_id")),
          trainPct = c.getOrElse("train_pct", "80").toInt,
          validPct = c.getOrElse("valid_pct", "10").toInt)))),
    // deterministic seeded epoch shuffle: (id, shuffle_key, pos)
    "seeded_shuffle" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(graft.operators.Corpus.seededShuffle(in(df),
        seed = c.getOrElse("seed", "graft"),
        idCol = c.getOrElse("id_column", "doc_id"),
        partitions = c.getOrElse("partitions", "32").toInt))),
    // curriculum stages: easy->hard global quality rank cut into stages
    "curriculum" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(graft.operators.Corpus.curriculumStages(in(df),
        stages = c.getOrElse("stages", "4").toInt,
        idCol = c.getOrElse("id_column", "doc_id"),
        textCol = c.getOrElse("text_column", "text"),
        partitions = c.getOrElse("partitions", "32").toInt))),
    // hot-domain downsampling: keep top-k docs per source by quality
    "source_quota" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(graft.operators.Corpus.sourceQuota(in(df),
        k = c.getOrElse("k", "10").toInt,
        idCol = c.getOrElse("id_column", "doc_id"),
        textCol = c.getOrElse("text_column", "text"),
        byCol = c.getOrElse("by_column", "source")))),
    // keyword blocklist screening: flag (default) or drop matching docs
    "blocklist_screen" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => {
        import org.apache.spark.sql.functions.{filter => afilter, lower,
          regexp_replace, size, transform, trim}
        val terms = cfg(c, "terms").split(",").map(_.trim.toLowerCase)
          .filter(_.nonEmpty).toSeq
        require(terms.nonEmpty, "blocklist_screen needs at least one term")
        val tc = col(c.getOrElse("text_column", "text"))
        // leading/trailing punctuation stripped before the whole-token
        // match — `merge,` flags, `merger` does not (same rule as the
        // ta_blocklist query and its oracle)
        val hits = size(afilter(
          transform(graft.functions.TextFunctions.tokens(tc),
            t => lower(regexp_replace(t, "^\\p{Punct}+|\\p{Punct}+$", ""))),
          t => t.isInCollection(terms)))
        val frame = in(df)
        Some(c.getOrElse("mode", "flag") match {
          case "drop" => frame.filter(hits === 0)
          case "flag" => frame.withColumn("n_blocklist_hits", hits.cast("long"))
          case other => throw new IllegalArgumentException(
            s"blocklist_screen mode must be flag|drop, got $other")
        })
      }),
    // exact-quantile dynamic filter: drop docs under the corpus percentile
    "quantile_filter" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => {
        val frame = in(df)
        val pct = c.getOrElse("percentile", "0.1").toDouble
        require(pct >= 0.0 && pct <= 1.0, s"percentile must be in [0,1], got $pct")
        val score = c.get("score") match {
          case Some(e) => expr(e)
          case scala.None => graft.functions.TextFunctions
            .qualityFeatures(col(c.getOrElse("text_column", "text")))
            .getField("quality_score")
        }
        val scored = frame.withColumn("_q", round(score, 6))
        val thr = scored.agg(
          round(expr(s"percentile(_q, $pct)"), 6).as("_thr"))
        Some(scored.crossJoin(broadcast(thr))
          .filter(col("_q") >= col("_thr"))
          .drop("_q", "_thr"))
      }),
    // unicode/case/whitespace normalization of the text column, in place
    "normalize_text" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => {
        val tc = c.getOrElse("text_column", "text")
        def on(k: String, dflt: Boolean) =
          c.get(k).map(_.toBoolean).getOrElse(dflt)
        Some(in(df).withColumn(tc,
          graft.functions.TextFunctions.normalizeText(col(tc),
            nfc = on("nfc", true),
            stripAccents = on("strip_accents", false),
            lowercase = on("lowercase", true),
            collapseWs = on("collapse_ws", true))))
      }),
    // sentence segmentation: (doc_id, sent_idx, sentence, n_chars)
    "split_sentences" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(graft.operators.Corpus.splitSentences(in(df),
        idCol = c.getOrElse("id_column", "doc_id"),
        textCol = c.getOrElse("text_column", "text")))),
    // directed n-gram containment (excerpt/quote duplication)
    "containment_pairs" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(graft.operators.NearDup.ngramContainmentPairs(in(df),
        idCol = c.getOrElse("id_column", "doc_id"),
        textCol = c.getOrElse("text_column", "text"),
        ngram = c.getOrElse("ngram", "3").toInt,
        threshold = c.getOrElse("threshold", "0.8").toDouble))),
    // n-gram novelty vs a reference corpus (memorization/freshness signal)
    "novelty_score" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (s, c, df) => {
        val ref = s.read.parquet(cfg(c, "reference_path"))
        Some(graft.operators.NearDup.noveltyScores(in(df), ref,
          idCol = c.getOrElse("id_column", "doc_id"),
          textCol = c.getOrElse("text_column", "text"),
          ngram = c.getOrElse("ngram", "3").toInt))
      }),
    // duplication-centrality: PageRank over the near-dup pair graph
    "dup_rank" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => {
        val frame = in(df)
        val id = c.getOrElse("id_column", "doc_id")
        val pairs = graft.operators.NearDup.pairs(frame, idCol = id,
          textCol = c.getOrElse("text_column", "text"),
          threshold = c.getOrElse("threshold", "0.2").toDouble)
        Some(graft.operators.Clustering.pageRank(
          frame.select(col(id).as("id")), pairs.select(col("a_id"), col("b_id")),
          iters = c.getOrElse("iters", "5").toInt,
          damping = c.getOrElse("damping", "0.85").toDouble))
      }),
    // per-document TF-IDF keyword extraction: (id, token, score) top-k
    "tfidf_keywords" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(graft.operators.Corpus.tfidfKeywords(in(df),
        k = c.getOrElse("k", "3").toInt,
        idCol = c.getOrElse("id_column", "doc_id"),
        textCol = c.getOrElse("text_column", "text")))),
    // multimodal decode: binary payload column -> fixed-length feature
    // vector (deterministic stub codec; the Spark-side plumbing is real)
    "mm_decode" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => {
        val payload = c.getOrElse("payload_column", "payload")
        val dims = c.getOrElse("dims", "4").toInt
        Some(in(df).withColumn("features",
          graft.operators.Multimodal.stubDecodeFeatures(col(payload), dims)))
      }),
    // REAL image decode (javax.imageio PNG/JPEG): payload column ->
    // (id, width, height, channel sums) + means; undecodable rows carry
    // width -1 with null sums instead of failing the pipeline
    "mm_decode_image" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => {
        val decoded = graft.operators.Multimodal.decodeImageFeatures(in(df),
          idCol = c.getOrElse("id_column", "img_id"),
          payloadCol = c.getOrElse("payload_column", "payload"),
          maxPixels = c.getOrElse("max_pixels", (16L * 1000 * 1000).toString).toLong)
        Some(if (c.getOrElse("means", "true").toBoolean)
          graft.operators.Multimodal.imageChannelMeans(decoded)
        else decoded)
      }),
    // REAL image resize (nearest-neighbor + lossless PNG re-encode)
    "mm_resize" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(graft.operators.Multimodal.resizeImages(in(df),
        targetW = c.getOrElse("width", "64").toInt,
        targetH = c.getOrElse("height", "64").toInt,
        idCol = c.getOrElse("id_column", "img_id"),
        payloadCol = c.getOrElse("payload_column", "payload"),
        maxPixels = c.getOrElse("max_pixels", (16L * 1000 * 1000).toString).toLong))),
    // REAL audio decode (javax.sound WAV/PCM): payload column ->
    // (id, sample_rate, channels, n_frames, per-channel sums) + stats;
    // undecodable rows carry sample_rate -1 with null sums
    "mm_decode_audio" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => {
        val decoded = graft.operators.Multimodal.decodeAudioFeatures(in(df),
          idCol = c.getOrElse("id_column", "audio_id"),
          payloadCol = c.getOrElse("payload_column", "payload"))
        Some(if (c.getOrElse("stats", "true").toBoolean)
          graft.operators.Multimodal.audioStats(decoded)
        else decoded)
      }),
    // REAL video decode (pure-JVM AVI/RIFF walk; raw BI_RGB summed in
    // place, MJPG via the JDK JPEG codec): payload column -> (id, dims,
    // frame counts, channel sums over every sample_every-th frame);
    // corrupt/unsupported-codec rows carry width -1, over-cap -2
    "mm_decode_video" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(graft.operators.Multimodal.decodeVideoFeatures(in(df),
        idCol = c.getOrElse("id_column", "video_id"),
        payloadCol = c.getOrElse("payload_column", "payload"),
        sampleEvery = c.getOrElse("sample_every", "1").toInt,
        maxPixels = c.getOrElse("max_pixels", (16L * 1000 * 1000).toString).toLong))),
    // benchmark decontamination: bench_where splits the input frame into
    // benchmark (matching) and corpus (rest); output = contaminated corpus
    // docs with distinct-overlap counts
    "decon_overlap" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => {
        val frame = in(df)
        val isBench = expr(cfg(c, "bench_where"))
        Some(graft.operators.Corpus.deconOverlap(
          frame.filter(!isBench), frame.filter(isBench),
          n = c.getOrElse("ngram", "8").toInt,
          idCol = c.getOrElse("id_column", "doc_id"),
          textCol = c.getOrElse("text_column", "text")))
      }),
    // decontamination behind a broadcast Bloom prefilter: same exact
    // output as decon_overlap (no false negatives; fpp only moves work)
    // for benchmark suites too big to broadcast as exact hash sets
    "decon_bloom" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => {
        val frame = in(df)
        val isBench = expr(cfg(c, "bench_where"))
        Some(graft.operators.Corpus.deconBloom(
          frame.filter(!isBench), frame.filter(isBench),
          n = c.getOrElse("ngram", "8").toInt,
          fpp = c.getOrElse("fpp", "0.01").toDouble,
          idCol = c.getOrElse("id_column", "doc_id"),
          textCol = c.getOrElse("text_column", "text")))
      }),
    // WITHIN-document exact line dedup (C4/Gopher page cleaning)
    "dedup_lines" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(graft.operators.Corpus.dedupLines(in(df),
        c.getOrElse("id_col", "doc_id"), c.getOrElse("text_col", "text")))),
    // boilerplate-segment removal (line dedup at word-segment granularity)
    "segment_dedup" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(graft.operators.Corpus.segmentDedup(in(df),
        segWords = c.getOrElse("seg_words", "8").toInt,
        maxDf = c.getOrElse("max_df", "2").toLong,
        idCol = c.getOrElse("id_column", "doc_id"),
        textCol = c.getOrElse("text_column", "text")))),
    // ExactSubstr scrubbing (Lee et al. ACL 2022): remove every maximal
    // token span >= min_tokens occurring more than once in the corpus
    "exact_substr_dedup" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(graft.operators.Corpus.exactSubstrDedup(in(df),
        minTokens = c.getOrElse("min_tokens", "10").toInt,
        idCol = c.getOrElse("id_column", "doc_id"),
        textCol = c.getOrElse("text_column", "text")))),
    // token-budget sequence packing: (doc_id, tok, seq_id)
    "pack_sequences" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(graft.operators.Corpus.packSequences(in(df),
        budget = c.getOrElse("budget", "256").toLong,
        partitions = c.getOrElse("partitions", "32").toInt,
        idCol = c.getOrElse("id_column", "doc_id"),
        textCol = c.getOrElse("text_column", "text"),
        stageDir = c.get("stage_dir"),
        withOffsets = c.getOrElse("with_offsets", "false").toBoolean))),
    // chat-transcript assembly: sessionize per user by inactivity gap,
    // concatenate each session's turns (turn_expr renders one event) in
    // deterministic (ts, tie) order — the SFT-data prep composition
    "chat_assembly" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(graft.operators.Corpus.chatAssembly(in(df),
        turn = expr(cfg(c, "turn_expr")),
        gapSeconds = c.getOrElse("gap_seconds", "1800").toLong,
        userCol = c.getOrElse("user_column", "user_id"),
        tsCol = c.getOrElse("ts_column", "ts"),
        tieCol = c.getOrElse("tie_column", "event_id")))),
    // temperature-based mixing: keep-rate per domain ∝ n_d^(alpha-1)
    // anchored at the smallest domain (Corpus.mixTemperature)
    "mix_temperature" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(graft.operators.Corpus.mixTemperature(in(df),
        alpha = cfg(c, "alpha").toDouble,
        byCol = c.getOrElse("by_column", "lang"),
        idCol = c.getOrElse("id_column", "doc_id"),
        maxRate = c.getOrElse("max_rate", "1.0").toDouble))),
    // token-budget mixing: "N tokens of domain D" — hash-ordered
    // admission per domain until each budget is crossed; the budget
    // table IS the selection (unlisted domains are excluded)
    "mix_token_budget" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => {
        val budgets = cfg(c, "budgets").split(",").toSeq.map { kv =>
          kv.split(":") match {
            case Array(k, v) => (k.trim, v.trim.toLong)
            case _ => throw new IllegalArgumentException(
              s"mix_token_budget budgets must be domain:tokens pairs, got '$kv'")
          }
        }
        Some(graft.operators.Corpus.mixTokenBudget(in(df), budgets,
          byCol = c.getOrElse("by_column", "lang"),
          idCol = c.getOrElse("id_column", "doc_id"),
          textCol = c.getOrElse("text_column", "text")))
      }),
    // lake-staged intermediate: materialize the upstream frame to parquet
    // and hand consumers the re-read scan — the executor-storage-free
    // alternative to caching a corpus-sized frame mid-pipeline
    // (graft.operators.Staging)
    "stage" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(graft.operators.Staging.stage(in(df),
        cfg(c, "stage_dir"), c.getOrElse("name", "stage")))),
    // deterministic weighted mixing: rates = "en:0.8,de:0.5,..."
    "mix_weighted" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => {
        val rates = cfg(c, "rates").split(",").toSeq.map { kv =>
          kv.split(":") match {
            case Array(k, v) => (k.trim, v.trim.toDouble)
            case _ => throw new IllegalArgumentException(
              s"mix_weighted rates must be domain:rate pairs, got '$kv'")
          }
        }
        Some(graft.operators.Corpus.mixWeighted(in(df), rates,
          byCol = c.getOrElse("by_column", "lang"),
          idCol = c.getOrElse("id_column", "doc_id")))
      }),
    // BM25 top-k against fixed terms: (doc_id, score)
    "bm25_topk" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(graft.operators.Corpus.bm25(in(df),
        cfg(c, "terms").split(",").toSeq.map(_.trim).filter(_.nonEmpty),
        k = c.getOrElse("k", "20").toInt,
        idCol = c.getOrElse("id_column", "doc_id"),
        textCol = c.getOrElse("text_column", "text")))),
    // exact duplicated-span scrubbing (sliding k-token windows)
    "scrub_spans" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(graft.operators.Corpus.scrubDuplicateSpans(in(df),
        k = c.getOrElse("window", "8").toInt,
        idCol = c.getOrElse("id_column", "doc_id"),
        textCol = c.getOrElse("text_column", "text")))),
    // per-row importance sampling: rate = SQL expression over the row
    "sample_by_rate" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(graft.operators.Corpus.sampleByRate(in(df),
        expr(cfg(c, "rate")),
        idCol = c.getOrElse("id_column", "doc_id")))),
    // DSIR importance weights: target = SQL predicate over the row; output
    // (doc_id, n_feats, dsir_logratio) for downstream thinning/resampling
    "dsir_weights" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(graft.operators.Corpus.dsirWeights(in(df),
        isTarget = expr(cfg(c, "target")),
        buckets = c.getOrElse("buckets", "4096").toInt,
        idCol = c.getOrElse("id_column", "doc_id"),
        textCol = c.getOrElse("text_column", "text")))),
    // trained quality/domain classifier: positives = SQL predicate; output
    // (doc_id, quality_prob) from an in-engine-trained logistic regression
    "quality_classifier" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(graft.operators.Corpus.qualityClassifierScore(in(df),
        isPositive = expr(cfg(c, "positive")),
        buckets = c.getOrElse("buckets", "1024").toInt,
        iters = c.getOrElse("iters", "3").toInt,
        lr = BigDecimal(c.getOrElse("learning_rate", "2.0")),
        idCol = c.getOrElse("id_column", "doc_id"),
        textCol = c.getOrElse("text_column", "text")))),
    // trained BPE tokenizer: learn merges on the input corpus (or load a
    // previously-trained store via `merges_path` — no retrain), emit
    // per-doc subword token counts under the table
    "bpe_token_count" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (s, c, df) => {
        val frame = in(df)
        val merges = c.get("merges_path") match {
          case Some(p) => graft.functions.Bpe.mergesRead(s, p)
          case scala.None => graft.operators.Corpus.bpeTrain(frame,
            maxMerges = c.getOrElse("max_merges", "40").toInt,
            minPairCount = c.getOrElse("min_pair_count", "2").toLong,
            textCol = c.getOrElse("text_column", "text"),
            maxDriverVocab = c.getOrElse("max_driver_vocab",
              (1 << 20).toString).toInt,
            maxTrainDocs = trainDocsCap(c),
            idCol = c.getOrElse("id_column", "doc_id"))
        }
        Some(graft.operators.Corpus.bpeTokenCounts(frame, merges,
          idCol = c.getOrElse("id_column", "doc_id"),
          textCol = c.getOrElse("text_column", "text")))
      }),
    // token-ID export, HF vocab+merges shape: (doc_id, token_ids
    // array<int>) — serve a stored model (merges_path + vocab_path) or
    // train inline (alphabet derives from the TRAINING corpus)
    "bpe_encode" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (s, c, df) => {
        val frame = in(df)
        val textCol = c.getOrElse("text_column", "text")
        val (merges, vocab) = (c.get("merges_path"), c.get("vocab_path")) match {
          case (Some(mp), Some(vp)) =>
            val m = graft.functions.Bpe.mergesRead(s, mp)
            val v = graft.functions.Bpe.vocabRead(s, vp)
            graft.functions.Bpe.requireCompanion(m, v, mp, vp)
            (m, v)
          case (scala.None, scala.None) =>
            val m = graft.operators.Corpus.bpeTrain(frame,
              maxMerges = c.getOrElse("max_merges", "40").toInt,
              minPairCount = c.getOrElse("min_pair_count", "2").toLong,
              textCol = textCol,
              maxDriverVocab = c.getOrElse("max_driver_vocab",
                (1 << 20).toString).toInt,
              maxTrainDocs = trainDocsCap(c),
              idCol = c.getOrElse("id_column", "doc_id"))
            (m, graft.functions.Bpe.vocabFromMerges(m,
              graft.operators.Corpus.bpeAlphabet(frame, textCol)))
          case _ => throw new IllegalArgumentException(
            "bpe_encode needs BOTH merges_path and vocab_path (stored " +
              "model) or NEITHER (inline training) — ids from a " +
              "half-loaded model would silently renumber")
        }
        Some(graft.operators.Corpus.bpeTokenIds(frame, merges, vocab,
          idCol = c.getOrElse("id_column", "doc_id"),
          textCol = textCol))
      }),
    // tokenizer model store (train-once/serve-later, the ann_model_*
    // discipline): learn merges on the input corpus and persist them as
    // a (rank, pair) parquet store for later `merges_path` serving;
    // `ids_path` additionally writes the (piece, id) vocab store the
    // bpe_encode section serves from
    "bpe_model_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (s, c, df) => {
        val frame = in(df)
        val textCol = c.getOrElse("text_column", "text")
        val merges = graft.operators.Corpus.bpeTrain(frame,
          maxMerges = c.getOrElse("max_merges", "40").toInt,
          minPairCount = c.getOrElse("min_pair_count", "2").toLong,
          textCol = textCol,
          maxDriverVocab = c.getOrElse("max_driver_vocab",
            (1 << 20).toString).toInt,
          maxTrainDocs = trainDocsCap(c),
          idCol = c.getOrElse("id_column", "doc_id"))
        graft.functions.Bpe.mergesWrite(merges, cfg(c, "path"), s)
        c.get("ids_path").foreach { vp =>
          graft.functions.Bpe.vocabWrite(
            graft.functions.Bpe.vocabFromMerges(merges,
              graft.operators.Corpus.bpeAlphabet(frame, textCol)), vp, s)
        }
        scala.None
      }),
    // unigram-LM (SentencePiece-family) twin of the bpe pair: Viterbi
    // token counts under a trained piece→log-prob vocab; inline training
    // or `vocab_path` serving from a stored model
    "unigram_token_count" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (s, c, df) => {
        val frame = in(df)
        val vocab = c.get("vocab_path") match {
          case Some(p) => graft.functions.Unigram.vocabRead(s, p)
          case scala.None => graft.operators.Corpus.unigramTrain(frame,
            vocabSize = c.getOrElse("vocab_size", "200").toInt,
            textCol = c.getOrElse("text_column", "text"),
            maxDriverVocab = c.getOrElse("max_driver_vocab",
              (1 << 20).toString).toInt)
        }
        Some(graft.operators.Corpus.unigramTokenCounts(frame, vocab,
          idCol = c.getOrElse("id_column", "doc_id"),
          textCol = c.getOrElse("text_column", "text")))
      }),
    // token-ID export — the trainer-consumable stream: (doc_id,
    // token_ids array<int>) under a trained vocab (inline or vocab_path)
    "unigram_encode" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (s, c, df) => {
        val frame = in(df)
        val vocab = c.get("vocab_path") match {
          case Some(p) => graft.functions.Unigram.vocabRead(s, p)
          case scala.None => graft.operators.Corpus.unigramTrain(frame,
            vocabSize = c.getOrElse("vocab_size", "200").toInt,
            textCol = c.getOrElse("text_column", "text"),
            maxDriverVocab = c.getOrElse("max_driver_vocab",
              (1 << 20).toString).toInt)
        }
        Some(graft.operators.Corpus.unigramTokenIds(frame, vocab,
          idCol = c.getOrElse("id_column", "doc_id"),
          textCol = c.getOrElse("text_column", "text")))
      }),
    // terminal training-sequence materialization: (seq_id, input_ids)
    // rows of exactly `budget` tokens, docs split at boundaries;
    // tokenizer = unigram (default; vocab_path or inline) | bpe
    // (merges_path+vocab_path or inline)
    "pack_token_ids" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (s, c, df) => {
        val frame = in(df)
        val textCol = c.getOrElse("text_column", "text")
        val budget = c.getOrElse("budget", "256").toInt
        val partitions = c.getOrElse("partitions", "32").toInt
        val idCol = c.getOrElse("id_column", "doc_id")
        c.getOrElse("tokenizer", "unigram") match {
          case "unigram" =>
            val vocab = c.get("vocab_path") match {
              case Some(p) => graft.functions.Unigram.vocabRead(s, p)
              case scala.None => graft.operators.Corpus.unigramTrain(frame,
                vocabSize = c.getOrElse("vocab_size", "200").toInt,
                textCol = textCol,
                maxDriverVocab = c.getOrElse("max_driver_vocab",
                  (1 << 20).toString).toInt)
            }
            Some(graft.operators.Corpus.packTokenIds(frame, vocab,
              budget, partitions, idCol, textCol, c.get("stage_dir")))
          case "bpe" =>
            val (merges, vocab) =
              (c.get("merges_path"), c.get("vocab_path")) match {
                case (Some(mp), Some(vp)) =>
                  (graft.functions.Bpe.mergesRead(s, mp),
                    graft.functions.Bpe.vocabRead(s, vp))
                case (scala.None, scala.None) =>
                  val m = graft.operators.Corpus.bpeTrain(frame,
                    maxMerges = c.getOrElse("max_merges", "40").toInt,
                    textCol = textCol,
                    maxTrainDocs = trainDocsCap(c),
                    idCol = idCol)
                  (m, graft.functions.Bpe.vocabFromMerges(m,
                    graft.operators.Corpus.bpeAlphabet(frame, textCol)))
                case _ => throw new IllegalArgumentException(
                  "pack_token_ids tokenizer=bpe needs BOTH merges_path " +
                    "and vocab_path or NEITHER")
              }
            Some(graft.operators.Corpus.packBpeTokenIds(frame, merges,
              vocab, budget, partitions, idCol, textCol, c.get("stage_dir")))
          case other => throw new IllegalArgumentException(
            s"pack_token_ids: unknown tokenizer '$other' (unigram | bpe)")
        }
      }),
    "unigram_model_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (s, c, df) => {
        graft.functions.Unigram.vocabWrite(
          graft.operators.Corpus.unigramTrain(in(df),
            vocabSize = c.getOrElse("vocab_size", "200").toInt,
            textCol = c.getOrElse("text_column", "text"),
            maxDriverVocab = c.getOrElse("max_driver_vocab",
              (1 << 20).toString).toInt),
          cfg(c, "path"), s)
        scala.None
      }),
    // sliding token-window chunking: (doc_id, chunk_idx, chunk_text, n_tokens)
    "chunk_tokens" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(graft.operators.Corpus.chunkTokens(in(df),
        window = c.getOrElse("window", "64").toInt,
        stride = c.getOrElse("stride", "32").toInt,
        idCol = c.getOrElse("id_column", "doc_id"),
        textCol = c.getOrElse("text_column", "text")))),
    // incremental dedup against a reference corpus: reference_where splits
    // the input frame; output = surviving incoming ids
    // with `index_path` set, the reference side is the v2 SIGNATURE INDEX
    // (NearDup.dedupAgainstIndex — partition-pruned probe, zero
    // corpus-scale aggregates per batch, build params self-describing);
    // with `signatures_path`, the v1 store (NearDup.dedupAgainstStored);
    // otherwise reference_where splits the input frame and signatures
    // compute inline
    "dedup_against" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => {
        val frame = in(df)
        val idCol = c.getOrElse("id_column", "doc_id")
        val textCol = c.getOrElse("text_column", "text")
        val threshold = c.getOrElse("threshold", "0.2").toDouble
        Some((c.get("index_path"), c.get("signatures_path")) match {
          case (Some(p), _) => graft.operators.NearDup.dedupAgainstIndex(
            frame, p, idCol = idCol, textCol = textCol, threshold = threshold)
          case (scala.None, Some(p)) =>
            graft.operators.NearDup.dedupAgainstStored(
              frame, p, idCol = idCol, textCol = textCol,
              threshold = threshold)
          case (scala.None, scala.None) =>
            val isRef = expr(cfg(c, "reference_where"))
            graft.operators.NearDup.dedupAgainstReference(
              frame.filter(isRef), frame.filter(!isRef),
              idCol = idCol, textCol = textCol, threshold = threshold)
        })
      }),
    // build the reference signature store (exact md5s + shingle hashes +
    // bands) that dedup_against's signatures_path mode consumes
    "dedup_signatures_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (_, c, df) => {
        graft.operators.NearDup.writeReferenceSignatures(in(df),
          cfg(c, "path"),
          idCol = c.getOrElse("id_column", "doc_id"),
          textCol = c.getOrElse("text_column", "text"))
        scala.None
      }),
    // incremental counterpart: APPEND this frame's signatures to an
    // existing store (only genuinely-new texts contribute; replay-safe
    // by the exact-guard-last ordering) — batch pipelines grow their
    // reference corpus without rebuilds, like the streaming absorb mode
    "dedup_absorb_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (_, c, df) => {
        graft.operators.NearDup.absorbIntoSignatures(in(df),
          cfg(c, "signatures"),
          idCol = c.getOrElse("id_column", "doc_id"),
          textCol = c.getOrElse("text_column", "text"),
          ngram = c.getOrElse("ngram", "3").toInt,
          slots = c.getOrElse("slots", "32").toInt,
          rowsPerBand = c.getOrElse("rows_per_band", "4").toInt)
        scala.None
      }),
    // build the v2 SIGNATURE INDEX (pre-aggregated verify sets +
    // bucket-partitioned postings + bloom-gated exact guard) that
    // dedup_against's index_path mode probes partition-pruned — the
    // nightly-build/all-day-serving loop for dedup, like
    // ann_index_destination for ANN
    "dedup_index_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (_, c, df) => {
        graft.operators.NearDup.writeSignatureIndex(in(df),
          cfg(c, "path"),
          idCol = c.getOrElse("id_column", "doc_id"),
          textCol = c.getOrElse("text_column", "text"),
          ngram = c.getOrElse("ngram", "3").toInt,
          slots = c.getOrElse("slots", "32").toInt,
          rowsPerBand = c.getOrElse("rows_per_band", "4").toInt,
          exactBuckets = c.getOrElse("exact_buckets", "64").toInt,
          bandBuckets = c.getOrElse("band_buckets", "64").toInt,
          setBuckets = c.getOrElse("set_buckets", "64").toInt,
          bloomItems = c.getOrElse("bloom_items", "0").toLong,
          bloomFpp = c.getOrElse("bloom_fpp", "0.03").toDouble)
        scala.None
      }),
    // absorb into a v2 signature index: signature params are read from
    // the store itself (self-describing), so only the path is config.
    // `compact_after: N` makes the daily loop SELF-MAINTAINING: after
    // the absorb, any bucket dir past N files is compacted to one (each
    // absorb appends at most one file per touched bucket, so N files ≈
    // N absorbs since that bucket's last compaction) — a declarative
    // pipeline keeps its store probe-fast without a separately
    // sequenced dedup_index_compact_destination; the check no-ops
    // cheaply (one listing) when every bucket is under the bound
    "dedup_index_absorb_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (s, c, df) => {
        graft.operators.NearDup.absorbIntoIndex(in(df), cfg(c, "path"),
          idCol = c.getOrElse("id_column", "doc_id"),
          textCol = c.getOrElse("text_column", "text"))
        c.get("compact_after").map(_.toInt).foreach { n =>
          graft.operators.NearDup.compactSignatureIndex(s, cfg(c, "path"),
            maxFilesPerBucket = n)
        }
        scala.None
      }),
    // compact a v2 signature index's bucket dirs (each absorb appends
    // one file per touched bucket — daily cadence means O(days) files
    // per dir and probes pay the listing): destination-shaped so it
    // slots after the absorb in the same pipeline; the input frame is
    // ignored (ordering only)
    "dedup_index_compact_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (s, c, df) => {
        in(df) // ordering dependency — the frame itself is not read
        graft.operators.NearDup.compactSignatureIndex(s, cfg(c, "path"),
          maxFilesPerBucket =
            c.getOrElse("max_files_per_bucket", "8").toInt)
        scala.None
      }),
    // SemDeDup: semantic dedup inside trained k-means cells
    // (Ann.semanticDedup) — survivors (min vec_id per cosine group) out.
    // `two_level: true` switches to the coarse+residual-fine composite
    // cells (Ann.semanticDedupTwoLevel, O(n^{4/3}) vs O(n^{3/2}) — the
    // batch posture for corpora past ~10^5 vectors); `k_centroids` then
    // reads as the PER-LEVEL cell count (0 = auto-cbrt each level)
    "semantic_dedup" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => {
        val e = in(df).select(col("vec_id"), col("embedding"))
        val threshold = c.getOrElse("threshold", "0.7").toDouble
        val k = c.getOrElse("k_centroids", "0").toInt
        val iters = c.getOrElse("train_iters", "5").toInt
        val seed = c.getOrElse("seed", "ivf")
        val rate = c.getOrElse("train_sample_rate", "1.0").toDouble
        val maxBlock = c.getOrElse("max_block", "10000").toLong
        Some(
          if (c.getOrElse("two_level", "false").toBoolean)
            graft.operators.Ann.semanticDedupTwoLevel(e, threshold,
              k1 = k, k2 = k, iters = iters, seed = seed,
              sampleRate = rate, maxBlock = maxBlock,
              maxTrainVectors = trainCap(c))
          else graft.operators.Ann.semanticDedup(e, threshold,
            kCentroids = k, iters = iters, seed = seed,
            sampleRate = rate, maxBlock = maxBlock,
            maxTrainVectors = trainCap(c)))
      }),
    // on-disk IVF index build (destination) and query (source-shaped
    // transform: input frame = the query vectors)
    "ann_index_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (_, c, df) => {
        c.get("centroid_where") match {
          case Some(w) => graft.operators.Ann.ivfIndexWrite(in(df),
            isCentroid = expr(w), cfg(c, "path"))
          case scala.None => graft.operators.Ann.ivfIndexWriteTrained(
            in(df), cfg(c, "path"),
            kCentroids = c.getOrElse("k_centroids", "0").toInt,
            iters = c.getOrElse("train_iters", "5").toInt,
            seed = c.getOrElse("seed", "ivf"),
            sampleRate = c.getOrElse("train_sample_rate", "1.0").toDouble,
            maxTrainVectors = trainCap(c))
        }
        scala.None
      }),
    "ann_index_query" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(graft.operators.Ann.ivfIndexTopK(in(df),
        cfg(c, "path"), k = c.getOrElse("k", "5").toInt,
        nProbe = c.getOrElse("probes", "2").toInt))),
    // trained-model store (train-once/serve-later): write an IVF-PQ
    // model (coarse centroids + residual codebooks) from the input
    // corpus; serve against a PREVIOUSLY-written store with no retrain
    "ann_model_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (s, c, df) => {
        graft.operators.Ann.ivfPqModelWrite(
          graft.operators.Ann.ivfPqTrain(in(df),
            kCentroids = c.getOrElse("k_centroids", "16").toInt,
            subspaces = c.getOrElse("subspaces", "8").toInt,
            codes = c.getOrElse("codes", "256").toInt,
            centIters = c.getOrElse("cent_iters", "5").toInt,
            pqIters = c.getOrElse("pq_iters", "4").toInt,
            maxTrainVectors = trainCap(c),
            maxTrainBytes = trainBytes(c)),
          cfg(c, "path"), s)
        scala.None
      }),
    "ann_model_query" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (s, c, df) => {
        val (cents, cb) = graft.operators.Ann.ivfPqModelRead(s, cfg(c, "path"))
        val frame = in(df)
        val refine = c.getOrElse("refine", "0").toInt
        // `refine: R` — exact-rerank the PQ top-R with true vectors
        // (FAISS RefineFlat over a stored index)
        Some(if (refine > 0) graft.operators.Ann.ivfPqTopKRerank(frame,
          expr(c.getOrElse("query_where", "vec_id < 10")), cents, cb,
          k = c.getOrElse("k", "5").toInt,
          nProbe = c.getOrElse("probes", "2").toInt, refine = refine)
        else graft.operators.Ann.ivfPqTopKFrom(frame,
          expr(c.getOrElse("query_where", "vec_id < 10")), cents, cb,
          k = c.getOrElse("k", "5").toInt,
          nProbe = c.getOrElse("probes", "2").toInt))
      }),
    // OPQ model store (train-once/serve-later): learn rotation +
    // codebooks on the input corpus, persist as rot/ + codebooks/;
    // serve via `ann_topk` variant `opq` with `model_path`
    "opq_model_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (s, c, df) => {
        graft.operators.Ann.opqModelWrite(
          graft.operators.Ann.opqTrain(in(df),
            subspaces = c.getOrElse("subspaces", "8").toInt,
            codes = c.getOrElse("codes", "256").toInt,
            iters = c.getOrElse("train_iters", "4").toInt,
            opqIters = c.getOrElse("opq_iters", "5").toInt,
            seed = c.getOrElse("seed", "opq"),
            sampleRate = c.getOrElse("train_sample_rate", "1.0").toDouble,
            maxTrainVectors = trainCap(c),
            maxTrainBytes = trainBytes(c)),
          cfg(c, "path"), s)
        scala.None
      }),
    // incremental index maintenance: assign the input frame's vectors
    // against the index's frozen centroids and append into its cell
    // partitions — the daily-arrival path, no retrain, no index rewrite
    "ann_index_append" -> Entry(SectionIOSpec(DataFrameIO, None),
      (_, c, df) => {
        graft.operators.Ann.ivfIndexAppend(in(df), cfg(c, "path"))
        scala.None
      }),
    // persisted IVF-PQ index (codes partitioned by cell + both models):
    // the residual encode is paid once at build; queries partition-prune
    // to their probed cells and score from codes alone
    "ann_pq_index_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (_, c, df) => {
        graft.operators.Ann.ivfPqIndexWrite(in(df), cfg(c, "path"),
          kCentroids = c.getOrElse("k_centroids", "0").toInt,
          subspaces = c.getOrElse("subspaces", "8").toInt,
          codes = c.getOrElse("codes", "256").toInt,
          centIters = c.getOrElse("cent_iters", "5").toInt,
          pqIters = c.getOrElse("pq_iters", "4").toInt,
          seed = c.getOrElse("seed", "ivf"),
          sampleRate = c.getOrElse("train_sample_rate", "1.0").toDouble,
          maxTrainVectors = trainCap(c))
        scala.None
      }),
    "ann_pq_index_query" -> Entry(SectionIOSpec(DataFrameIO, DataFrameIO),
      (_, c, df) => Some(graft.operators.Ann.ivfPqIndexTopK(in(df),
        cfg(c, "path"), k = c.getOrElse("k", "5").toInt,
        nProbe = c.getOrElse("probes", "2").toInt))),

    // ---- destinations (SURVEY §2.3) ----
    // SQLite physical replication apply (D9): page rows → byte-identical
    // replica files, idempotent via the sidecar snapshot watermark
    "sqlite_replication_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (_, c, df) => {
        graft.sources.SqliteReplication.applySnapshots(in(df),
          cfg(c, "replica_dir"))
        scala.None
      }),
    "parquet_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (_, c, df) => { Sinks.parquet(in(df), cfg(c, "path"),
        c.getOrElse("truncate", "false").toBoolean); scala.None }),
    // Z-order clustered parquet write: every z_col's per-file range
    // narrow, so scans pruning on ANY of them skip most files
    "zorder_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (_, c, df) => {
        graft.sources.Layout.zorderParquet(in(df), cfg(c, "path"),
          cfg(c, "z_cols").split(",").map(_.trim).toSeq,
          targetFiles = cfg(c, "target_files").toInt,
          bits = c.getOrElse("bits", "8").toInt)
        scala.None
      }),
    // small-file compaction as a source-shaped maintenance command:
    // emits a one-row (path, files_before, files_after, rows) report
    "compact_files" -> Entry(SectionIOSpec(None, DataFrameIO),
      (s, c, _) => Some {
        val p = cfg(c, "path")
        val (b, a, r) = graft.sources.Layout.compactParquet(s, p,
          c.getOrElse("target_mb", "128").toInt)
        import s.implicits._
        Seq((p, b, a, r)).toDF("path", "files_before", "files_after", "rows")
      }),
    // co-located-join sink: hash-pre-partition a table on its join key at
    // write time so every later equi-join/agg on that key skips its
    // shuffle (see Sinks.bucketedParquet / BucketedJoinSpec)
    "bucketed_parquet_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (_, c, df) => {
        Sinks.bucketedParquet(in(df), cfg(c, "table"),
          cfg(c, "bucket_by").split(",").map(_.trim).toIndexedSeq,
          cfg(c, "num_buckets").toInt,
          c.getOrElse("truncate", "false").toBoolean,
          c.get("path"))
        scala.None
      }),
    "csv_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (_, c, df) => { Sinks.csv(in(df), cfg(c, "path"),
        c.getOrElse("truncate", "false").toBoolean); scala.None }),
    // keyed parquet UPSERT (MERGE): version-wins, bucket-scoped rewrites
    // the snapshot-isolated variant: readers resolve through the
    // manifest (upsert_snapshot_source) and never see a torn batch
    "upsert_snapshot_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (_, c, df) => {
        Sinks.upsertSnapshotByKey(in(df), cfg(c, "path"),
          cfg(c, "keys").split(",").toSeq.map(_.trim),
          cfg(c, "version_column"),
          c.getOrElse("buckets", "64").toInt)
        scala.None
      }),
    "upsert_snapshot_source" -> Entry(SectionIOSpec(None, DataFrameIO),
      (s, c, _) => Some(Sources.readUpsertSnapshot(s, cfg(c, "path")))),
    "upsert_parquet_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (_, c, df) => {
        Sinks.upsertParquetByKey(in(df), cfg(c, "path"),
          cfg(c, "keys").split(",").toSeq.map(_.trim),
          cfg(c, "version_column"),
          c.getOrElse("buckets", "64").toInt)
        scala.None
      }),
    "orc_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (_, c, df) => {
        in(df).write.mode(if (c.getOrElse("truncate", "false").toBoolean)
          "overwrite" else "append").orc(cfg(c, "path"))
        scala.None
      }),
    "arrow_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (_, c, df) => {
        graft.sources.ArrowInterchange.writeArrow(in(df), cfg(c, "path"),
          batchRows = c.getOrElse("batch_rows", "4096").toInt)
        scala.None
      }),
    "json_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (_, c, df) => {
        in(df).write.mode(if (c.getOrElse("truncate", "false").toBoolean)
          "overwrite" else "append").json(cfg(c, "path"))
        scala.None
      }),
    "jdbc_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (_, c, df) => { Sinks.jdbc(in(df), cfg(c, "url"), cfg(c, "table"),
        c.getOrElse("truncate", "false").toBoolean); scala.None }),
    "kafka_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (_, c, df) => { Sinks.kafkaJson(in(df), cfg(c, "brokers"), cfg(c, "topic")); scala.None }),
    // kafka over the pure-JDK wire client (no connector jar): rows are
    // kafkaEncode'd (key = origin, value = row JSON) then produced per
    // Spark task; the source side reads one task per partition
    // `dialect` (v0|v2|auto, default auto) picks the wire generation:
    // auto negotiates once per section run via ApiVersions, so the same
    // spec drives a legacy or a 4.x broker unchanged
    "kafka_wire_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (_, c, df) => {
        Sinks.kafkaWireWrite(Sinks.kafkaEncode(in(df)), cfg(c, "host"),
          cfg(c, "port").toInt, cfg(c, "topic"),
          graft.sources.KafkaWire.dialectFor(c.getOrElse("dialect", "auto"),
            cfg(c, "host"), cfg(c, "port").toInt))
        scala.None
      }),
    "kafka_wire_source" -> Entry(SectionIOSpec(None, DataFrameIO),
      (s, c, _) => Some(Sources.kafkaWireRead(s, cfg(c, "host"),
        cfg(c, "port").toInt, cfg(c, "topic"),
        c.getOrElse("start_offset", "0").toLong,
        graft.sources.KafkaWire.dialectFor(c.getOrElse("dialect", "auto"),
          cfg(c, "host"), cfg(c, "port").toInt)))),
    // the STREAMING form: the kafka-wire DataSource V2
    // (graft.sources.KafkaWireStreamProvider) — micro-batch offsets ride
    // Spark's checkpoint, backpressure via max_offsets_per_trigger
    "kafka_wire_stream_source" -> Entry(SectionIOSpec(None, DataFrameIO),
      (s, c, _) => Some {
        var r = s.readStream.format("kafka-wire")
          .option("host", cfg(c, "host"))
          .option("port", cfg(c, "port"))
          .option("topic", cfg(c, "topic"))
        Seq("starting_offsets", "max_offsets_per_trigger", "max_bytes",
            "dialect")
          .foreach(k => c.get(k).foreach(v => r = r.option(k, v)))
        r.load()
      }),
    // stage-and-COPY warehouse sinks: the statement sequence goes through
    // a JDBC url ("url") — in tests MemJdbc, in production the warehouse
    "snowflake_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (_, c, df) => {
        // the exec holds ONE session-scoped warehouse connection; close it
        // when the load ends or every section run leaks a live connection
        val exec = new WarehouseSinks.JdbcExec(cfg(c, "url"))
        try WarehouseSinks.snowflake(in(df), exec, cfg(c, "stage_dir"),
          c.getOrElse("truncate", "false").toBoolean)
        finally exec.close()
        scala.None
      }),
    "redshift_loader_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (_, c, df) => {
        val exec = new WarehouseSinks.JdbcExec(cfg(c, "url"))
        try WarehouseSinks.redshiftLoad(in(df), exec, cfg(c, "iam_role"),
          cfg(c, "region"), c.getOrElse("data_format", "CSV"),
          c.getOrElse("ignore_header", "false").toBoolean)
        finally exec.close()
        scala.None
      }),
    "file_destination" -> Entry(SectionIOSpec(Bin, None),
      (_, c, df) => { Sinks.fileBinary(in(df), cfg(c, "dir")); scala.None }),
    // Cross-daemon bridge halves (reference Inbound/Outbound section
    // classification, myceliald/src/scheduler.rs:263-268) — see
    // [[DaemonBridge]] for the split + at-least-once delivery contract.
    "outbound_bridge" -> Entry(SectionIOSpec(BinOrDataFrame, None),
      (_, c, df) => { DaemonBridge.publish(in(df), cfg(c, "dir")); scala.None }),
    "inbound_bridge" -> Entry(SectionIOSpec(None, BinOrDataFrame),
      (s, c, _) => {
        Seq("dir", "state_dir", "pipeline").foreach(cfg(c, _)) // loud misconfig
        Some(DaemonBridge.pendingFrame(s, c))
      }),
    // Streaming parquet sink: ack-ordered foreachBatch append (epoch
    // commits strictly after the write — the reference's ack contract),
    // drained to completion with AvailableNow so a spec "run" processes
    // everything currently available and checkpoints its position.
    // Runs SUPERVISED: a mid-run failure restarts the query with backoff
    // from the checkpoint (the reference scheduler's failed-task loop,
    // `myceliald/src/scheduler.rs:79-187`). `route_by_origin: true` fans
    // each micro-batch out to one parquet tree per origin value — the
    // reference's per-origin table routing inside a running stream.
    // Streaming incremental dedup — the daily-crawl flow in its natural
    // home: each micro-batch of incoming documents is deduped against a
    // STORED signature set (NearDup.writeReferenceSignatures /
    // dedup_signatures_destination builds it; the reference text itself
    // is never re-scanned), and the surviving rows append to the output.
    // Runs inside foreachBatch with ack-after-commit ordering; the
    // append itself is IDEMPOTENT on the doc id (idempotentParquetAppend
    // drops rows whose key already landed), so a crash between the write
    // and the epoch commit replays the batch WITHOUT duplicating
    // survivors — at-least-once delivery, effectively-once output. With
    // "absorb": "true", each batch's survivors are appended to the
    // signature store, so later batches dedup against earlier ones —
    // the complete daily-crawl loop in one running stream. The
    // batch-scoped dedup cache is dropped per epoch
    // (dedupAgainstStoredScoped) — a long-running stream must not leak
    // one persisted frame per micro-batch.
    "stream_dedup_against_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (s, c, df) => {
        // `index_path` serves each micro-batch from the v2 signature
        // index (partition-pruned probe, params self-describing);
        // `signatures` from the v1 store. Both keep the batch-scoped
        // cache lifecycle and the same absorb loop.
        val idxPath = c.get("index_path")
        val sig = if (idxPath.isDefined) c.getOrElse("signatures", "")
          else cfg(c, "signatures")
        val path = cfg(c, "path")
        val ckpt = cfg(c, "checkpoint")
        val idCol = c.getOrElse("id_column", "doc_id")
        val textCol = c.getOrElse("text_column", "text")
        val threshold = c.getOrElse("threshold", "0.2").toDouble
        def scoped(batch: org.apache.spark.sql.DataFrame)
                  (use: org.apache.spark.sql.DataFrame => Unit): Unit =
          idxPath match {
            case Some(p) => graft.operators.NearDup.dedupAgainstIndexScoped(
              batch, p, idCol = idCol, textCol = textCol,
              threshold = threshold)(use)
            case scala.None =>
              graft.operators.NearDup.dedupAgainstStoredScoped(batch, sig,
                idCol = idCol, textCol = textCol,
                ngram = c.getOrElse("ngram", "3").toInt,
                slots = c.getOrElse("slots", "32").toInt,
                rowsPerBand = c.getOrElse("rows_per_band", "4").toInt,
                threshold = threshold)(use)
          }
        val writer = graft.streaming.StreamingPipelines.ackSink(in(df), ckpt,
          org.apache.spark.sql.streaming.OutputMode.Append()) { (batch, _) =>
          scoped(batch) { survivors =>
            val kept = batch.join(survivors, Seq(idCol), "left_semi")
            Sinks.idempotentParquetAppend(kept, path, Seq(idCol))
            // "absorb": survivors join the signature store, so LATER
            // micro-batches dedup against THIS batch too — the full
            // daily-crawl loop (dedup -> keep -> become reference).
            // Runs after the idempotent append; both halves tolerate
            // replay, so a crash anywhere in between converges.
            if (c.getOrElse("absorb", "false").toBoolean)
              idxPath match {
                case Some(p) => graft.operators.NearDup.absorbIntoIndex(
                  kept, p, idCol = idCol, textCol = textCol)
                case scala.None =>
                  graft.operators.NearDup.absorbIntoSignatures(kept, sig,
                    idCol = idCol, textCol = textCol,
                    ngram = c.getOrElse("ngram", "3").toInt,
                    slots = c.getOrElse("slots", "32").toInt,
                    rowsPerBand = c.getOrElse("rows_per_band", "4").toInt)
              }
          }
        }
        val sup = new graft.streaming.StreamingSupervisor(s,
          restartBackoffMs = c.getOrElse("restart_backoff_ms", "3000").toLong,
          maxRestarts = c.getOrElse("max_restarts", "3").toInt)
        try {
          val handle = sup.supervise { () =>
            writer.trigger(
              org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
          }
          handle.await()
        } finally sup.close()
        scala.None
      }),
    // NOVELTY score-then-absorb — the other daily-crawl loop: each
    // micro-batch is scored against the signature store AS OF BEFORE the
    // batch (noveltyAgainstStored), the scores land through the
    // idempotent append, and only THEN does the batch absorb into the
    // store (becoming reference for later batches). ORDERING CONTRACT,
    // load-bearing for at-least-once replay: the idempotent score
    // append MUST precede the absorb — after a crash between absorb and
    // epoch commit, the replayed batch re-scores against a store that
    // now CONTAINS itself (novelty ~0), and only the key-idempotent
    // append discards those wrong replay scores in favor of the
    // pre-absorb truth that already landed. The absorb side is
    // replay-tolerant by its own ordering (`exact` guard written last —
    // see absorbIntoSignatures), so no doc double-absorbs. Crash sites
    // on both sides of the absorb are pinned by NoveltyAbsorbSpec via
    // the named failpoints below.
    // STREAMING online ANN serving: query vectors stream in, each
    // micro-batch is answered against the ON-DISK IVF index (probe
    // filter = partition prune — the nightly-build/all-day-serving
    // loop) through the ack-ordered sink; the (q_id, n_id) dedup key
    // upgrades at-least-once replay to effectively-once
    "ann_stream_query_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (s, c, df) => {
        val idx = cfg(c, "index")
        val path = cfg(c, "path")
        val k = c.getOrElse("k", "5").toInt
        val nProbe = c.getOrElse("probes", "2").toInt
        // `variant: ivf` (default) serves the exact on-disk IVF index;
        // `ivf_pq` serves a persisted IVF-PQ index (codes-only scan —
        // the probe never touches a corpus float)
        val serve: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
          c.getOrElse("variant", "ivf") match {
            case "ivf" => b => graft.operators.Ann.ivfIndexTopK(b, idx, k, nProbe)
            case "ivf_pq" =>
              b => graft.operators.Ann.ivfPqIndexTopK(b, idx, k, nProbe)
            case v => throw new IllegalArgumentException(
              s"ann_stream_query_destination: unknown variant '$v' " +
              "(ivf | ivf_pq)")
          }
        val writer = graft.streaming.StreamingPipelines.ackSink(in(df),
          cfg(c, "checkpoint"),
          org.apache.spark.sql.streaming.OutputMode.Append()) { (batch, _) =>
          graft.sources.Sinks.idempotentParquetAppend(serve(batch),
            path, Seq("q_id", "n_id"))
        }
        val sup = new graft.streaming.StreamingSupervisor(s,
          restartBackoffMs = c.getOrElse("restart_backoff_ms", "3000").toLong,
          maxRestarts = c.getOrElse("max_restarts", "3").toInt)
        try {
          val handle = sup.supervise { () =>
            writer.trigger(
              org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
          }
          handle.await()
        } finally sup.close()
        scala.None
      }),
    "stream_novelty_absorb_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (s, c, df) => {
        val sig = cfg(c, "signatures")
        val path = cfg(c, "path")
        val idCol = c.getOrElse("id_column", "doc_id")
        val textCol = c.getOrElse("text_column", "text")
        val ngram = c.getOrElse("ngram", "3").toInt
        val writer = graft.streaming.StreamingPipelines.ackSink(in(df),
          cfg(c, "checkpoint"),
          org.apache.spark.sql.streaming.OutputMode.Append()) { (batch, _) =>
          val scores = graft.operators.NearDup.noveltyAgainstStored(
            batch, sig, idCol = idCol, textCol = textCol, ngram = ngram)
          Sinks.idempotentParquetAppend(scores, path, Seq("doc_id"))
          Failpoints.hit("stream_novelty_absorb:pre_absorb")
          graft.operators.NearDup.absorbIntoSignatures(batch, sig,
            idCol = idCol, textCol = textCol, ngram = ngram,
            slots = c.getOrElse("slots", "32").toInt,
            rowsPerBand = c.getOrElse("rows_per_band", "4").toInt)
          Failpoints.hit("stream_novelty_absorb:post_absorb")
        }
        val sup = new graft.streaming.StreamingSupervisor(s,
          restartBackoffMs = c.getOrElse("restart_backoff_ms", "3000").toLong,
          maxRestarts = c.getOrElse("max_restarts", "3").toInt)
        try {
          val handle = sup.supervise { () =>
            writer.trigger(
              org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
          }
          handle.await()
        } finally sup.close()
        scala.None
      }),
    // Streaming kafka sink over the pure-JDK wire client: each micro-batch
    // is kafkaEncode'd (key = origin, value = row JSON) and produced inside
    // an ack-ordered foreachBatch (epoch commit strictly after the produce
    // returns). Delivery is at-least-once — v0 produce has no idempotence,
    // so a crash between produce and epoch commit replays the batch;
    // consumers dedup on (origin, content) or read through an idempotent
    // landing table, same contract as the reference's ack model.
    "kafka_wire_stream_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (s, c, df) => {
        val host = cfg(c, "host"); val port = cfg(c, "port").toInt
        val topic = cfg(c, "topic")
        // negotiated once at section compile, not per micro-batch
        val dialect = graft.sources.KafkaWire.dialectFor(
          c.getOrElse("dialect", "auto"), host, port)
        val writer = graft.streaming.StreamingPipelines.ackSink(in(df),
          cfg(c, "checkpoint"),
          org.apache.spark.sql.streaming.OutputMode.Append()) { (batch, _) =>
          Sinks.kafkaWireWrite(Sinks.kafkaEncode(batch), host, port, topic,
            dialect)
        }
        val sup = new graft.streaming.StreamingSupervisor(s,
          restartBackoffMs = c.getOrElse("restart_backoff_ms", "3000").toLong,
          maxRestarts = c.getOrElse("max_restarts", "3").toInt)
        try {
          val handle = sup.supervise { () =>
            writer.trigger(
              org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
          }
          handle.await()
        } finally sup.close()
        scala.None
      }),
    "stream_parquet_destination" -> Entry(SectionIOSpec(DataFrameIO, None),
      (s, c, df) => {
        val path = cfg(c, "path")
        val ckpt = cfg(c, "checkpoint")
        // "state_store": "rocksdb" moves stateful-operator state off the
        // executor heap (disk-backed per executor) — the 100×-active-keys
        // path; default keeps Spark's HDFS-backed in-memory store. The
        // provider is captured at query START, so it only needs to be set
        // for the duration of this section's run — restore the prior value
        // afterwards so later pipelines on the same session don't silently
        // inherit it
        val providerKey = "spark.sql.streaming.stateStore.providerClass"
        val priorProvider = s.conf.getOption(providerKey)
        c.get("state_store").foreach(p =>
          graft.streaming.StreamingPipelines.useStateStore(s, p))
        val frame = in(df)
        // "output_mode": "append" for upstream operators that REQUIRE
        // Append (flatMapGroupsWithState sessions); default Update keeps
        // per-epoch delta semantics for plain/aggregating streams
        val mode = c.getOrElse("output_mode", "update") match {
          case "append" => org.apache.spark.sql.streaming.OutputMode.Append()
          case "update" => org.apache.spark.sql.streaming.OutputMode.Update()
          case other => throw new IllegalArgumentException(
            s"output_mode must be append|update, got $other")
        }
        def writer =
          if (c.getOrElse("route_by_origin", "false").toBoolean)
            graft.streaming.StreamingPipelines.ackSinkByOrigin(frame, ckpt, mode) {
              (origin, slice, _) =>
                slice.write.mode("append").parquet(s"$path/$origin")
            }
          else
            graft.streaming.StreamingPipelines.ackSink(frame, ckpt, mode) {
              (batch, _) => batch.write.mode("append").parquet(path)
            }
        val sup = new graft.streaming.StreamingSupervisor(s,
          restartBackoffMs = c.getOrElse("restart_backoff_ms", "3000").toLong,
          maxRestarts = c.getOrElse("max_restarts", "3").toInt)
        try {
          val handle = sup.supervise { () =>
            writer.trigger(
              org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
          }
          handle.await()
        } finally {
          sup.close()
          if (c.contains("state_store")) priorProvider match {
            case Some(v) => s.conf.set(providerKey, v)
            case scala.None => s.conf.unset(providerKey)
          }
        }
        scala.None
      })
  )

  def ioOf(name: String): SectionIOSpec = entries.getOrElse(name,
    throw new IllegalArgumentException(s"unknown section type '$name'")).io
}

object PipelineCompiler {

  /** Compile one connected component to its terminal DataFrame (before any
    * destination write). Walks topologically; each section's compile fn
    * receives its upstream frame. Returns the last non-sink frame — useful
    * for tests and for running a pipeline without its destination. */
  def compileFrame(spark: SparkSession, spec: PipelineSpec): DataFrame = {
    spec.validate()
    var frames = Map.empty[String, Option[DataFrame]]
    var last: Option[DataFrame] = scala.None
    spec.topoOrder.foreach { id =>
      val sec = spec.section(id)
      val upstreamFrame = spec.upstream.getOrElse(id, Nil).headOption.flatMap(frames(_))
      val out = SectionRegistry.entries(sec.name).compile(spark, sec.config, upstreamFrame)
      frames += id -> out
      if (out.isDefined) last = out
    }
    last.getOrElse(throw new IllegalStateException("pipeline produced no frame"))
  }

  /** Run every connected component of a spec, sinks included. Bridge
    * cursor advances registered by `inbound_bridge` sections drain
    * strictly AFTER the component's sinks have executed (compile is
    * eager, so by the time compileFrame returns every destination in the
    * component has committed) — a sink failure leaves the cursor
    * untouched and the slice replays next round (at-least-once). */
  def run(spark: SparkSession, spec: PipelineSpec): Unit =
    spec.components.foreach { comp =>
      DaemonBridge.clearAcks()
      compileFrame(spark, comp)
      DaemonBridge.commitAcks()
    }
}
