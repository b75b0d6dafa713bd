package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column handling for training-data pipelines: image/audio/video
  * payloads ride as opaque `binary` columns with a typed metadata struct;
  * decode / feature-extract / resize / frame-sample are per-row narrow ops
  * over the bytes.
  *
  * IMAGE decode is REAL ([[decodeImageFeatures]]): `javax.imageio`'s
  * PNG/JPEG readers ship in every JDK, so that path runs actual codecs
  * inside the mapPartitions plumbing. Audio/video decode remains a
  * clearly-marked STUB (no such codecs in the JDK or this container) —
  * a deterministic function of the bytes with the same schema, batching
  * and partition flow as the real thing. Everything around either is the
  * real engineering: schema convention, batch shaping, partition sizing
  * so a 100 TB binary corpus flows through executors without OOM
  * (size-capped partitions, no driver collection, metadata pruned
  * independently of payloads).
  */
object Multimodal {

  /** Canonical multimodal schema: payload + metadata struct. `kind` ∈
    * image|audio|video|text; byte_len/content hash computed once at ingest
    * so later stages can filter/dedup on metadata without touching bytes
    * (column pruning keeps the binary out of the scan entirely). */
  def withMeta(df: DataFrame, payload: String, kind: String): DataFrame =
    df.withColumn("meta", struct(
      lit(kind).as("kind"),
      octet_length(col(payload)).cast("long").as("byte_len"),
      md5(col(payload)).as("content_md5")))

  /** Metadata-only projection — MUST prune the binary column from the scan
    * (verify with .explain: ReadSchema excludes the payload). */
  def metaOnly(df: DataFrame): DataFrame =
    df.drop(df.columns.filter(c => c == "payload" || c == "value").toIndexedSeq: _*)

  /** STUB decode: a real pipeline would decode image bytes here (e.g. JPEG
    * → HxWxC tensor) inside mapPartitions with a native codec. The
    * deterministic stand-in derives a fixed-length feature vector from the
    * md5 of the bytes — same shape, same batching, same partition flow as
    * the real thing, and reproducible for the oracle. */
  def stubDecodeFeatures(payload: Column, dims: Int = 4): Column =
    array((0 until dims).map { i =>
      // feature_i = hash60(md5(payload) || i) scaled to [0,1)
      (TextFunctions.hash60(concat(md5(payload), lit(i.toString))).cast("double")
        / lit(1152921504606846976.0 /* 2^60 */))
    }: _*)

  /** STUB resize: real impl re-encodes pixels; stand-in truncates bytes to
    * `targetBytes` preserving the "smaller payload out" contract. */
  def stubResize(payload: Column, targetBytes: Int): Column =
    substring(payload, 1, targetBytes)

  /** Frame sampling plumbing: one row per sampled frame index — the explode
    * pattern that turns a video row into frame rows without driver
    * involvement; the byte-slicing stands in for frame extraction. */
  def stubFrameSample(df: DataFrame, payload: String, nFrames: Int): DataFrame =
    df.withColumn("frame_idx", explode(sequence(lit(0), lit(nFrames - 1))))
      .withColumn("frame_bytes",
        substring(col(payload),
          (col("frame_idx") * (octet_length(col(payload)) / nFrames) + 1).cast("int"),
          greatest((octet_length(col(payload)) / nFrames).cast("int"), lit(1))))

  /** REAL image decode — `javax.imageio` (PNG/JPEG readers ship in every
    * JDK; zero new dependencies): iterator-to-iterator mapPartitions, the
    * codec machinery configured once per partition, rows streaming
    * through without materializing the partition. Emits one row per
    * input: `(idCol, width, height, sum_r, sum_g, sum_b)` — integer
    * per-channel pixel sums, EXACT, so downstream means
    * (`round(sum/(255·w·h), 6)`) follow the same Spark-vs-oracle round
    * convention as every other float in the engine. Undecodable payloads
    * yield `(-1, -1, null, null, null)` instead of failing the job —
    * corrupt bytes at row N of a 100 TB corpus must not kill the
    * pipeline; filter `width < 0` to quarantine them.
    * [[stubDecodeFeatures]] remains for codec-free environments. */
  def decodeImageFeatures(df: DataFrame, idCol: String = "img_id",
                          payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec init: ImageIO's default file-backed cache
        // would touch disk per row — disable once, decode in memory
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, bytes) =>
          val decoded =
            try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes)))
            catch { case _: Exception => scala.None }
          decoded match {
            case Some(img) =>
              val w = img.getWidth; val h = img.getHeight
              val px = img.getRGB(0, 0, w, h, null, 0, w)
              var r = 0L; var g = 0L; var b = 0L
              var i = 0
              while (i < px.length) {
                val p = px(i)
                r += (p >>> 16) & 0xff; g += (p >>> 8) & 0xff; b += p & 0xff
                i += 1
              }
              (id, w, h, Some(r), Some(g), Some(b))
            case scala.None =>
              (id, -1, -1, scala.None, scala.None, scala.None)
          }
        }
      }.toDF(idCol, "width", "height", "sum_r", "sum_g", "sum_b")
  }

  /** Per-channel MEANS from [[decodeImageFeatures]]'s exact sums, through
    * the engine-wide `round(x, 6)` convention (Spark and the SQL oracle
    * agree on it). */
  def imageChannelMeans(decoded: DataFrame): DataFrame = {
    val denom = lit(255.0) * col("width") * col("height")
    decoded.select(col(decoded.columns.head), col("width"), col("height"),
      round(col("sum_r") / denom, 6).as("mean_r"),
      round(col("sum_g") / denom, 6).as("mean_g"),
      round(col("sum_b") / denom, 6).as("mean_b"))
  }

  /** The shape a REAL codec integration takes: iterator-to-iterator
    * mapPartitions (the JVM analog of mapInPandas) — the codec is
    * initialized once per partition, rows stream through without
    * materializing the partition, and the output is a typed Dataset. The
    * decode body is the same clearly-marked stub as
    * [[stubDecodeFeatures]]. */
  def stubDecodePartitions(df: DataFrame, payload: String, dims: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(payload)).as[Array[Byte]].mapPartitions { rows =>
      // real pipeline: val codec = NativeCodec.open() — once per partition
      rows.map { bytes =>
        // STUB: md5-derived features standing in for decoded tensor stats
        val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        (bytes.length.toLong,
         (0 until dims).map(i => (d(i) & 0xff) / 255.0).toArray)
      }
    }.toDF("byte_len", "features")
  }

  /** Size-balanced repartition for binary corpora: target ~`targetMB` of
    * payload per partition so executors never hold multi-GB tasks. Uses a
    * count+avg estimate — one cheap metadata pass — then range-partitions
    * by a hash for even spread. */
  def repartitionBySize(df: DataFrame, payload: String, targetMB: Int): DataFrame = {
    val stats = df.agg(
      count(lit(1)).as("n"),
      avg(octet_length(col(payload))).as("avg_bytes")).head()
    val n = stats.getLong(0)
    val avgBytes = Option(stats.get(1)).map(_.toString.toDouble).getOrElse(0.0)
    val totalMB = n * avgBytes / 1e6
    val parts = math.max(1, math.ceil(totalMB / targetMB).toInt)
    df.repartition(parts)
  }
}
