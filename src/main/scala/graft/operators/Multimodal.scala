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
  * inside the mapPartitions plumbing. AUDIO decode is REAL too
  * ([[decodeAudioFeatures]]): WAV/PCM via `javax.sound.sampled`, also
  * JDK-native. VIDEO decode is REAL for AVI containers
  * ([[decodeVideoFeatures]]): the RIFF walk is pure JVM, raw `BI_RGB`
  * frames are summed straight off the payload and `MJPG` frames go
  * through the JDK JPEG codec; other codecs (H.264…) quarantine — those
  * genuinely don't ship in the JDK or this container, and the
  * deterministic stubs ([[stubDecodeFeatures]], [[stubFrameSample]])
  * remain for them. Everything around either is the
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
    * convention as every other float in the engine.
    *
    * Memory is BOUNDED per row, twice over:
    *  - dimensions come from the codec's HEADER probe
    *    (`ImageReader.getWidth/getHeight` read metadata, not pixels), so
    *    an image past `maxPixels` is quarantined BEFORE its raster is
    *    ever allocated — a 100 MP JPEG must not pin ~400 MB inside one
    *    task row;
    *  - pixel sums walk the raster in STRIPS through one reused ≤4 MB
    *    int buffer instead of a full-frame `getRGB` copy (which would
    *    double even an in-cap image's footprint).
    *
    * Undecodable payloads yield width/height `-1`, over-cap ones `-2` —
    * quarantined rows, never a failed job (corrupt bytes at row N of a
    * 100 TB corpus must not kill the pipeline); filter `width < 0` to
    * route them to a quarantine sink. [[stubDecodeFeatures]] remains for
    * codec-free environments. */
  def decodeImageFeatures(df: DataFrame, idCol: String = "img_id",
                          payloadCol: String = "payload",
                          maxPixels: Long = 16L * 1000 * 1000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec init: ImageIO's default file-backed cache
        // would touch disk per row — disable once, decode in memory
        javax.imageio.ImageIO.setUseCache(false)
        val corrupt = (-1, -1, scala.None, scala.None, scala.None)
        val oversized = (-2, -2, scala.None, scala.None, scala.None)
        def decode(bytes: Array[Byte]): (Int, Int, Option[Long], Option[Long], Option[Long]) =
          try {
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(bytes))
            try {
              val readers = javax.imageio.ImageIO.getImageReaders(iis)
              if (!readers.hasNext) corrupt
              else {
                val reader = readers.next()
                try {
                  reader.setInput(iis)
                  // header-only size probe — no raster exists yet
                  val w = reader.getWidth(0); val h = reader.getHeight(0)
                  if (w.toLong * h.toLong > maxPixels) oversized
                  else {
                    val img = reader.read(0)
                    // strip height sized so the conversion buffer stays
                    // ≤ ~4 MB regardless of image shape
                    val stripH = math.max(1, (1 << 20) / math.max(1, w))
                    val buf = new Array[Int](w * math.min(h, stripH))
                    var r = 0L; var g = 0L; var b = 0L
                    var y = 0
                    while (y < h) {
                      val rowsNow = math.min(stripH, h - y)
                      img.getRGB(0, y, w, rowsNow, buf, 0, w)
                      var i = 0; val n = w * rowsNow
                      while (i < n) {
                        val p = buf(i)
                        r += (p >>> 16) & 0xff; g += (p >>> 8) & 0xff; b += p & 0xff
                        i += 1
                      }
                      y += rowsNow
                    }
                    (w, h, Some(r), Some(g), Some(b))
                  }
                } finally reader.dispose()
              }
            } finally iis.close()
          } catch { case _: Exception => corrupt }
        rows.map { case (id, bytes) =>
          val (w, h, r, g, b) = decode(bytes)
          (id, w, h, r, g, b)
        }
      }.toDF(idCol, "width", "height", "sum_r", "sum_g", "sum_b")
  }

  /** REAL image RESIZE — decode (javax.imageio), NEAREST-NEIGHBOR
    * downsample to (targetW, targetH), re-encode PNG. Nearest-neighbor
    * deliberately: its pixel map `src(x·sw/tw, y·sh/th)` is exact integer
    * arithmetic, so a first-principles oracle can recompute the resized
    * raster independently (interpolating scalers bury float kernels in
    * codec internals no oracle can replay). PNG re-encode is lossless, so
    * decode(resize(x)) round-trips to exactly the mapped pixels —
    * mm_resize pins that. Undecodable rows quarantine as width −1 with a
    * null payload (pipeline keeps flowing); the pixel cap quarantines
    * oversized rasters as −2 like [[decodeImageFeatures]].
    *
    * @return `(id, payload (png or null), src_w, src_h, width, height)` */
  def resizeImages(df: DataFrame, targetW: Int, targetH: Int,
                   idCol: String = "img_id", payloadCol: String = "payload",
                   maxPixels: Long = 16L * 1000 * 1000): DataFrame = {
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        def resize(bytes: Array[Byte]): (Option[Array[Byte]], Int, Int, Int, Int) =
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            if (img == null) (scala.None, -1, -1, -1, -1)
            else if (img.getWidth.toLong * img.getHeight > maxPixels)
              (scala.None, -2, -2, -2, -2)
            else {
              val sw = img.getWidth; val sh = img.getHeight
              val out = new java.awt.image.BufferedImage(targetW, targetH,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              var y = 0
              while (y < targetH) {
                val sy = y * sh / targetH
                var x = 0
                while (x < targetW) {
                  out.setRGB(x, y, img.getRGB(x * sw / targetW, sy) & 0xffffff)
                  x += 1
                }
                y += 1
              }
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              (Some(bos.toByteArray), sw, sh, targetW, targetH)
            }
          } catch { case _: Exception => (scala.None, -1, -1, -1, -1) }
        rows.map { case (id, bytes) =>
          val (p, sw, sh, w, h) = resize(bytes)
          (id, p.orNull, sw, sh, w, h)
        }
      }.toDF(idCol, payloadCol, "src_w", "src_h", "width", "height")
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

  /** REAL audio decode — WAV/PCM via `javax.sound.sampled` (in every
    * JDK; zero new dependencies), the same iterator-to-iterator
    * mapPartitions shape as [[decodeImageFeatures]]. Emits one row per
    * input: `(idCol, sample_rate, channels, n_frames, sum_0, sumsq_0,
    * sum_1, sumsq_1)` — EXACT integer per-channel sample sums and
    * sums-of-squares (16-bit signed or 8-bit unsigned-recentered PCM,
    * mono or stereo), so downstream stats ([[audioStats]]'s duration and
    * RMS) follow the engine-wide `round(x, 6)` Spark-vs-oracle
    * convention. The decoded PCM STREAMS through one fixed frame buffer
    * — an hour-long WAV never materializes a second copy of itself in
    * the task. Undecodable or unsupported payloads yield
    * `sample_rate = -1` with null sums — quarantined, never a failed
    * job; filter `sample_rate < 0` to route them aside. */
  def decodeAudioFeatures(df: DataFrame, idCol: String = "audio_id",
                          payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        import javax.sound.sampled.{AudioFormat, AudioSystem}
        val none = scala.None: Option[Long]
        def quarantine(id: Long) = (id, -1, -1, -1L, none, none, none, none)
        rows.map { case (id, bytes) =>
          try {
            val ais = AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            try {
              val f = ais.getFormat
              val ch = f.getChannels
              val bits = f.getSampleSizeInBits
              val supported =
                (f.getEncoding == AudioFormat.Encoding.PCM_SIGNED && bits == 16) ||
                (f.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED && bits == 8)
              if (!supported || ch < 1 || ch > 2) quarantine(id)
              else {
                val frameSize = f.getFrameSize
                val big = f.isBigEndian
                // fixed-size streaming read: AudioInputStream returns
                // whole frames, so samples never split across reads
                val buf = new Array[Byte](frameSize * 4096)
                val sums = new Array[Long](2); val sumsq = new Array[Long](2)
                var frames = 0L
                var n = ais.read(buf)
                while (n > 0) {
                  var off = 0
                  while (off + frameSize <= n) {
                    var c = 0
                    while (c < ch) {
                      val s =
                        if (bits == 16) {
                          val b0 = buf(off + c * 2) & 0xff
                          val b1 = buf(off + c * 2 + 1) & 0xff
                          val v = if (big) (b0 << 8) | b1 else (b1 << 8) | b0
                          (v << 16) >> 16 // sign-extend
                        } else (buf(off + c) & 0xff) - 128 // recenter u8
                      sums(c) += s; sumsq(c) += s.toLong * s
                      c += 1
                    }
                    frames += 1
                    off += frameSize
                  }
                  n = ais.read(buf)
                }
                (id, math.round(f.getSampleRate), ch, frames,
                  Some(sums(0)), Some(sumsq(0)),
                  if (ch > 1) Some(sums(1)) else none,
                  if (ch > 1) Some(sumsq(1)) else none)
              }
            } finally ais.close()
          } catch { case _: Exception => quarantine(id) }
        }
      }.toDF(idCol, "sample_rate", "channels", "n_frames",
             "sum_0", "sumsq_0", "sum_1", "sumsq_1")
  }

  /** Duration and per-channel RMS from [[decodeAudioFeatures]]'s exact
    * sums, through the engine-wide `round(x, 6)` convention. Quarantined
    * rows (`sample_rate < 0`, where -1/-1 would otherwise fabricate a
    * 1-second duration) stay null across the board. */
  def audioStats(decoded: DataFrame): DataFrame = {
    def stat(c: Column) = when(col("sample_rate") < 0, lit(null)).otherwise(c)
    decoded.select(col(decoded.columns.head), col("sample_rate"),
      col("channels"), col("n_frames"),
      stat(round(col("n_frames").cast("double") / col("sample_rate"), 6))
        .as("duration_s"),
      stat(round(sqrt(col("sumsq_0").cast("double") / col("n_frames")), 6))
        .as("rms_0"),
      stat(round(sqrt(col("sumsq_1").cast("double") / col("n_frames")), 6))
        .as("rms_1"))
  }

  /** REAL video decode for AVI containers — the RIFF/AVI layout is a
    * public format walkable in pure JVM, and the two frame codings every
    * OpenCV/ffmpeg-written "raw" AVI uses are both JDK-decodable:
    * uncompressed `BI_RGB` DIBs (bottom-up BGR rows, 4-byte row stride —
    * plain arithmetic) and `MJPG` (each frame IS a JPEG, decoded by the
    * same `javax.imageio` codec as [[decodeImageFeatures]]). Anything
    * else (H.264 etc.) quarantines — those codecs genuinely don't ship
    * in the JDK, and a silent stub would be worse than an honest
    * `width = -1`.
    *
    * Emits one row per input video: `(idCol, width, height, n_frames,
    * frames_sampled, sum_r, sum_g, sum_b)` — EXACT integer channel sums
    * over every `sampleEvery`-th frame (the frame-sampling a training
    * pipeline does anyway, and what bounds work per row: a 10k-frame
    * clip at `sampleEvery = 30` decodes 334 frames, not 10k). Memory is
    * bounded per row the same two ways as images: MJPG frames get the
    * header-only pixel probe before any raster exists, BI_RGB frames are
    * summed row-by-row straight off the payload bytes with no pixel
    * copy at all, and a frame past `maxPixels` quarantines the video as
    * `-2`. Corrupt containers/frames yield `-1` — never a failed job. */
  def decodeVideoFeatures(df: DataFrame, idCol: String = "video_id",
                          payloadCol: String = "payload",
                          sampleEvery: Int = 1,
                          maxPixels: Long = 16L * 1000 * 1000): DataFrame = {
    require(sampleEvery >= 1, "sampleEvery must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        def u16(b: Array[Byte], o: Int): Int =
          (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
        def u32(b: Array[Byte], o: Int): Long =
          (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
          ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
        def fourcc(b: Array[Byte], o: Int): String =
          new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val none = scala.None: Option[Long]
        val corrupt = (-1, -1, -1L, -1L, none, none, none)
        val oversized = (-2, -2, -1L, -1L, none, none, none)
        def decode(b: Array[Byte]): (Int, Int, Long, Long, Option[Long], Option[Long], Option[Long]) =
          try {
            if (b.length < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ")
              corrupt
            else {
              // pass 1 — headers: find the FIRST 'vids' stream's strf
              // (BITMAPINFOHEADER) and remember its stream index, so movi
              // chunk ids ('NNdb'/'NNdc') can be matched to it
              var width = 0; var height = 0; var compression = ""
              var bitCount = 0
              var vidsIndex = -1
              var streamIdx = -1
              var moviOff = -1; var moviEnd = -1
              // depth cap: a crafted file nesting thousands of LISTs
              // must quarantine, not StackOverflowError (an Error the
              // corrupt-handler below would NOT catch) — real AVIs
              // nest 3 deep
              def walk(from: Int, to: Int, depth: Int): Unit = {
                if (depth > 16) return
                var p = from
                while (p + 8 <= to) {
                  val id = fourcc(b, p)
                  val sz = u32(b, p + 4)
                  if (sz < 0 || p + 8 + sz > to) return // truncated: stop
                  if (id == "LIST" && sz >= 4) {
                    val listType = fourcc(b, p + 8)
                    if (listType == "movi") {
                      if (moviOff < 0) { moviOff = p + 12; moviEnd = (p + 8 + sz).toInt }
                    } else if (listType == "strl") {
                      streamIdx += 1
                      walk(p + 12, (p + 8 + sz).toInt, depth + 1)
                    } else walk(p + 12, (p + 8 + sz).toInt, depth + 1)
                  } else if (id == "strh" && sz >= 8) {
                    if (fourcc(b, p + 8) == "vids" && vidsIndex < 0)
                      vidsIndex = streamIdx
                  } else if (id == "strf" && sz >= 40 &&
                             streamIdx == vidsIndex && width == 0) {
                    width = u32(b, p + 8 + 4).toInt
                    height = u32(b, p + 8 + 8).toInt // negative = top-down
                    bitCount = u16(b, p + 8 + 14)
                    val comp = u32(b, p + 8 + 16)
                    compression =
                      if (comp == 0L) "RGB " else fourcc(b, p + 8 + 16)
                  }
                  p += 8 + sz.toInt + (sz.toInt & 1) // chunks pad to even
                }
              }
              walk(12, b.length, 0)
              val topDown = height < 0
              val h = math.abs(height)
              if (moviOff < 0 || vidsIndex < 0 || width <= 0 || h <= 0) corrupt
              else if (width.toLong * h > maxPixels) oversized
              else if (compression != "RGB " && compression != "MJPG") corrupt
              else if (compression == "RGB " && bitCount != 24) corrupt
              else {
                val tag = f"$vidsIndex%02d"
                val stride = (width * 3 + 3) & ~3
                var frames = 0L; var sampled = 0L
                var r = 0L; var g = 0L; var bl = 0L
                var bad = false
                var p = moviOff
                while (p + 8 <= moviEnd && !bad) {
                  val id = fourcc(b, p)
                  val sz = u32(b, p + 4).toInt
                  if (sz < 0 || p + 8 + sz > moviEnd) bad = true
                  else {
                    if (id == "LIST") p += 12 // descend into 'rec ' groups
                    else {
                      if (id.startsWith(tag) && (id.endsWith("db") || id.endsWith("dc"))) {
                        if (frames % sampleEvery == 0) {
                          if (compression == "RGB ") {
                            if (sz < stride * h) bad = true
                            else {
                              // bottom-up BGR rows, summed in place — no
                              // pixel buffer at all
                              var y = 0
                              while (y < h) {
                                val row = p + 8 +
                                  (if (topDown) y else h - 1 - y) * stride
                                var x = 0
                                while (x < width) {
                                  bl += b(row + x * 3) & 0xff
                                  g += b(row + x * 3 + 1) & 0xff
                                  r += b(row + x * 3 + 2) & 0xff
                                  x += 1
                                }
                                y += 1
                              }
                            }
                          } else { // MJPG: the chunk is a JPEG
                            val img = javax.imageio.ImageIO.read(
                              new java.io.ByteArrayInputStream(b, p + 8, sz))
                            if (img == null) bad = true
                            else {
                              val w = img.getWidth; val ih = img.getHeight
                              val stripH = math.max(1, (1 << 20) / math.max(1, w))
                              val buf = new Array[Int](w * math.min(ih, stripH))
                              var y = 0
                              while (y < ih) {
                                val rowsNow = math.min(stripH, ih - y)
                                img.getRGB(0, y, w, rowsNow, buf, 0, w)
                                var i = 0; val n = w * rowsNow
                                while (i < n) {
                                  val px = buf(i)
                                  r += (px >>> 16) & 0xff; g += (px >>> 8) & 0xff
                                  bl += px & 0xff
                                  i += 1
                                }
                                y += rowsNow
                              }
                            }
                          }
                          sampled += 1
                        }
                        frames += 1
                      }
                      p += 8 + sz + (sz & 1)
                    }
                  }
                }
                if (bad || frames == 0) corrupt
                else (width, h, frames, sampled, Some(r), Some(g), Some(bl))
              }
            }
          } catch { case _: Exception => corrupt }
        rows.map { case (id, bytes) =>
          val (w, h, nf, ns, r, g, bl) = decode(bytes)
          (id, w, h, nf, ns, r, g, bl)
        }
      }.toDF(idCol, "width", "height", "n_frames", "frames_sampled",
             "sum_r", "sum_g", "sum_b")
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
