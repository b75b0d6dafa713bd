package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tokens: whitespace split, empty-safe") {
    val df = Seq("a  b\tc", "", "  ").toDF("t")
    val sizes = df.select(size(TextFunctions.tokens($"t"))).as[Int].collect()
    assert(sizes.toSeq == Seq(3, 0, 0))
  }

  test("charShingles") {
    val out = Seq("abcd").toDF("t")
      .select(TextFunctions.charShingles($"t", 3)).as[Seq[String]].head()
    assert(out == Seq("abc", "bcd"))
    val short = Seq("ab").toDF("t")
      .select(TextFunctions.charShingles($"t", 3)).as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("wordNgrams") {
    val out = Seq("a b c d").toDF("t")
      .select(TextFunctions.wordNgrams($"t", 3)).as[Seq[String]].head()
    assert(out == Seq("a b c", "b c d"))
  }

  test("minhash: identical docs get identical signatures; sig length k") {
    val df = Seq("the quick brown fox jumps", "the quick brown fox jumps", "completely different words here now")
      .toDF("t").withColumn("sig",
        TextFunctions.minhashSignature(TextFunctions.wordNgrams($"t", 2), 16))
    val sigs = df.select("sig").as[Seq[Long]].collect()
    assert(sigs(0).length == 16)
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
  }

  test("minhash signature similarity tracks jaccard") {
    // 90% overlapping shingle sets should agree on most slots
    val a = (1 to 20).map(i => s"tok$i").mkString(" ")
    val b = (3 to 22).map(i => s"tok$i").mkString(" ")
    val df = Seq(a, b).toDF("t").withColumn("sig",
      TextFunctions.minhashSignature(TextFunctions.wordNgrams($"t", 1), 64))
    val Array(sa, sb) = df.select("sig").as[Seq[Long]].collect()
    val agree = sa.zip(sb).count { case (x, y) => x == y }
    assert(agree > 32, s"expected >50% slot agreement, got $agree/64")
  }

  test("simhash: identical → distance 0, similar → small, disjoint → large") {
    val df = Seq("alpha beta gamma delta", "alpha beta gamma delta epsilon",
      "zz yy xx ww vv uu").toDF("t")
      .withColumn("sh", TextFunctions.simhash(TextFunctions.tokens($"t"), 48))
    val v = df.select("sh").as[Long].collect()
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(v(0), v(0)) == 0)
    assert(ham(v(0), v(1)) < ham(v(0), v(2)))
  }

  test("fingerprint is deterministic and order-sensitive") {
    val df = Seq("a b c", "a b c", "c b a").toDF("t")
      .withColumn("fp", TextFunctions.fingerprint(TextFunctions.tokens($"t")))
    val v = df.select("fp").as[Long].collect()
    assert(v(0) == v(1) && v(0) != v(2))
    assert(v.forall(x => x >= 0 && x < 2147483647L))
  }

  test("languageId picks the stopword-dominant language") {
    val df = Seq(
      "the cat sat of the mat and it is that",
      "der hund ist nicht ein der das und",
      "xyzzy qwerty plugh").toDF("t")
      .withColumn("lang", TextFunctions.languageId($"t"))
    assert(df.select("lang").as[String].collect().toSeq == Seq("en", "de", "und"))
  }

  test("quality features are in range") {
    val f = TextFunctions.qualityFeatures($"t")
    val row = Seq("The quick brown fox, it is a good dog! 123")
      .toDF("t").select(f.getField("quality_score"), f.getField("punct_ratio")).head()
    assert(row.getDouble(0) >= 0.0 && row.getDouble(0) <= 1.0)
    assert(row.getDouble(1) > 0.0 && row.getDouble(1) < 0.2)
  }

  test("cosine: identity 1, orthogonal 0, zero-norm safe") {
    val df = Seq(
      (Seq(1.0f, 2.0f), Seq(1.0f, 2.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 3.0f)),
      (Seq(0.0f, 0.0f), Seq(1.0f, 1.0f))).toDF("a", "b")
      .select(VectorFunctions.cosine($"a", $"b").as("c"))
    val v = df.as[Double].collect()
    assert(math.abs(v(0) - 1.0) < 1e-12)
    assert(math.abs(v(1)) < 1e-12)
    assert(v(2) == 0.0)
  }

  test("lshBucket: identical vectors share a bucket; buckets within range") {
    // dims (1,2,4): no ±1-combination sums to zero, so every projection is
    // nonzero and the antipodal vector complements every sign bit
    val df = Seq(Seq(1.0f, 2.0f, 4.0f), Seq(1.0f, 2.0f, 4.0f), Seq(-1.0f, -2.0f, -4.0f))
      .toDF("v").select(VectorFunctions.lshBucket($"v", 6, dims = 3).as("b"))
    val v = df.as[Long].collect()
    assert(v(0) == v(1))
    assert(v.forall(x => x >= 0 && x < 64))
    // antipodal vector flips every sign bit
    assert(v(2) == (~v(0) & 63))
  }

  test("WordNgramHashes equals hash60 over array_distinct(wordNgrams)") {
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "a a a a a", "one two", "", "  spaced   out   tokens here  ")
    val df = texts.toDF("t")
    val native = df.select(graft.functions.WordNgramHashes($"t", 3).as("h"))
      .as[Seq[Long]].collect().map(_.toSet)
    val composed = df.select(
        transform(array_distinct(TextFunctions.wordNgrams($"t", 3)),
          s => TextFunctions.hash60(s)).as("h"))
      .as[Seq[Long]].collect().map(_.toSet)
    assert(native.sameElements(composed))
  }

  test("WordNgramBuckets equals bucketed hash60 over counted 1..2-grams") {
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "a a a a a", "one two", "", "  spaced   out   tokens here  ")
    val df = texts.toDF("t")
    val native = df.select(graft.functions.WordNgramBuckets($"t", 2, 64).as("f"))
      .as[Seq[Int]].collect().map(_.sorted.toSeq)
    val composed = df.select(concat(
        transform(TextFunctions.wordNgrams($"t", 1),
          g => pmod(TextFunctions.hash60(g), lit(64L)).cast("int")),
        transform(TextFunctions.wordNgrams($"t", 2),
          g => pmod(TextFunctions.hash60(g), lit(64L)).cast("int"))).as("f"))
      .as[Seq[Int]].collect().map(_.sorted.toSeq)
    assert(native.toSeq == composed.toSeq)
    // multiplicity is the point: "a a a a a" has 5 identical unigrams + 4 bigrams
    val bag = df.select(graft.functions.WordNgramBuckets($"t", 2, 64).as("f"))
      .as[Seq[Int]].collect()(1)
    assert(bag.length == 9)
  }

  test("BpeTokenCount: codegen'd greedy encode matches the JVM loop; overlap resolves left-to-right") {
    val merges = Seq("a a", "a n", "b an")
    val df = Seq("aaa banana", "x", "", "  ").toDF("t")
    val got = df.select(graft.functions.BpeTokenCount($"t", merges).as("n"))
      .as[Int].collect().toSeq
    // "aaa" -> [aa, a] (leftmost-first on the overlapping run); "banana" -> [ban, an, a]
    assert(got == Seq(2 + 3, 1, 0, 0))
    val ranks = Bpe.rankMap(merges)
    assert(Bpe.encodeWord("aaa", ranks).toSeq == Seq("aa", "a"))
    assert(Bpe.encodeWord("banana", ranks).toSeq == Seq("ban", "an", "a"))
    // merge-all training update: every occurrence folds in one pass
    assert(Bpe.applyMerge(Array("a", "a", "a", "b", "a", "a"), "a", "a").toSeq
      == Seq("aa", "a", "b", "aa"))
  }

  test("stubDecodePartitions streams binary rows to typed features") {
    val df = Seq("alpha", "beta").toDF("t")
      .select(encode($"t", "UTF-8").as("payload"))
    val out = graft.operators.Multimodal.stubDecodePartitions(df, "payload", dims = 4)
    val rows = out.collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[Seq[Double]]("features").length == 4))
    assert(rows.map(_.getAs[Long]("byte_len")).sorted.sameElements(Array(4L, 5L)))
  }

  test("decodeImageFeatures: real javax.imageio decode reproduces known pixels; corrupt bytes quarantined") {
    // a 4x3 PNG with exactly known channel values: encode on the driver,
    // decode through the REAL codec path, check the exact integer sums
    val w = 4; val h = 3
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val r = 10 * x; val g = 20 * y; val b = x + y
      sr += r; sg += g; sb += b
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val df = Seq((1L, bos.toByteArray),
        (2L, "definitely not an image".getBytes("UTF-8")))
      .toDF("img_id", "payload").repartition(2)
    val out = graft.operators.Multimodal.decodeImageFeatures(df)
      .orderBy("img_id").collect()
    assert(out(0).getInt(1) == w && out(0).getInt(2) == h)
    assert((out(0).getLong(3), out(0).getLong(4), out(0).getLong(5)) == ((sr, sg, sb)))
    // corrupt payload: quarantined, not thrown
    assert(out(1).getInt(1) == -1 && out(1).isNullAt(3))
    // means ride the engine-wide round(_, 6) convention
    val means = graft.operators.Multimodal.imageChannelMeans(
      graft.operators.Multimodal.decodeImageFeatures(df))
      .orderBy("img_id").collect()
    assert(math.abs(means(0).getDouble(3) -
      math.round(sr / (255.0 * w * h) * 1e6) / 1e6) < 1e-12)
    assert(means(1).isNullAt(3))
  }

  test("decodeImageFeatures: images past the pixel cap are quarantined before their raster allocates") {
    // the cap is checked from the codec's HEADER probe — a real 100 MP
    // image would prove nothing more than this 40x30 one with a 1000-px
    // cap, and the code path (probe → compare → skip read) is identical
    val w = 40; val h = 30
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val df = Seq((1L, bos.toByteArray),
        (2L, "garbage".getBytes("UTF-8")))
      .toDF("img_id", "payload")
    val out = graft.operators.Multimodal
      .decodeImageFeatures(df, maxPixels = 1000)
      .orderBy("img_id").collect()
    // oversized: -2 marker (distinct from corrupt -1), sums null
    assert(out(0).getInt(1) == -2 && out(0).getInt(2) == -2 && out(0).isNullAt(3))
    assert(out(1).getInt(1) == -1)
    // the same image under a permissive cap decodes normally (all-black
    // TYPE_INT_RGB: exact zero sums)
    val ok = graft.operators.Multimodal
      .decodeImageFeatures(df, maxPixels = 10000)
      .orderBy("img_id").collect()
    assert(ok(0).getInt(1) == w && ok(0).getLong(3) == 0L)
  }

  test("decodeAudioFeatures: real javax.sound WAV decode reproduces known samples; corrupt quarantined") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // stereo 16-bit LE WAV with closed-form samples
    val frames = 200; val ch = 2
    def sample(i: Int, c: Int): Int = ((i * 13 + c * 5 + 1) % 65536) - 32768
    val raw = new Array[Byte](frames * ch * 2)
    var se = Array(0L, 0L); var sq = Array(0L, 0L)
    for (i <- 0 until frames; c <- 0 until ch) {
      val v = sample(i, c)
      se(c) += v; sq(c) += v.toLong * v
      raw((i * ch + c) * 2) = (v & 0xff).toByte
      raw((i * ch + c) * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      22050f, 16, ch, ch * 2, 22050f, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, frames.toLong),
      AudioFileFormat.Type.WAVE, bos)
    val df = Seq((1L, bos.toByteArray),
        (2L, "not a wav".getBytes("UTF-8")))
      .toDF("audio_id", "payload").repartition(2)
    val out = graft.operators.Multimodal.decodeAudioFeatures(df)
      .orderBy("audio_id").collect()
    assert(out(0).getInt(1) == 22050 && out(0).getInt(2) == 2 &&
      out(0).getLong(3) == frames.toLong)
    assert((out(0).getLong(4), out(0).getLong(5)) == ((se(0), sq(0))))
    assert((out(0).getLong(6), out(0).getLong(7)) == ((se(1), sq(1))))
    // corrupt payload: quarantined, not thrown
    assert(out(1).getInt(1) == -1 && out(1).isNullAt(4))
    // stats ride the engine-wide round(_, 6) convention
    val stats = graft.operators.Multimodal.audioStats(
      graft.operators.Multimodal.decodeAudioFeatures(df))
      .orderBy("audio_id").collect()
    assert(math.abs(stats(0).getDouble(4) -
      math.round(frames / 22050.0 * 1e6) / 1e6) < 1e-12)
    assert(math.abs(stats(0).getDouble(5) -
      math.round(math.sqrt(sq(0).toDouble / frames) * 1e6) / 1e6) < 1e-12)
    assert(stats(1).isNullAt(4))
  }

  test("decodeVideoFeatures: MJPG frames decode through the JDK JPEG codec; unsupported codecs and oversized frames quarantine") {
    // MJPG AVI built by hand: same RIFF skeleton as the raw-DIB oracle
    // fixture, but each 00dc chunk is a REAL JPEG from ImageIO. JPEG is
    // lossy, so the expected sums come from decoding the same JPEG bytes
    // driver-side — the assertion is distributed-decode == local-decode,
    // pinning the plumbing (chunk walk, sampling, strip sums) around the
    // codec rather than the codec itself.
    def u16b(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def u32b(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def cc(s: String) = s.getBytes("US-ASCII")
    def chunk(id: String, body: Array[Byte]) =
      cc(id) ++ u32b(body.length) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(typ: String, body: Array[Byte]) = chunk("LIST", cc(typ) ++ body)
    val w = 24; val h = 16; val nFrames = 3
    def avi(fourccComp: String, frames: Seq[Array[Byte]]): Array[Byte] = {
      val avih = u32b(33333) ++ u32b(0) ++ u32b(0) ++ u32b(0) ++
        u32b(frames.size) ++ u32b(0) ++ u32b(1) ++ u32b(0) ++ u32b(w) ++
        u32b(h) ++ Array.fill[Byte](16)(0)
      val strh = cc("vids") ++ cc(fourccComp) ++ Array.fill[Byte](48)(0)
      val strf = u32b(40) ++ u32b(w) ++ u32b(h) ++ u16b(1) ++ u16b(24) ++
        cc(fourccComp).take(4) ++ u32b(0) ++ u32b(0) ++ u32b(0) ++
        u32b(0) ++ u32b(0)
      val hdrl = list("hdrl", chunk("avih", avih) ++
        list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
      val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
      val body = cc("AVI ") ++ hdrl ++ movi
      cc("RIFF") ++ u32b(body.length) ++ body
    }
    val jpegs = (0 until nFrames).map { f =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (((x * 9 + f * 31) % 256) << 16) |
          (((y * 5 + f * 7) % 256) << 8) | ((x + y + f) % 256))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    // driver-side expectation: decode the same JPEGs for sampled frames
    var er = 0L; var eg = 0L; var eb = 0L
    for (f <- 0 until nFrames if f % 2 == 0) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(jpegs(f)))
      for (y <- 0 until h; x <- 0 until w) {
        val p = img.getRGB(x, y)
        er += (p >>> 16) & 0xff; eg += (p >>> 8) & 0xff; eb += p & 0xff
      }
    }
    val df = Seq(
      (1L, avi("MJPG", jpegs)),
      (2L, avi("H264", jpegs)), // codec the JDK genuinely lacks
      (3L, "RIFF".getBytes ++ u32b(4) ++ cc("WAVE"))) // RIFF, not AVI
      .toDF("video_id", "payload").repartition(2)
    val out = graft.operators.Multimodal
      .decodeVideoFeatures(df, sampleEvery = 2)
      .orderBy("video_id").collect()
    assert(out(0).getInt(1) == w && out(0).getInt(2) == h)
    assert(out(0).getLong(3) == nFrames.toLong && out(0).getLong(4) == 2L)
    assert((out(0).getLong(5), out(0).getLong(6), out(0).getLong(7)) ==
      ((er, eg, eb)))
    assert(out(1).getInt(1) == -1 && out(1).isNullAt(5)) // H264 → quarantine
    assert(out(2).getInt(1) == -1) // non-AVI RIFF → quarantine
    // frame past the pixel cap: -2 marker, probed from the header before
    // any raster allocates (same contract as images)
    val capped = graft.operators.Multimodal
      .decodeVideoFeatures(Seq((9L, avi("MJPG", jpegs))).toDF("video_id", "payload"),
        sampleEvery = 1, maxPixels = 100)
      .collect()
    assert(capped(0).getInt(1) == -2 && capped(0).isNullAt(5))
    // adversarial nesting: thousands of LIST levels must quarantine via
    // the depth cap, not StackOverflowError the task cannot catch
    var deep: Array[Byte] = cc("hdrl")
    (1 to 5000).foreach { _ => deep = chunk("LIST", cc("strl") ++ deep) }
    val bomb = cc("RIFF") ++ u32b(deep.length + 4) ++ cc("AVI ") ++ deep
    val deepOut = graft.operators.Multimodal
      .decodeVideoFeatures(Seq((10L, bomb)).toDF("video_id", "payload"))
      .collect()
    assert(deepOut(0).getInt(1) == -1)
  }

  test("multiple ArrayDotProducts in one projection survive CODEGEN_ONLY") {
    // l2Distance computes three dot products → three accumulator vars in one
    // generated method; a hard-coded local name would fail janino compile.
    // CODEGEN_ONLY + fallback=false turns that failure into an exception.
    val conf = spark.conf
    val prevMode = conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = conf.getOption("spark.sql.codegen.fallback")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),
                   (Seq(0.5f, -1.0f), Seq(2.0f, 2.0f))).toDF("a", "b")
      val rows = df.select(
        VectorFunctions.dot($"a", $"b").as("d"),
        VectorFunctions.l2Distance($"a", $"b").as("l2"),
        VectorFunctions.dot($"a", $"a").as("aa")).collect()
      assert(rows.length == 2)
      assert(math.abs(rows(0).getDouble(0) - 11.0) < 1e-12)  // 1*3 + 2*4
      assert(math.abs(rows(0).getDouble(2) - 5.0) < 1e-12)   // 1 + 4
      assert(math.abs(rows(1).getDouble(1) - math.sqrt(1.5 * 1.5 + 3.0 * 3.0)) < 1e-12)
    } finally {
      prevMode.fold(conf.unset("spark.sql.codegen.factoryMode"))(
        conf.set("spark.sql.codegen.factoryMode", _))
      prevFallback.fold(conf.unset("spark.sql.codegen.fallback"))(
        conf.set("spark.sql.codegen.fallback", _))
    }
  }

  test("ann lsh recall vs brute force at sf0.001") {
    val brute = graft.Queries.all.toMap.apply("ann_topk")
      .fn(spark, TestSpark.sf).select("q_id", "n_id")
      .as[(Long, Long)].collect().toSet
    val lsh = graft.Queries.all.toMap.apply("ann_lsh_topk")
      .fn(spark, TestSpark.sf).select("q_id", "n_id")
      .as[(Long, Long)].collect().toSet
    // 4-bit LSH over RANDOM synthetic vectors (near-neighbors at cosine
    // ~0.3-0.5): same-bucket probability is inherently low; this checks the
    // bucketing does better than nothing, not production recall.
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.05, s"LSH recall $recall too low")
    // the multi-table variant must dominate the single-table recall
    val multi = graft.Queries.all.toMap.apply("ann_lsh_multi")
      .fn(spark, TestSpark.sf).select("q_id", "n_id")
      .as[(Long, Long)].collect().toSet
    val recallMulti = (brute & multi).size.toDouble / brute.size
    assert(recallMulti >= recall,
      s"multi-table recall $recallMulti below single-table $recall")
    assert(recallMulti >= 0.2, s"multi-table recall $recallMulti too low")
    // IVF probes 2 of 16 cells — sanity: returns candidates and overlaps
    // the brute-force set at all (exactness is the sf0.01 oracle's job)
    val ivf = graft.Queries.all.toMap.apply("ann_ivf_topk")
      .fn(spark, TestSpark.sf).select("q_id", "n_id")
      .as[(Long, Long)].collect().toSet
    assert(ivf.nonEmpty)
    assert((brute & ivf).nonEmpty, "IVF found no true neighbors at all")
  }

  test("randomProject: deterministic, right arity, JL-preserves self-similarity") {
    import org.apache.spark.sql.functions.col
    val e = graft.Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"),
        VectorFunctions.randomProject(col("embedding"), 16, 64).as("p"))
    val a = e.orderBy(col("vec_id")).limit(5).as[(Long, Seq[Double])].collect()
    val b = e.orderBy(col("vec_id")).limit(5).as[(Long, Seq[Double])].collect()
    assert(a.sameElements(b), "projection must be deterministic")
    assert(a.forall(_._2.length == 16))
    // cosine(proj(v), proj(v)) = 1 trivially; the useful JL sanity is that
    // DIFFERENT vectors do not collapse onto one projected point
    assert(a.map(_._2).distinct.length == a.length,
      "distinct vectors must stay distinct after projection")
  }

  test("BloomMightContainAny: codegen and interpreted agree; null-safe; no udf") {
    val hits = Seq(11L, 22L, 33L)
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    hits.foreach(bf.putLong)
    val bfB = spark.sparkContext.broadcast(bf)
    val df = Seq(
      (1L, Seq(1L, 2L, 22L)),   // one hit
      (2L, Seq(1L, 2L, 3L)),    // no hit (w.h.p. at this fpp/size)
      (3L, Seq.empty[Long]),    // empty -> false
      (4L, hits)                // all hits
    ).toDF("id", "gs")
      .union(Seq((5L, null.asInstanceOf[Seq[Long]])).toDF("id", "gs"))
    def run(d: org.apache.spark.sql.DataFrame) = d
      .select($"id", BloomMightContainAny($"gs", bfB).as("m"))
      .orderBy($"id").as[(Long, Boolean)].collect().toSeq
    val got = run(df)
    assert(got == Seq(1L -> true, 2L -> false, 3L -> false, 4L -> true,
      5L -> false), got)
    // interpreted fallback (codegen off) must agree bit-for-bit
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run(df) == got)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
