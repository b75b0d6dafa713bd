package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Unit-level checks for the inverted-index n-gram Jaccard path; the
  * whole-corpus result is oracle-verified as `dd_ngram_jaccard`. */
class NearDupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("ngramJaccardPairs: exact jaccard on a known near-dup, unrelated doc excluded") {
    // doc 1/2 share 2 of their shingles; doc 3 shares none
    val d = docs(
      1L -> "a b c d e",   // shingles: abc bcd cde
      2L -> "a b c d x",   // shingles: abc bcd cdx  -> inter 2, union 4
      3L -> "p q r s t")
    val got = NearDup.ngramJaccardPairs(d, threshold = 0.2)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 0.5)))
  }

  test("ngramJaccardPairs: stop-shingle cap drops boilerplate-only pairs, keeps exact jaccard") {
    // every doc shares the boilerplate shingle "x y z"; docs 1/2 also share
    // real content. With maxPosting = 2 the boilerplate posting (df = 4) is
    // excluded from candidates: 1-2 survive via their content shingles and
    // their jaccard still counts the boilerplate hash; 3-4 (boilerplate-only
    // overlap) are not reported.
    val d = docs(
      1L -> "x y z a b c",
      2L -> "x y z a b c",
      3L -> "x y z p q r",
      4L -> "x y z u v w")
    val got = NearDup.ngramJaccardPairs(d, threshold = 0.01, maxPosting = 2)
      .as[(Long, Long, Double)].collect().toSet
    assert(got.map(p => (p._1, p._2)) == Set((1L, 2L)))
    // identical docs: jaccard exactly 1 even though one shared shingle was
    // a stop shingle for candidate purposes
    assert(got.head._3 == 1.0)
  }

  test("simhashPairs at the mass-duplicate boundary: capped pairs under-" +
    "enumerate but cluster identically; an unhit cap is pigeonhole-exact") {
    // the sf1-rehearsal-twin shape: one template duplicated with tiny word
    // substitutions — majority-vote signatures barely move, so every copy
    // shares simhash bands and the TRUE pair set is quadratic in the
    // copy count. That is the documented boundary of the capped
    // generator: past maxBucket it star-compresses (pair-level recall
    // drops BY DESIGN; at 100 TB a quadratic pair dump is not a result
    // anyone can consume), while the CLUSTERING answer — what dedup
    // consumes — must be exactly the unbounded one.
    // three template VARIANTS (each substitutes its own token at its own
    // position): a dominant one with 16 identical copies — an
    // identical-signature GROUP over the 8-cap, so its within-group
    // pairs star-compress (the pre-banding collapse path) — plus two
    // 4-copy variants within hamming range of it, whose cross pairs the
    // over-cap group forces down the rep-to-rep compressed route.
    val template = "the quick brown fox jumps over the lazy dog again and " +
      "again today tomorrow forever under a pale sky near the old bridge"
    val copies = (0L until 24L).map { i =>
      val v = if (i < 16L) 0 else if (i < 20L) 1 else 2
      val words = template.split(" ")
      words(words.length - 1 - v) = s"m$v"
      i -> words.mkString(" ")
    } :+ (100L -> ("completely unrelated text about spark catalyst plans " +
      "optimizing distributed columnar execution engines at scale"))
    val d = docs(copies: _*)
    // pigeonhole truth (the clique-covering key set guarantees every
    // pair at hamming <= 3 shares a band-pair key — see simhashPairs'
    // covering argument): ALL pairs at hamming <= 3, by brute self-join
    val sh = NearDup.simhashSignatures(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truth = (for {
      a <- sh.keys; b <- sh.keys if a < b
      if java.lang.Long.bitCount(sh(a) ^ sh(b)) <= 3
    } yield (a, b)).toSet
    assert(truth.size > 24, s"fixture must have a quadratic clique: ${truth.size}")
    // UNHIT cap -> exact pigeonhole enumeration, hamming values included
    // (the duplicate groups exercise the identical-signature collapse and
    // its member fan-back: within-group pairs at hamming 0, cross-group
    // member products inheriting the representatives' exact distance)
    val truthH = (for {
      a <- sh.keys; b <- sh.keys if a < b
      h = java.lang.Long.bitCount(sh(a) ^ sh(b)) if h <= 3
    } yield (a, b, h.toLong)).toSet
    val exactH = NearDup.simhashPairs(d, maxBucket = 10000)
      .select("a_id", "b_id", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    val exact = exactH.map(t => (t._1, t._2))
    assert(exactH == truthH, "with every group and bucket under the cap " +
      "the (pair, hamming) set must be the full pigeonhole truth")
    assert(exact == truth, "with every bucket under the cap the pair set " +
      "must be the full pigeonhole truth")
    // HIT cap (star compression) -> fewer pairs, SAME clustering
    val capped = NearDup.simhashPairs(d, maxBucket = 8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(capped.size < truth.size,
      "the cap must bite on the mass-duplicate bucket")
    def clusters(pairs: Set[(Long, Long)]) = Clustering.connectedComponents(
        d.select($"doc_id".as("id")),
        pairs.toSeq.toDF("a_id", "b_id"))
      .as[(Long, Long)].collect().groupBy(_._2).values
      .map(_.map(_._1).sorted.toSeq).toSet
    assert(clusters(capped) == clusters(truth),
      "star compression must preserve the clustering answer exactly")
  }

  test("dedupAgainstReference: exact + near dups of the reference dropped, fresh kept") {
    val long = (1 to 30).map(i => s"w$i").mkString(" ")
    val longVariant = (1 to 30).map(i => if (i == 15) "CHANGED" else s"w$i").mkString(" ")
    val ref = docs(
      1L -> long,
      2L -> "x") // shorter than one shingle: only the md5 guard can catch it
    val inc = docs(
      10L -> long,         // exact dup
      11L -> longVariant,  // near dup: 25/31 shingles shared, jaccard ~0.81
      12L -> "p q r s t u v w completely fresh content here",
      13L -> "x",          // exact dup of the short reference doc
      14L -> "y")          // fresh short doc
    val got = NearDup.dedupAgainstReference(ref, inc)
      .as[Long].collect().toSet
    assert(got == Set(12L, 14L))
    spark.catalog.clearCache()
  }

  test("dedupAgainstReference: mass-duplicated reference template handled once") {
    // 50 identical reference docs (boilerplate) — pre-dedup collapses them
    // to one representative, so the band join sees ONE ref row per band
    val ref = (1L to 50L).map(i => (i, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"))
      .toDF("doc_id", "text")
    val inc = docs(
      100L -> "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", // dup of the template
      101L -> "fresh a b c d e f g h i j")
    val got = NearDup.dedupAgainstReference(ref, inc).as[Long].collect().toSet
    assert(got == Set(101L))
    spark.catalog.clearCache()
  }

  test("stored signatures answer identically to the inline reference pass") {
    val long = (1 to 30).map(i => s"w$i").mkString(" ")
    val longVariant = (1 to 30).map(i => if (i == 15) "CHANGED" else s"w$i").mkString(" ")
    val ref = docs(1L -> long, 2L -> "x")
    val inc = docs(
      10L -> long, 11L -> longVariant,
      12L -> "p q r s t u v w completely fresh content here",
      13L -> "x", 14L -> "y")
    val inline = NearDup.dedupAgainstReference(ref, inc).as[Long].collect().toSet
    spark.catalog.clearCache()
    val path = java.nio.file.Files.createTempDirectory("sigstore").toString
    NearDup.writeReferenceSignatures(ref, path)
    // the daily-crawl shape: subsequent batches dedup against the STORE —
    // the reference frame is not touched again
    val stored = NearDup.dedupAgainstStored(inc, path).as[Long].collect().toSet
    assert(stored == inline && stored == Set(12L, 14L))
    // store layout: exact md5s, shingle hashes, bands — all present
    for (part <- Seq("exact", "hashes", "bands"))
      assert(new java.io.File(path, part).exists(), s"missing $part")
    // a second batch reuses the same store
    val inc2 = docs(20L -> long, 21L -> "another genuinely new document text")
    assert(NearDup.dedupAgainstStored(inc2, path)
      .as[Long].collect().toSet == Set(21L))
    spark.catalog.clearCache()
  }

  test("absorbIntoSignatures: survivors become reference; re-absorption is a no-op") {
    val base = (1 to 30).map(i => s"r$i").mkString(" ")
    val path = java.nio.file.Files.createTempDirectory("sigabsorb").toString
    NearDup.writeReferenceSignatures(docs(1L -> base), path)
    // day 1: two new docs survive and are ABSORBED
    val day1 = docs(
      10L -> ((1 to 30).map(i => s"a$i").mkString(" ")),
      11L -> "one two three four five six seven")
    assert(NearDup.dedupAgainstStored(day1, path)
      .as[Long].collect().toSet == Set(10L, 11L))
    spark.catalog.clearCache()
    NearDup.absorbIntoSignatures(day1, path)
    // day 2: an exact and a NEAR dup of day 1's docs are now dropped —
    // the store learned yesterday's corpus without a rebuild
    val day2 = docs(
      20L -> ((1 to 30).map(i => s"a$i").mkString(" ")), // exact of 10
      21L -> ((1 to 30).map(i => if (i == 3) "X" else s"a$i").mkString(" ")), // near of 10
      22L -> "completely different new words here today")
    assert(NearDup.dedupAgainstStored(day2, path)
      .as[Long].collect().toSet == Set(22L))
    spark.catalog.clearCache()
    // replay safety: absorbing the SAME batch again adds nothing
    val exactBefore = spark.read.parquet(s"$path/exact").count()
    val hashesBefore = spark.read.parquet(s"$path/hashes").count()
    NearDup.absorbIntoSignatures(day1, path)
    assert(spark.read.parquet(s"$path/exact").count() == exactBefore)
    assert(spark.read.parquet(s"$path/hashes").count() == hashesBefore)
  }

  test("ngramContainmentPairs: excerpt scores ~1 toward its host, host stays low") {
    val excerpt = "alpha beta gamma delta epsilon zeta"
    val host = s"intro words before the passage $excerpt and then a very " +
      "long tail of additional unrelated content stretching the document " +
      "much further onward with many extra words to dilute the overlap"
    val d = docs(1L -> host, 2L -> excerpt)
    val got = NearDup.ngramContainmentPairs(d, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
      .map { case (s, t, c) => (s, t) -> c }.toMap
    // every 3-gram of the excerpt appears in the host → containment 1.0
    assert(got((2L, 1L)) == 1.0, s"excerpt→host should be 1.0, got $got")
    // host→excerpt is diluted far below the threshold → directed row absent
    assert(!got.contains((1L, 2L)),
      "host→excerpt containment should fall under the 0.5 threshold")
  }

  test("noveltyScores: fully-seen 0, fully-novel 1e6, mixed exact, gram-less null") {
    val ref = docs(100L -> "alpha beta gamma delta")
    val tgt = docs(
      1L -> "alpha beta gamma delta", // every 3-gram in the reference
      2L -> "wholly novel words never seen anywhere", // none in reference
      // 4 grams: "alpha beta gamma" and "beta gamma delta" seen; the two
      // grams crossing into "epsilon zeta" are novel → 2/4
      3L -> "alpha beta gamma delta epsilon zeta",
      4L -> "too short") // < 3 tokens → no grams
    val got = NearDup.noveltyScores(tgt, ref)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got(1L) == ((2L, 0L, 0L)), s"fully-seen doc: ${got(1L)}")
    assert(got(2L)._2 == got(2L)._1 && got(2L)._3 == 1000000L,
      s"fully-novel doc: ${got(2L)}")
    assert(got(3L) == ((4L, 2L, 500000L)), s"half-novel doc: ${got(3L)}")
    assert(got(4L) == ((0L, 0L, -1L)), s"gram-less doc: ${got(4L)}")
  }
}
