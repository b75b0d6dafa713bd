package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The v2 dedup signature index ([[NearDup.writeSignatureIndex]] /
  * [[NearDup.dedupAgainstIndex]] / [[NearDup.absorbIntoIndex]]): result
  * parity with the inline reference pass, the partition-pruned probe
  * plan, the bloom-gated exact guard, and the absorb lifecycle. The
  * whole-corpus results are oracle-verified as `dd_dedup_index` /
  * `dd_dedup_index_absorb`. */
class SignatureIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private val long = (1 to 30).map(i => s"w$i").mkString(" ")
  private val longVariant =
    (1 to 30).map(i => if (i == 15) "CHANGED" else s"w$i").mkString(" ")

  test("index probe answers identically to the inline reference pass") {
    val ref = docs(
      1L -> long,
      2L -> "x") // shorter than one shingle: only the exact guard catches it
    val inc = docs(
      10L -> long,         // exact dup
      11L -> longVariant,  // near dup, jaccard ~0.81
      12L -> "p q r s t u v w completely fresh content here",
      13L -> "x",          // exact dup of the short reference doc
      14L -> "y")          // fresh short doc
    val inline = NearDup.dedupAgainstReference(ref, inc)
      .as[Long].collect().toSet
    spark.catalog.clearCache()
    val path = java.nio.file.Files.createTempDirectory("sigidx").toString
    NearDup.writeSignatureIndex(ref, path)
    val got = NearDup.dedupAgainstIndex(inc, path).as[Long].collect().toSet
    assert(got == inline && got == Set(12L, 14L))
    // layout: pre-aggregated sets, band postings, exact guard, bloom, params
    for (part <- Seq("sets", "bands", "exact", "params"))
      assert(new java.io.File(path, part).exists(), s"missing $part")
    assert(new java.io.File(s"$path/bloom/current").exists(), "missing bloom")
    // the partitioned tables carry their bucket dirs
    assert(new java.io.File(s"$path/sets").listFiles()
      .exists(_.getName.startsWith("sb=")))
    assert(new java.io.File(s"$path/bands").listFiles()
      .exists(_.getName.startsWith("bb=")))
    // a second batch reuses the same store
    val inc2 = docs(20L -> long, 21L -> "another genuinely new document text")
    assert(NearDup.dedupAgainstIndex(inc2, path)
      .as[Long].collect().toSet == Set(21L))
    spark.catalog.clearCache()
  }

  test("parity with the inline pass on a mixed 120-doc corpus") {
    // 40 reference docs; incoming = exact dups, near variants (one word
    // changed), and fresh docs — enough spread to hit many buckets of all
    // three tables
    val refRows = (0L until 40L).map(i =>
      i -> (1 to 25).map(w => s"r${i % 8}w$w").mkString(" "))
    val incRows = (0L until 80L).map { i =>
      val id = 100L + i
      if (i % 4 == 0) id -> (1 to 25).map(w => s"r${i % 8}w$w").mkString(" ")
      else if (i % 4 == 1) id -> (1 to 25)
        .map(w => if (w == 13) "X" else s"r${i % 8}w$w").mkString(" ")
      else id -> (1 to 25).map(w => s"fresh${i}w$w").mkString(" ")
    }
    val ref = refRows.toDF("doc_id", "text")
    val inc = incRows.toDF("doc_id", "text")
    val inline = NearDup.dedupAgainstReference(ref, inc)
      .as[Long].collect().toSet
    spark.catalog.clearCache()
    val path = java.nio.file.Files.createTempDirectory("sigidx_par").toString
    NearDup.writeSignatureIndex(ref, path)
    val got = NearDup.dedupAgainstIndex(inc, path).as[Long].collect().toSet
    assert(got == inline, s"index=${got.size} inline=${inline.size}")
    spark.catalog.clearCache()
  }

  test("params are self-describing: a non-default build probes correctly") {
    val ref = docs(1L -> long)
    val inc = docs(10L -> longVariant, 11L -> "totally different words here")
    val inline = NearDup.dedupAgainstReference(ref, inc, ngram = 5,
      slots = 16, rowsPerBand = 2).as[Long].collect().toSet
    spark.catalog.clearCache()
    val path = java.nio.file.Files.createTempDirectory("sigidx_ng").toString
    NearDup.writeSignatureIndex(ref, path, ngram = 5, slots = 16,
      rowsPerBand = 2, exactBuckets = 8, bandBuckets = 8, setBuckets = 8)
    // no signature params passed — the probe reads them from the store
    val got = NearDup.dedupAgainstIndex(inc, path).as[Long].collect().toSet
    assert(got == inline)
    val p = NearDup.signatureIndexParams(spark, path)
    assert(p.ngram == 5 && p.slots == 16 && p.rowsPerBand == 2 &&
      p.setBuckets == 8)
    spark.catalog.clearCache()
  }

  test("probe plan: every store scan is partition-pruned by a literal") {
    val ref = docs(1L -> long, 2L -> "x")
    val inc = docs(10L -> long, 11L -> longVariant, 13L -> "x")
    val path = java.nio.file.Files.createTempDirectory("sigidx_plan").toString
    NearDup.writeSignatureIndex(ref, path)
    // a multi-bucket key set renders as an IN-list; Catalyst folds a
    // single-bucket set to equality — both are literal prunes
    def assertPruned(plan: String, c: String): Unit = {
      val pf = plan.linesIterator.filter(_.contains("PartitionFilters"))
        .find(_.contains(s"$c#"))
      assert(pf.isDefined, s"no partition filter over $c:\n$plan")
      assert(pf.get.contains("IN") || pf.get.contains("in(") ||
        pf.get.contains(" = "),
        s"partition filter over $c must be a literal prune: ${pf.get}")
    }
    // the final probe plan carries the exact-guard (tb) and verify-set
    // (sb) prunes; the band (bb) prune lives in the candidate subplan,
    // which the probe eagerly checkpoints — assert it pre-checkpoint
    val p = NearDup.dedupAgainstIndex(inc, path)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assertPruned(p, "tb")
    assertPruned(p, "sb")
    val params = NearDup.signatureIndexParams(spark, path)
    val candPlan = NearDup.indexBandCandidates(
        NearDup.hvOf(inc, "doc_id", "text", params.ngram), path, params)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assertPruned(candPlan, "bb")
    spark.catalog.clearCache()
  }

  test("fresh batch: the bloom gate folds the exact scan out of the plan") {
    val ref = docs(1L -> long, 2L -> "x")
    val path = java.nio.file.Files.createTempDirectory("sigidx_bloom").toString
    NearDup.writeSignatureIndex(ref, path)
    // all-fresh batch: every md5 misses the bloom (deterministic for this
    // fixture), the suspect set is empty, and PropagateEmptyRelation
    // removes the exact scan from the physical plan entirely — the
    // "healthy crawl never opens the guard table" property
    val fresh = docs(
      20L -> "alpha beta gamma delta epsilon zeta eta theta",
      21L -> "one two three four five six seven eight nine")
    val plan = NearDup.dedupAgainstIndex(fresh, path)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("/exact"),
      s"fresh batch must not scan the exact table:\n$plan")
    assert(NearDup.dedupAgainstIndex(fresh, path)
      .as[Long].collect().toSet == Set(20L, 21L))
    spark.catalog.clearCache()
  }

  test("absorbIntoIndex: survivors become reference; re-absorption no-op") {
    val base = (1 to 30).map(i => s"r$i").mkString(" ")
    val path = java.nio.file.Files.createTempDirectory("sigidx_abs").toString
    NearDup.writeSignatureIndex(docs(1L -> base), path)
    val day1 = docs(
      10L -> ((1 to 30).map(i => s"a$i").mkString(" ")),
      11L -> "one two three four five six seven")
    assert(NearDup.dedupAgainstIndex(day1, path)
      .as[Long].collect().toSet == Set(10L, 11L))
    NearDup.absorbIntoIndex(day1, path)
    // day 2: duplicates of day-1 docs are now dropped, including the
    // sub-shingle doc (caught by the absorbed exact guard + bloom)
    val day2 = docs(
      20L -> ((1 to 30).map(i => s"a$i").mkString(" ")),     // exact of 10
      21L -> ((1 to 30).map(i => if (i == 7) "Z" else s"a$i")
        .mkString(" ")),                                      // near of 10
      22L -> "one two three four five six seven",             // exact of 11
      23L -> ((1 to 30).map(i => s"b$i").mkString(" ")))      // fresh
    assert(NearDup.dedupAgainstIndex(day2, path)
      .as[Long].collect().toSet == Set(23L))
    // re-absorbing the same batch adds nothing: one exact row per
    // distinct text, before and after
    val exactBefore = spark.read.parquet(s"$path/exact").count()
    NearDup.absorbIntoIndex(day1, path)
    assert(spark.read.parquet(s"$path/exact").count() == exactBefore)
    spark.catalog.clearCache()
  }

  private def bucketFileCounts(path: String, table: String): Map[String, Int] =
    new java.io.File(path, table).listFiles()
      .filter(d => d.isDirectory && d.getName.contains("="))
      .map(d => d.getName -> d.listFiles().count { f =>
        f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith(".")
      }).toMap

  test("compaction collapses fragmented buckets; probe answers unchanged") {
    val path = java.nio.file.Files.createTempDirectory("sigidx_cmp").toString
    NearDup.writeSignatureIndex(
      docs(1L -> ((1 to 30).map(i => s"r$i").mkString(" "))), path,
      exactBuckets = 2, bandBuckets = 2, setBuckets = 2)
    // 6 daily absorbs, each one new doc -> each touched bucket dir gains
    // a file per absorb (the fragmentation the probe pays for)
    (0 until 6).foreach { d =>
      NearDup.absorbIntoIndex(
        docs((100L + d) -> ((1 to 30).map(i => s"day${d}w$i").mkString(" "))),
        path)
    }
    val fragmented = bucketFileCounts(path, "sets")
    assert(fragmented.values.max > 2,
      s"absorbs should have fragmented the sets buckets: $fragmented")
    val probe = docs(
      200L -> ((1 to 30).map(i => s"day3w$i").mkString(" ")),   // dup of 103
      201L -> ((1 to 30).map(i => if (i == 9) "Q" else s"r$i")
        .mkString(" ")),                                         // near of 1
      202L -> ((1 to 30).map(i => s"fresh$i").mkString(" ")))    // fresh
    val before = NearDup.dedupAgainstIndex(probe, path)
      .as[Long].collect().toSet
    spark.catalog.clearCache()
    NearDup.compactSignatureIndex(spark, path, maxFilesPerBucket = 1)
    for (t <- Seq("sets", "bands", "exact")) {
      val counts = bucketFileCounts(path, t)
      assert(counts.values.forall(_ == 1),
        s"$t buckets not compacted to one file: $counts")
    }
    val after = NearDup.dedupAgainstIndex(probe, path)
      .as[Long].collect().toSet
    assert(after == before && after == Set(202L))
    // sets keep their zone-map order: each compacted file is id-sorted
    val anyBucket = new java.io.File(path, "sets").listFiles()
      .filter(_.getName.startsWith("sb=")).head
    val ids = spark.read.parquet(anyBucket.toString)
      .select($"doc_id").as[Long].collect()
    assert(ids.sameElements(ids.sorted), "within-bucket sort lost")
    spark.catalog.clearCache()
  }

  test("bloom saturation: absorb past capacity resizes the filter") {
    val path = java.nio.file.Files.createTempDirectory("sigidx_sat").toString
    // capacity 4 texts — the first real absorb blows past it
    NearDup.writeSignatureIndex(
      docs(1L -> ((1 to 30).map(i => s"r$i").mkString(" "))), path,
      bloomItems = 4L)
    assert(NearDup.signatureIndexParams(spark, path).bloomItems == 4L)
    val batch = docs((0 until 12).map(d =>
      (100L + d) -> ((1 to 30).map(i => s"s${d}w$i").mkString(" "))): _*)
    NearDup.absorbIntoIndex(batch, path)
    val p2 = NearDup.signatureIndexParams(spark, path)
    assert(p2.bloomItems >= 4L * 13 && p2.bloomItems >= (1L << 17),
      s"filter not resized: ${p2.bloomItems}")
    // the rebuilt filter still guards every text (old and new): all
    // duplicates drop, fresh survives — and a FURTHER absorb merges
    // compatibly against the resized bitset
    val probe = docs(
      300L -> ((1 to 30).map(i => s"r$i").mkString(" ")),
      301L -> ((1 to 30).map(i => s"s7w$i").mkString(" ")),
      302L -> ((1 to 30).map(i => s"fresh$i").mkString(" ")))
    assert(NearDup.dedupAgainstIndex(probe, path)
      .as[Long].collect().toSet == Set(302L))
    NearDup.absorbIntoIndex(
      docs(400L -> ((1 to 30).map(i => s"t$i").mkString(" "))), path)
    assert(NearDup.dedupAgainstIndex(
        docs(500L -> ((1 to 30).map(i => s"t$i").mkString(" "))), path)
      .as[Long].collect().isEmpty)
    spark.catalog.clearCache()
  }

  test("saturation check is O(1): it reads params.knownItems, not the " +
    "exact table's footers") {
    val path = java.nio.file.Files.createTempDirectory("sigidx_o1").toString
    // capacity 1000; the store holds ONE distinct text (footer count 1)
    NearDup.writeSignatureIndex(docs(1L -> long), path, bloomItems = 1000L)
    val p = NearDup.signatureIndexParams(spark, path)
    assert(p.knownItems == 1L, "build must persist the running total")
    // doctor the running total PAST capacity while the footer count stays
    // tiny: if the next absorb rebuilt from footers (1 + 1 = 2 <= 1000)
    // it would take the merge path and leave bloomItems at 1000; reading
    // knownItems (2000 + 1 > 1000) forces the resize
    Seq(p.copy(knownItems = 2000L)).toDF().coalesce(1)
      .write.mode("overwrite").parquet(s"$path/params")
    NearDup.absorbIntoIndex(
      docs(100L -> ((1 to 30).map(i => s"f$i").mkString(" "))), path)
    val p2 = NearDup.signatureIndexParams(spark, path)
    assert(p2.bloomItems >= (1L << 17),
      s"saturation must have read the O(1) running total: ${p2.bloomItems}")
    assert(p2.knownItems == 2001L,
      s"running total must carry forward: ${p2.knownItems}")
    spark.catalog.clearCache()
  }

  test("absorb maintains the running total across the merge path") {
    val path = java.nio.file.Files.createTempDirectory("sigidx_rt").toString
    NearDup.writeSignatureIndex(docs(1L -> long), path)
    (0 until 3).foreach { d =>
      NearDup.absorbIntoIndex(
        docs((100L + d) -> ((1 to 30).map(i => s"d${d}w$i").mkString(" "))),
        path)
    }
    assert(NearDup.signatureIndexParams(spark, path).knownItems == 4L)
    // an already-known batch adds nothing
    NearDup.absorbIntoIndex(docs(200L -> long), path)
    assert(NearDup.signatureIndexParams(spark, path).knownItems == 4L)
    spark.catalog.clearCache()
  }

  test("stale params after a crashed resize: the merge path falls " +
    "through to a rebuild instead of wedging on IncompatibleMerge") {
    val path = java.nio.file.Files.createTempDirectory("sigidx_cw").toString
    NearDup.writeSignatureIndex(docs(1L -> long), path, bloomItems = 4L)
    // saturating absorb resizes the ON-DISK filter (and params with it)
    NearDup.absorbIntoIndex(docs((0 until 12).map(d =>
      (100L + d) -> ((1 to 30).map(i => s"s${d}w$i").mkString(" "))): _*),
      path)
    val resized = NearDup.signatureIndexParams(spark, path)
    assert(resized.bloomItems >= (1L << 17))
    // simulate the crash window: params roll back to the PRE-resize
    // capacity (bloom written, params write lost) with a small running
    // total so the next absorb stays UNDER capacity -> merge path, whose
    // batch filter (sized at capacity 4) is incompatible with the
    // resized on-disk bitset
    Seq(resized.copy(bloomItems = 4L, knownItems = 2L)).toDF().coalesce(1)
      .write.mode("overwrite").parquet(s"$path/params")
    // must not throw; must repair params by rebuilding at the new total
    NearDup.absorbIntoIndex(
      docs(300L -> ((1 to 30).map(i => s"g$i").mkString(" "))), path)
    val repaired = NearDup.signatureIndexParams(spark, path)
    assert(repaired.bloomItems >= (1L << 17),
      s"fall-through rebuild must repair the stale capacity: $repaired")
    // the store still answers: old text, resize-era text, and the
    // crash-window text all guard; fresh survives
    assert(NearDup.dedupAgainstIndex(docs(
        400L -> long,
        401L -> ((1 to 30).map(i => s"s7w$i").mkString(" ")),
        402L -> ((1 to 30).map(i => s"g$i").mkString(" ")),
        403L -> ((1 to 30).map(i => s"fresh$i").mkString(" "))), path)
      .as[Long].collect().toSet == Set(403L))
    spark.catalog.clearCache()
  }

  test("compaction recovery: a crash mid-delete's duplicates are " +
    "repaired by the next compaction regardless of file count") {
    val path = java.nio.file.Files.createTempDirectory("sigidx_rec").toString
    NearDup.writeSignatureIndex(
      docs(1L -> ((1 to 30).map(i => s"r$i").mkString(" "))), path,
      exactBuckets = 1, bandBuckets = 1, setBuckets = 1)
    (0 until 3).foreach { d =>
      NearDup.absorbIntoIndex(
        docs((100L + d) -> ((1 to 30).map(i => s"d${d}w$i").mkString(" "))),
        path)
    }
    val bucket = new java.io.File(path, "sets").listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("sb=")).head
    val frags = bucket.listFiles().filter(f => f.isFile &&
      !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(frags.length >= 3)
    val rowsBefore = spark.read.parquet(s"$path/sets").count()
    // hand-craft the crash state: the compacted file landed (here: a
    // copy of the bucket's full contents), the manifest names the swap,
    // and the delete phase stopped after removing only the FIRST
    // fragment — the remaining fragments' rows are now duplicated
    val compactName = "compact-testcrash.parquet"
    spark.read.parquet(bucket.toString).coalesce(1)
      .write.parquet(s"$path/_craft")
    val part = new java.io.File(s"$path/_craft").listFiles()
      .filter(f => f.getName.startsWith("part-")).head
    java.nio.file.Files.move(part.toPath,
      new java.io.File(bucket, compactName).toPath)
    val manifest = ("C\t" + compactName + "\n") +
      frags.map("R\t" + _.getName).mkString("", "\n", "\n")
    java.nio.file.Files.write(
      new java.io.File(bucket, "_retired").toPath,
      manifest.getBytes("UTF-8"))
    java.nio.file.Files.delete(frags.head.toPath) // crash after delete #1
    // a REAL crashed compaction also leaves the in-flight `compacting`
    // marker set (written before its first swap) — the r21 fileBound
    // no-op skip keys off it, so the crafted state must include it
    val pCrash = NearDup.signatureIndexParams(spark, path)
    Seq(pCrash.copy(compacting = true)).toDF().coalesce(1)
      .write.mode("overwrite").parquet(s"$path/params")
    assert(spark.read.parquet(s"$path/sets").count() > rowsBefore,
      "the crafted crash state must expose duplicate rows")
    spark.catalog.clearCache()
    // file count is at/below any sane threshold — only the manifest says
    // this bucket needs repair; recovery must finish the swap
    NearDup.compactSignatureIndex(spark, path, maxFilesPerBucket = 100)
    assert(!new java.io.File(bucket, "_retired").exists())
    val filesAfter = bucket.listFiles().filter(f => f.isFile &&
      !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(filesAfter.map(_.getName).toSet == Set(compactName),
      s"retired fragments must be gone: ${filesAfter.mkString(",")}")
    assert(spark.read.parquet(s"$path/sets").count() == rowsBefore,
      "duplicate rows must not outlive one maintenance cycle")
    spark.catalog.clearCache()
  }

  test("compaction recovery: a crash BEFORE the compact file landed " +
    "rolls back and loses nothing") {
    val path = java.nio.file.Files.createTempDirectory("sigidx_rb").toString
    NearDup.writeSignatureIndex(
      docs(1L -> ((1 to 30).map(i => s"r$i").mkString(" "))), path,
      exactBuckets = 1, bandBuckets = 1, setBuckets = 1)
    NearDup.absorbIntoIndex(
      docs(100L -> ((1 to 30).map(i => s"d0w$i").mkString(" "))), path)
    val bucket = new java.io.File(path, "sets").listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("sb=")).head
    val frags = bucket.listFiles().filter(f => f.isFile &&
      !f.getName.startsWith("_") && !f.getName.startsWith("."))
    val rowsBefore = spark.read.parquet(s"$path/sets").count()
    // manifest written, rename never happened (compact file absent);
    // the crashed pass had set its in-flight marker first
    val manifest = "C\tcompact-neverlanded.parquet\n" +
      frags.map("R\t" + _.getName).mkString("", "\n", "\n")
    java.nio.file.Files.write(
      new java.io.File(bucket, "_retired").toPath,
      manifest.getBytes("UTF-8"))
    val pCrash = NearDup.signatureIndexParams(spark, path)
    Seq(pCrash.copy(compacting = true)).toDF().coalesce(1)
      .write.mode("overwrite").parquet(s"$path/params")
    spark.catalog.clearCache()
    NearDup.compactSignatureIndex(spark, path, maxFilesPerBucket = 100)
    assert(!new java.io.File(bucket, "_retired").exists())
    assert(spark.read.parquet(s"$path/sets").count() == rowsBefore,
      "rollback must keep every fragment's rows")
    spark.catalog.clearCache()
  }

  private def copyDir(src: java.io.File, dst: java.io.File): Unit = {
    import scala.jdk.CollectionConverters._
    val s = src.toPath; val d = dst.toPath
    val walk = java.nio.file.Files.walk(s)
    try walk.iterator().asScala.foreach { p =>
      val t = d.resolve(s.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally walk.close()
  }
  private def deleteDir(f: java.io.File): Unit = {
    import scala.jdk.CollectionConverters._
    if (f.exists()) {
      val walk = java.nio.file.Files.walk(f.toPath)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
      finally walk.close()
    }
  }

  test("params crash window: a swap cut between delete and rename is " +
    "recovered on the next read (index never wedges)") {
    val path = java.nio.file.Files.createTempDirectory("sigidx_pcr").toString
    NearDup.writeSignatureIndex(docs(1L -> long), path)
    val before = NearDup.signatureIndexParams(spark, path)
    // craft the r20-ADVICE crash state: the writer commits the full new
    // params table to its _params_tmp_ side dir, deletes the old table,
    // and dies before the rename
    val params = new java.io.File(path, "params")
    val tmp = new java.io.File(path, "_params_tmp_crashtest")
    copyDir(params, tmp)
    deleteDir(params)
    // the next read re-fingerprints the params dir, hits FileNotFound,
    // and must finish the crashed rename before retrying
    val recovered = NearDup.signatureIndexParams(spark, path)
    assert(recovered == before,
      s"recovery must finish the rename: $recovered vs $before")
    assert(new java.io.File(path, "params").exists() && !tmp.exists())
    // ... and the store still serves
    assert(NearDup.dedupAgainstIndex(docs(10L -> long), path)
      .as[Long].collect().isEmpty)
    spark.catalog.clearCache()
  }

  test("knownItems truth-up: an absorb-crash replay inflates the running " +
    "total; compaction restores the true distinct-text count") {
    val path = java.nio.file.Files.createTempDirectory("sigidx_tu").toString
    NearDup.writeSignatureIndex(
      docs(1L -> ((1 to 30).map(i => s"r$i").mkString(" "))), path,
      exactBuckets = 2, bandBuckets = 2, setBuckets = 2)
    val batch = docs(
      100L -> ((1 to 30).map(i => s"a$i").mkString(" ")),
      101L -> ((1 to 30).map(i => s"b$i").mkString(" ")))
    // crash window: sets/bands/bloom/params committed, exact append LOST
    val exactDir = new java.io.File(path, "exact")
    val snap = new java.io.File(path, "_exact_snap")
    copyDir(exactDir, snap)
    NearDup.absorbIntoIndex(batch, path)
    deleteDir(exactDir)
    copyDir(snap, exactDir); deleteDir(snap)
    // replay: the anti-check re-detects both texts as new and re-counts
    NearDup.absorbIntoIndex(batch, path)
    val drifted = NearDup.signatureIndexParams(spark, path)
    assert(drifted.knownItems == 5L,
      s"replay must drift the total HIGH (1+2+2): ${drifted.knownItems}")
    spark.catalog.clearCache()
    NearDup.compactSignatureIndex(spark, path, maxFilesPerBucket = 1)
    val truthed = NearDup.signatureIndexParams(spark, path)
    assert(truthed.knownItems == 3L,
      s"compaction must truth the total to distinct texts: $truthed")
    // results unchanged through the whole exercise
    assert(NearDup.dedupAgainstIndex(docs(
        200L -> ((1 to 30).map(i => s"a$i").mkString(" ")),
        201L -> ((1 to 30).map(i => s"fresh$i").mkString(" "))), path)
      .as[Long].collect().toSet == Set(201L))
    spark.catalog.clearCache()
  }

  test("compaction no-op skip: an under-bound call lists nothing; the " +
    "bound re-arms it and a crashed pass always recovers") {
    val path = java.nio.file.Files.createTempDirectory("sigidx_nb").toString
    NearDup.writeSignatureIndex(
      docs(1L -> ((1 to 30).map(i => s"r$i").mkString(" "))), path,
      exactBuckets = 1, bandBuckets = 1, setBuckets = 1)
    assert(NearDup.signatureIndexParams(spark, path).fileBound == 1L)
    NearDup.absorbIntoIndex(
      docs(100L -> ((1 to 30).map(i => s"d$i").mkString(" "))), path)
    assert(NearDup.signatureIndexParams(spark, path).fileBound == 2L)
    // observability plant: a manifest that any listing pass would remove
    // (its compact file never landed -> pure rollback). bound 2 <= 8 and
    // no in-flight marker -> the call must return WITHOUT listing, so
    // the plant survives
    val bucket = new java.io.File(path, "sets").listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("sb=")).head
    java.nio.file.Files.write(
      new java.io.File(bucket, "_retired").toPath,
      "C\tcompact-neverlanded.parquet\n".getBytes("UTF-8"))
    NearDup.compactSignatureIndex(spark, path, maxFilesPerBucket = 8)
    assert(new java.io.File(bucket, "_retired").exists(),
      "an under-bound compaction must skip without touching the store")
    // over the bound (2 > 1): the pass runs, recovers the manifest,
    // compacts, and re-arms the bound at the threshold
    spark.catalog.clearCache()
    NearDup.compactSignatureIndex(spark, path, maxFilesPerBucket = 1)
    assert(!new java.io.File(bucket, "_retired").exists())
    assert(bucketFileCounts(path, "sets").values.forall(_ == 1))
    val p = NearDup.signatureIndexParams(spark, path)
    assert(p.fileBound == 1L && !p.compacting)
    spark.catalog.clearCache()
  }

  test("cross-process params rewrite is seen via fingerprint revalidation") {
    val path = java.nio.file.Files.createTempDirectory("sigidx_fp").toString
    NearDup.writeSignatureIndex(docs(1L -> long), path)
    assert(NearDup.signatureIndexParams(spark, path).ngram == 3) // warm
    // simulate ANOTHER process rebuilding with different params: rewrite
    // the params table directly, bypassing this JVM's cache invalidation
    val p = NearDup.signatureIndexParams(spark, path)
    Seq(p.copy(ngram = 5)).toDF().coalesce(1)
      .write.mode("overwrite").parquet(s"$path/params")
    assert(NearDup.signatureIndexParams(spark, path).ngram == 5,
      "a long-running serving JVM must see the rewritten params")
    spark.catalog.clearCache()
  }
}
