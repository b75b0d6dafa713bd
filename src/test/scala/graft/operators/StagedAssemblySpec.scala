package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lake-staged assembly: the `cp_assembly_staged` variant must produce the
  * exact rows of `cp_assembly` (they share one DuckDB oracle) while
  * keeping the corpus-sized TEXT intermediate OUT of executor storage —
  * only hash-sized caches (NearDup's long-typed shingle/band frames) may
  * ride the cache manager. Detection is by cache-manager LOOKUP of the
  * cleaned-text plan (caching keys on the canonicalized plan, so
  * rebuilding the same frame finds — or proves absent — its cache). */
class StagedAssemblySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val queries = graft.Queries.all.toMap

  private def cleanedTextCached: Boolean = {
    val cleaned = Corpus.segmentDedup(
        graft.Tables.documents(spark, TestSpark.sf), segWords = 8, maxDf = 2)
      .select(col("doc_id"), col("clean_text").as("text"))
    spark.sharedState.cacheManager
      .lookupCachedData(
        cleaned.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]])
      .nonEmpty
  }

  test("staged assembly: same rows as the persisted one, no text frame cached") {
    spark.catalog.clearCache()
    val persistedRows =
      queries("cp_assembly").fn(spark, TestSpark.sf).collect().toSeq
    // sanity: the detector can SEE the text cache the persisted variant makes
    assert(cleanedTextCached,
      "expected the persisted variant to cache the cleaned-text frame")
    spark.catalog.clearCache()

    val stagedRows =
      queries("cp_assembly_staged").fn(spark, TestSpark.sf).collect().toSeq
    assert(stagedRows == persistedRows,
      "staged assembly must be value-identical to the persisted one")
    // the property staging exists for: the corpus-sized text frame went to
    // the lake, not the cache manager
    assert(!cleanedTextCached,
      "staged assembly must not cache the cleaned-text frame")
    spark.catalog.clearCache()
  }

  test("packSequences staged mode matches persisted mode") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, TestSpark.sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_pack_stage").toString
    val a = Corpus.packSequences(docs, budget = 128)
      .orderBy($"doc_id").collect().toSeq
    spark.catalog.clearCache()
    val b = Corpus.packSequences(docs, budget = 128, stageDir = Some(dir))
      .orderBy($"doc_id").collect().toSeq
    assert(a == b)
    assert(new java.io.File(dir, "pack_toks").exists(),
      "staged pass-1 frame must land in the stage dir")
  }
}
