package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The generated section reference can never drift from the registry:
  * the committed `graft/ui/sections.md` must equal a fresh generation
  * from the current registry + source, cover every registered section,
  * and state each section's IO kinds truthfully. */
class SectionDocsSpec extends AnyFunSuite {

  private lazy val source = new String(Files.readAllBytes(
    Paths.get("src/main/scala/graft/plans/PipelineCompiler.scala")), "UTF-8")

  test("entry extraction finds exactly the registered sections") {
    val names = SectionDocs.entrySources(source).map(_._1)
    assert(names.distinct.size == names.size, "duplicate entry heads")
    assert(names.toSet == SectionRegistry.entries.keySet,
      s"source/registry mismatch: only-in-source=" +
        s"${names.toSet -- SectionRegistry.entries.keySet} " +
        s"only-in-registry=${SectionRegistry.entries.keySet -- names.toSet}")
  }

  test("field extraction reads the registry's config idioms") {
    val bodies = SectionDocs.entrySources(source).toMap
    def fields(n: String) = SectionDocs.configFields(bodies(n))
    // required key
    assert(fields("parquet_source").exists(f =>
      f.key == "path" && f.requirement == "required"))
    // optional with literal default
    assert(fields("excel_source").exists(f =>
      f.key == "stringify" && f.default.contains("\"true\"")))
    // shared helper (train_max_vectors rides trainCap(c))
    assert(fields("ann_topk").exists(_.key == "train_max_vectors"))
    // local boolean-knob helper (normalize_text's on("k", dflt))
    assert(fields("normalize_text").map(_.key)
      .intersect(Seq("nfc", "lowercase", "strip_accents", "collapse_ws"))
      .size == 4)
    // forwarded option-key list (kafka_wire_stream_source)
    assert(fields("kafka_wire_stream_source").map(_.key)
      .contains("starting_offsets"))
  }

  test("committed sections.md equals a fresh generation (regen via " +
    "GenSectionDocs after registry changes)") {
    val committed = Option(getClass.getClassLoader
      .getResourceAsStream("graft/ui/sections.md"))
      .map(in => try new String(in.readAllBytes(), "UTF-8") finally in.close())
    assert(committed.isDefined, "graft/ui/sections.md missing from resources")
    val fresh = SectionDocs.markdown(source)
    assert(committed.get == fresh,
      "sections.md is stale — run `sbt \"runMain graft.tools.GenSectionDocs\"`")
  }

  test("the doc covers every section with truthful IO kinds") {
    val md = SectionDocs.markdown(source)
    SectionRegistry.entries.foreach { case (n, e) =>
      assert(md.contains(s"\n## $n\n"), s"missing section: $n")
      def k(v: SectionIO.Value) = v match {
        case SectionIO.None => "none"
        case SectionIO.Bin => "bin"
        case SectionIO.DataFrameIO => "dataframe"
        case _ => "bin_or_dataframe"
      }
      assert(md.contains(s"- input: `${k(e.io.input)}`, " +
        s"output: `${k(e.io.output)}`"), s"IO kinds wrong for $n")
    }
  }

  test("every example spec in the doc parses and validates") {
    val bodies = SectionDocs.entrySources(source).toMap
    // render each example exactly as markdown() does and push it through
    // the real spec parser — a doc whose examples don't even validate
    // teaches users wrong shapes
    val Example = """(?s)```json\n(.*?)\n```""".r
    val examples = Example.findAllMatchIn(SectionDocs.markdown(source))
      .map(_.group(1)).toSeq
    assert(examples.size == SectionRegistry.entries.size)
    examples.foreach { ex =>
      val spec = PipelineSpec.fromJson(ex)
      assert(spec.sections.nonEmpty, ex.take(120))
    }
    assert(bodies.nonEmpty)
  }
}
