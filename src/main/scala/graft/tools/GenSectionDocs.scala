package graft.tools

import java.nio.file.{Files, Paths}

/** Regenerate the section reference (`graft/ui/sections.md`) from the
  * live registry + its source — run after any [[graft.plans.SectionRegistry]]
  * change; `SectionDocsSpec` fails until the committed artifact matches.
  *
  * Usage: `sbt "runMain graft.tools.GenSectionDocs"` (from the repo root). */
object GenSectionDocs {
  val RegistrySource = "src/main/scala/graft/plans/PipelineCompiler.scala"
  val Artifact = "src/main/resources/graft/ui/sections.md"

  def main(args: Array[String]): Unit = {
    val src = new String(Files.readAllBytes(Paths.get(RegistrySource)), "UTF-8")
    val md = graft.plans.SectionDocs.markdown(src)
    Files.write(Paths.get(Artifact), md.getBytes("UTF-8"))
    println(s"wrote ${md.length} chars, " +
      s"${graft.plans.SectionRegistry.entries.size} sections -> $Artifact")
  }
}
