package graft.plans

/** Per-section user documentation, GENERATED from the registry — the
  * counterpart of the reference UI's per-section config form metadata
  * (mycelial `config/src/lib.rs:14-26`, where each section declares its
  * fields for the console to render). Our registry reads config ad hoc
  * inside each compile closure, so the single authority on which keys a
  * section accepts is the registry SOURCE itself: the generator takes
  * (a) the live [[SectionRegistry.entries]] map for names and IO kinds —
  * runtime truth, never parsed — and (b) the registry source text for
  * the config keys each closure reads (`cfg(c, "k")` required,
  * `c.getOrElse("k", d)` optional-with-default, `c.get("k")` /
  * `c.contains("k")` optional, plus the shared helpers and the two
  * local idioms the registry uses). `SectionDocsSpec` pins the committed
  * artifact (`graft/ui/sections.md`, served by [[UiAssets]]) against a
  * fresh generation, so the doc can never drift from the code.
  */
object SectionDocs {

  final case class FieldDoc(key: String, requirement: String,
                            default: Option[String])

  /** The `entries` Map literal's region of the registry source. */
  private def registryRegion(source: String): String = {
    val start = source.indexOf("val entries: Map[String, Entry] = Map(")
    val end = source.indexOf("def ioOf(")
    require(start >= 0 && end > start,
      "registry source shape changed — update SectionDocs.registryRegion")
    source.substring(start, end)
  }

  private val EntryHead = """"([a-z0-9_]+)" -> Entry\(""".r

  /** (section name, closure source) for every entry, in source order. */
  private[plans] def entrySources(source: String): Seq[(String, String)] = {
    val region = registryRegion(source)
    val heads = EntryHead.findAllMatchIn(region).toSeq
    heads.zipWithIndex.map { case (m, i) =>
      val end = if (i + 1 < heads.size) heads(i + 1).start else region.length
      m.group(1) -> region.substring(m.start, end)
    }
  }

  private val Required = """cfg\(c, "([a-z0-9_]+)"\)""".r
  private val WithDefault = """c\.getOrElse\("([a-z0-9_]+)",\s*([^)\n]*)\)?""".r
  private val Optional = """c\.get\("([a-z0-9_]+)"\)""".r
  private val Flag = """c\.contains\("([a-z0-9_]+)"\)""".r
  // the registry's two local idioms: boolean-knob helper `on("k", dflt)`
  // (normalize_text) and an option-key list forwarded verbatim to the
  // stream reader (kafka_wire_stream_source)
  private val OnHelper = """\bon\("([a-z0-9_]+)",\s*(true|false)\)""".r
  private val SeqForward =
    """(?s)Seq\(([^)]*)\)\s*\.foreach\(k => c\.get\(k\)""".r
  private val StrLit = """"([a-z0-9_]+)"""".r

  /** Render a `getOrElse` default expression for the doc: literals pass
    * through, anything computed (helper calls, truncated nesting) shows
    * as `(computed)`. */
  private def renderDefault(expr: String): String = {
    val t = expr.trim.stripSuffix(",").trim
    if (t.matches("\"[^\"]*\"") || t.matches("-?[0-9.]+[LlDd]?") ||
        t == "true" || t == "false") t
    else "(computed)"
  }

  /** Config fields a closure reads, deduplicated, required first then
    * alphabetical. */
  private[plans] def configFields(body: String): Seq[FieldDoc] = {
    val req = Required.findAllMatchIn(body).map(_.group(1)).toSeq
    val dflt = WithDefault.findAllMatchIn(body)
      .map(m => m.group(1) -> renderDefault(m.group(2))).toSeq ++
      OnHelper.findAllMatchIn(body)
        .map(m => m.group(1) -> m.group(2)).toSeq
    val opt = Optional.findAllMatchIn(body).map(_.group(1)).toSeq ++
      Flag.findAllMatchIn(body).map(_.group(1)).toSeq ++
      SeqForward.findAllMatchIn(body)
        .flatMap(m => StrLit.findAllMatchIn(m.group(1)).map(_.group(1))).toSeq
    val helper = Seq(
      "train_max_vectors" -> body.contains("trainCap(c)"),
      "train_max_bytes" -> body.contains("trainBytes(c)"),
      "train_max_docs" -> body.contains("trainDocsCap(c)"))
      .collect { case (k, true) => k }
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    val out = Seq.newBuilder[FieldDoc]
    req.foreach(k => if (seen.add(k)) out += FieldDoc(k, "required", None))
    dflt.foreach { case (k, d) =>
      if (seen.add(k)) out += FieldDoc(k, "optional", Some(d)) }
    helper.foreach { k =>
      if (seen.add(k)) out += FieldDoc(k, "optional", Some(k match {
        case "train_max_vectors" =>
          graft.operators.Ann.DefaultMaxTrainVectors.toString
        case "train_max_docs" => "0"
        case _ => graft.operators.Ann.DefaultMaxTrainBytes.toString
      })) }
    opt.foreach(k => if (seen.add(k)) out += FieldDoc(k, "optional", None))
    val all = out.result()
    all.filter(_.requirement == "required") ++
      all.filter(_.requirement != "required").sortBy(_.key)
  }

  private def kind(v: SectionIO.Value): String = v match {
    case SectionIO.None => "none"
    case SectionIO.Bin => "bin"
    case SectionIO.DataFrameIO => "dataframe"
    case _ => "bin_or_dataframe"
  }

  /** Placeholder value for an example spec — key-aware where it helps. */
  private def placeholder(f: FieldDoc): String = f.default match {
    case Some(d) if d != "(computed)" => d.stripPrefix("\"").stripSuffix("\"")
    case _ => f.key match {
      case "path" | "stage_dir" | "s3_dir" => "/data/" + f.key
      case "url" => "jdbc:postgresql://host/db"
      case "query" => "SELECT 1"
      case k => s"<$k>"
    }
  }

  /** One minimal runnable spec per section, shaped by its IO kinds: a
    * source feeds a parquet sink, a sink is fed by a parquet source, a
    * transform sits between both. */
  private def exampleSpec(name: String, io: SectionIOSpec,
                          fields: Seq[FieldDoc]): String = {
    val conf = fields.filter(_.requirement == "required")
      .map(f => s""""${f.key}":"${placeholder(f)}"""").mkString("{", ",", "}")
    val self = s"""{"id":"me","name":"$name","config":$conf}"""
    // IO-compatible neighbors: a Bin input needs a binary upstream and a
    // Bin output a binary sink (SectionIO.compatible rejects a
    // dataframe→bin edge); BinOrDataFrame matches either
    val src =
      if (io.input == SectionIO.Bin)
        """{"id":"src","name":"file_source","config":{"path":"/data/in.bin"}}"""
      else
        """{"id":"src","name":"parquet_source","config":{"path":"/data/in"}}"""
    val sink =
      if (io.output == SectionIO.Bin)
        """{"id":"sink","name":"file_destination","config":{"path":"/data/out.bin"}}"""
      else
        """{"id":"sink","name":"parquet_destination","config":{"path":"/data/out"}}"""
    val hasIn = io.input != SectionIO.None
    val hasOut = io.output != SectionIO.None
    val (sections, edges) = (hasIn, hasOut) match {
      case (false, true) => (Seq(self, sink), Seq(("me", "sink")))
      case (true, false) => (Seq(src, self), Seq(("src", "me")))
      case (true, true) => (Seq(src, self, sink),
        Seq(("src", "me"), ("me", "sink")))
      case (false, false) => (Seq(self), Seq.empty)
    }
    s"""{"sections":[${sections.mkString(",")}],""" +
      s""""edges":[${edges.map(e => s"""["${e._1}","${e._2}"]""").mkString(",")}]}"""
  }

  /** The whole markdown artifact. Deterministic: sections sorted by
    * name, fields required-first. */
  def markdown(registrySource: String): String = {
    val bodies = entrySources(registrySource).toMap
    val names = SectionRegistry.entries.keys.toSeq.sorted
    val sb = new StringBuilder
    sb ++= "# Section reference\n\n"
    sb ++= "GENERATED from `SectionRegistry` by `sbt \"runMain " +
      "graft.tools.GenSectionDocs\"` — do not edit by hand " +
      "(`SectionDocsSpec` pins this file against the registry). " +
      "Served by the console at `/sections.md`; the machine-readable " +
      "IO-kind palette is `GET /sections`.\n\n"
    sb ++= s"${names.size} sections. `required` keys must be present in " +
      "the section's `config`; `optional` keys fall back to the listed " +
      "default (`(computed)` = derived at compile time; blank = absent " +
      "means the behavior is simply off).\n"
    names.foreach { n =>
      val e = SectionRegistry.entries(n)
      val body = bodies.getOrElse(n, "")
      val fields = configFields(body)
      sb ++= s"\n## $n\n\n"
      sb ++= s"- input: `${kind(e.io.input)}`, " +
        s"output: `${kind(e.io.output)}`\n"
      if (fields.isEmpty) sb ++= "- config: (none)\n"
      else {
        sb ++= "\n| key | requirement | default |\n|---|---|---|\n"
        fields.foreach { f =>
          sb ++= s"| `${f.key}` | ${f.requirement} | " +
            s"${f.default.map(d => s"`$d`").getOrElse("—")} |\n"
        }
      }
      sb ++= "\nExample:\n\n```json\n"
      sb ++= exampleSpec(n, e.io, fields)
      sb ++= "\n```\n"
    }
    sb.result()
  }
}
