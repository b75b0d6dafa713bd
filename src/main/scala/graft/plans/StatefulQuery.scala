package graft.plans

/** The reference's "stateful query" grammar: a SQL string containing
  * `$name::i64` placeholders in its WHERE clause; at most ONE distinct
  * variable; each tick the current watermark value is spliced in, and the
  * new watermark is max(result column `name`)
  * (mycelial `sections/postgres_connector/src/stateful_query.rs:21-204`,
  * multi-var rejection `:296-301`).
  *
  * The grammar is tiny (name + i64 only) so a targeted scan beats a full
  * SQL parse; validation still rejects placeholders in string literals.
  */
final case class StatefulQuery(raw: String) {

  private val Placeholder = """\$([A-Za-z_][A-Za-z0-9_]*)::(i64)""".r

  /** Distinct variable names, in first-appearance order, ignoring matches
    * inside single-quoted SQL string literals. */
  val variables: Seq[String] = {
    val outsideLiterals = stripLiterals(raw)
    Placeholder.findAllMatchIn(outsideLiterals).map(_.group(1)).toSeq.distinct
  }

  require(variables.size <= 1,
    s"stateful query supports exactly one variable, found: ${variables.mkString(", ")}")

  def isStateful: Boolean = variables.nonEmpty
  def variable: Option[String] = variables.headOption

  /** Splice the watermark value into every placeholder occurrence. */
  def bind(watermark: Long): String =
    Placeholder.replaceAllIn(raw, _ => watermark.toString)

  /** Blank out single-quoted literals (keeping offsets irrelevant — we only
    * need existence tests) so `'$x::i64'` text data never parses as a
    * placeholder. */
  private def stripLiterals(s: String): String = {
    val sb = new StringBuilder
    var inLit = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') { inLit = !inLit; sb += ' ' }
      else sb += (if (inLit) ' ' else c)
      i += 1
    }
    sb.toString
  }
}

object StatefulQuery {
  /** Initial watermark when no state exists (reference defaults to 0,
    * `sections/postgres_connector/src/source.rs:99-106`). */
  val InitialWatermark = 0L
}
