package graft.functions

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Runtime configuration (SURVEY §2 S13) + credential resolution (S12).
  *
  * The reference loads `config/config.yaml` via `yaml.safe_load`
  * (`scripts/kinesis_to_snowflake.py:11-15`) and resolves Snowflake
  * credentials from AWS Secrets Manager with a config-file fallback
  * (`scripts/kinesis_to_snowflake.py:45-76`). Here: a dependency-free
  * parser for the YAML subset the reference actually uses (nested maps
  * of scalars, `#` comments), flattened to dotted keys, and a secrets
  * chain of env var → config key (no cloud SDKs in a zero-egress
  * engine; the Secrets Manager hop is an environment concern, not an
  * engine one).
  */
final case class GraftConfig(entries: Map[String, String]) {
  def get(key: String): Option[String] = entries.get(key)
  def apply(key: String): String =
    entries.getOrElse(key, throw new NoSuchElementException(s"config key not found: $key"))
  def getOrElse(key: String, default: String): String = entries.getOrElse(key, default)

  /** S12: env var (UPPER_SNAKE of the dotted key) wins over config. */
  def secret(key: String, env: Map[String, String] = sys.env): Option[String] =
    env.get(key.toUpperCase.replace('.', '_')).orElse(get(key))
}

object GraftConfig {

  def load(path: String): GraftConfig =
    parse(Files.readAllLines(Paths.get(path)).asScala.toSeq)

  /** Parses the reference's YAML shape: `key:` sections nested by
    * 2-space indentation, `key: value` leaves, `#` comments stripped
    * (also trailing), quotes around values removed.
    */
  def parse(lines: Seq[String]): GraftConfig = {
    var stack = List.empty[(Int, String)] // (indent, key) from outer to inner
    val out = Map.newBuilder[String, String]
    for (raw <- lines) {
      val noComment = stripComment(raw)
      if (noComment.trim.nonEmpty) {
        val indent = noComment.takeWhile(_ == ' ').length
        val body = noComment.trim
        val idx = body.indexOf(':')
        require(idx > 0, s"unparseable config line: $raw")
        val key = body.substring(0, idx).trim
        val value = body.substring(idx + 1).trim
        stack = stack.filter(_._1 < indent)
        val dotted = (stack.map(_._2) :+ key).mkString(".")
        if (value.isEmpty) stack = stack :+ (indent, key)
        else out += dotted -> unquote(value)
      }
    }
    GraftConfig(out.result())
  }

  private def stripComment(s: String): String = {
    // YAML comment rules (the subset that matters): '#' starts a comment
    // only at line start or after whitespace, and not inside a
    // double-quoted scalar. A bare '#' inside a value (`pa#ss`,
    // `http://h/p#frag`) is data; apostrophes never toggle quoting.
    var inDquote = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"') inDquote = !inDquote
      if (c == '#' && !inDquote && (i == 0 || s.charAt(i - 1).isWhitespace))
        return s.substring(0, i)
      i += 1
    }
    s
  }

  private def unquote(s: String): String =
    if (s.length >= 2 && ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
      s.substring(1, s.length - 1)
    else s
}
