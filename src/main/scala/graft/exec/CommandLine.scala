package graft.exec

import scala.collection.mutable.ArrayBuffer

/** Quote-aware command-line tokenizer.
  *
  * Clean-room reimplementation of the FSM behavior of the reference's
  * `CommandLineUtil.translateCommandline` (reference:
  * src/main/java/com/kadwa/hadoop/distexec/CommandLineUtil.java:19-78,
  * itself lifted from Ant's `Commandline`): space separates tokens,
  * single and double quotes group verbatim (no escapes, no nesting),
  * a closing quote still produces a token even if empty, and unbalanced
  * quotes raise an error.
  */
object CommandLine {

  /** Tokenize `line` into argv. Throws [[IllegalArgumentException]] on
    * unbalanced quotes (reference parity).
    */
  def translate(line: String): Seq[String] = {
    if (line == null || line.isEmpty) return Seq.empty
    val Normal = 0; val InQuote = 1; val InDoubleQuote = 2
    var state = Normal
    var lastTokenQuoted = false
    val cur = new StringBuilder
    val out = ArrayBuffer.empty[String]

    def flush(): Unit = {
      if (lastTokenQuoted || cur.nonEmpty) out += cur.toString
      cur.clear()
      lastTokenQuoted = false
    }

    line.foreach { c =>
      state match {
        case InQuote =>
          if (c == '\'') { lastTokenQuoted = true; state = Normal }
          else cur += c
        case InDoubleQuote =>
          if (c == '"') { lastTokenQuoted = true; state = Normal }
          else cur += c
        case _ =>
          c match {
            case '\'' => state = InQuote
            case '"'  => state = InDoubleQuote
            case ' '  => flush()
            case ch   => cur += ch
          }
      }
    }
    flush()
    if (state != Normal)
      throw new IllegalArgumentException(s"unbalanced quotes in $line")
    out.toSeq
  }
}
