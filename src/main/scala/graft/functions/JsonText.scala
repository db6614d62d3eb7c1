package graft.functions

/** Shared JSON string escaping for the hand-rolled JSON the engine emits
  * (oracle dumps, HTTP façade payloads): backslash, quote, and ALL
  * control chars — one implementation so emitters can't drift. */
object JsonText {
  def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** `escape` wrapped in quotes — a complete JSON string literal. */
  def quote(s: String): String = "\"" + escape(s) + "\""
}
