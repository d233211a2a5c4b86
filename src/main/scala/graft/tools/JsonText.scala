package graft.tools

/** Minimal JSON string escaping for the hand-rolled driver documents
  * (the BENCH records and oracle_sql.json): backslash, quote, and ALL
  * control chars. One implementation — an unescaped stage label or path
  * once meant a whole round's record parsed to null at the driver. */
object JsonText {
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
