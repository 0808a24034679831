package graft.expressions

/** The tokenizer contract shared by the native text expressions
  * (TextQuality, TextRepetition, LangId) and their SQL renderings.
  *
  * Splitting is on the Java/RE2 regex `\s` set — exactly
  * `[ \t\n\x0B\f\r]` — NOT `Character.isWhitespace`, which diverges in
  * both directions (it adds U+001C–U+001F and the Unicode space block
  * U+2000–U+200A/U+2028/U+2029). The Spark HOF path
  * (`TextOps.tokens` = `split(text, '\\s+')`) and every DuckDB oracle
  * (`regexp_split_to_array(text, '\s+')`) are ASCII-`\s` in their
  * respective regex engines, so a native tokenizer on the Unicode
  * predicate would make n-gram fractions — and the CorpusGate
  * keep/drop decision — diverge from the SQL replay on any document
  * containing non-ASCII whitespace. One predicate, used by all three
  * native expressions, keeps batch, streaming, and oracle
  * tokenization identical by construction.
  */
object Tokenize {
  @inline def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
}
