package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text metrics used by both the profiling and text-ops modules —
  * one definition per metric so the whitespace class / empty-string
  * semantics cannot drift between the modules' Spark and oracle sides.
  */
private[graft] object Text {

  /** Word count matching Python's str.split() (empty → 0) — the
    * [[graft.functions.TokenCounts]] byte-scan kernel's n_ws field
    * (spec-pinned ≡ the r11-and-earlier
    * `when(trim(c) === "", 0).otherwise(size(split(trim(c), ws+)))`
    * regex form, which materialized every split token into an array
    * only to take its size). Built as a direct Catalyst expression so
    * callers need no function-registry session handle.
    */
  def wordCount(c: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(
      org.apache.spark.sql.catalyst.expressions.GetStructField(
        graft.functions.TokenCounts(GraftSqlBridge.expression(c)),
        0, Some("n_ws")))
  }

  private val AsciiUpper = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  private val AsciiLower = "abcdefghijklmnopqrstuvwxyz"

  /** Whitespace-collapsed, ASCII-case-folded normalization — the
    * canonical form all content dedup/fingerprints key on (batch
    * [[graft.operators.TextOps]] AND the streaming ingest-time dedup
    * share this one definition).
    *
    * Case folding is ASCII-ONLY by contract (translate, not lower()):
    * full Unicode lowercasing is engine-divergent — Spark's lower() is
    * ICU FULL case mapping ('İ' → i + combining dot, 2 codepoints;
    * final 'Σ' → 'ς') while DuckDB's is the utf8proc SIMPLE 1:1 map
    * ('İ' → 'i'; 'Σ' → 'σ') — so a corpus containing those characters
    * would split content-identity groups differently per engine and
    * silently break every md5-keyed dedup/gram oracle. For a CONTENT
    * KEY, deterministic beats linguistically complete: non-ASCII case
    * variants simply stay distinct contents. A multilingual deployment
    * that wants full folding plugs one pinned ICU-versioned fold into
    * BOTH sides — the contract stays "one spelling, two engines".
    */
  def norm(c: Column): Column = {
    // ONE kernel pass (graft.functions.NormKernel, r14) — replaces
    // regexp_replace(translate(trim(c), A-Z, a-z), '[ \t\n\r\f]+', ' '):
    // byte-identical on valid UTF-8 (equivalence argument + spec pin at
    // the kernel), built directly so callers need no registry handle
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(
      graft.functions.NormText(GraftSqlBridge.expression(c)))
  }

  /** The pre-kernel regex spelling of [[norm]] (spec use: the kernel's
    * equivalence pin compares against this exact form).
    */
  private[graft] def normRegex(c: Column): Column =
    regexp_replace(translate(trim(c), AsciiUpper, AsciiLower),
      "[ \\t\\n\\r\\f]+", " ")

  /** DuckDB mirror of [[norm]] over the `text` column — kept adjacent so
    * the whitespace and case-fold classes cannot drift between the
    * engines' sides.
    */
  /** ASCII-only case maps (Column + SQL) — the [[norm]] contract's
    * building blocks, exported for flags that compare a string against
    * its own case-fold (q_quality_flags' all-caps test: full-vs-simple
    * Unicode mappings diverge per engine on ﬁ/ß/ΐ-class characters, so
    * the cross-engine-exact test is ASCII-letter-only by contract).
    */
  def asciiUpper(c: Column): Column = translate(c, AsciiLower, AsciiUpper)
  def asciiLower(c: Column): Column = translate(c, AsciiUpper, AsciiLower)
  def asciiUpperSql(e: String): String =
    s"translate($e, '$AsciiLower', '$AsciiUpper')"
  def asciiLowerSql(e: String): String =
    s"translate($e, '$AsciiUpper', '$AsciiLower')"

  def normSqlOf(expr: String): String =
    s"regexp_replace(translate(trim($expr), '$AsciiUpper', '$AsciiLower'), " +
      "'[ \\t\\n\\r\\f]+', ' ', 'g')"

  val normSql: String = normSqlOf("text")

  /** DuckDB mirror of [[wordCount]] over the `text` column. */
  val wordCountSql: String =
    "CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '[ \\t\\n\\r\\f]+')) END"

  /** The deterministic held-out slice rule shared by BOTH decontamination
    * passes ([[TextOps]] verbatim n-gram on doc_id, [[Similarity]]
    * semantic on vec_id): a member is eval iff its id's md5 hex starts
    * with '0' — a stable 1/16 sample. ONE definition so the passes
    * cannot silently disagree about which members are eval.
    */
  def evalSlice(id: Column): Column =
    substring(md5(id.cast("string")), 1, 1) === "0"

  /** DuckDB mirror of [[evalSlice]]. */
  def evalSliceSql(idCol: String): String =
    s"substr(md5(CAST($idCol AS VARCHAR)), 1, 1) = '0'"
}
