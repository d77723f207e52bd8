package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text metrics used by both the profiling and text-ops modules —
  * one definition per metric so the whitespace class / empty-string
  * semantics cannot drift between the modules' Spark and oracle sides.
  */
private[graft] object Text {

  /** Word count matching Python's str.split() (empty → 0). */
  def wordCount(c: Column): Column =
    when(trim(c) === "", 0).otherwise(size(split(trim(c), "[ \\t\\n\\r\\f]+")))

  /** Whitespace-collapsed lowercase normalization — the canonical form all
    * content dedup/fingerprints key on (batch [[graft.operators.TextOps]]
    * AND the streaming ingest-time dedup share this one definition).
    */
  def norm(c: Column): Column =
    regexp_replace(lower(trim(c)), "[ \\t\\n\\r\\f]+", " ")

  /** DuckDB mirror of [[norm]] over the `text` column — kept adjacent so
    * the whitespace class cannot drift between the engines' sides.
    */
  val normSql: String =
    "regexp_replace(lower(trim(text)), '[ \\t\\n\\r\\f]+', ' ', 'g')"

  /** DuckDB mirror of [[wordCount]] over the `text` column. */
  val wordCountSql: String =
    "CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '[ \\t\\n\\r\\f]+')) END"
}
