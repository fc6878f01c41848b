package graft.tsdb

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE doc-identity rule for ranked series retrieval: a series' tag
  * values (sorted tag-column order) joined into a single string that is
  * INJECTIVE — two raw-distinct series can never collide into one doc id,
  * and a doc id splits back into exactly the values it came from.
  * [[Tsdb.searchSeries]] (the direct scan), the CDC-maintained index
  * ([[graft.streaming.CdcIndexSync]]), and the facade's index-served
  * `/search` all use this object, so the three surfaces agree on doc
  * counts, corpus statistics, and the (score desc, doc_id) tie-break.
  *
  * Why not plain `concat_ws("\u0001", coalesce(tag, ""))` (the r14 form):
  * coalescing null to "" makes a null-tag series and an empty-string-tag
  * series the SAME doc, and a tag value containing the separator shifts
  * every later field — the direct scan (which dedupes on raw tag columns)
  * and the index (which dedupes on doc_id) then disagree on `n_docs`/df
  * and every served score (ADVICE r14). Here null encodes as a lone NUL
  * byte — unreachable by any escaped value — and the separator/escape
  * bytes inside values are escaped, standard-prefix-code style:
  *
  *   ESC(\u0002) -> ESC e     NUL(\u0000) -> ESC z     SEP(\u0001) -> ESC s
  *
  * Every ESC in an encoded value starts a 2-byte sequence, so decoding
  * resolves `ESC s` first, then `ESC z`, then `ESC e` — each pass can
  * never fabricate a sequence for a later pass (the earlier passes only
  * REMOVE escape pairs, and the bytes they emit — SEP, NUL — are not
  * pair starters). Ordinary tag values (no control bytes) encode as
  * themselves, so human-readable ids, on-disk indexes built before r15,
  * and the DuckDB oracle's `concat_ws(chr(1), ...)` tie-break are all
  * unchanged for data without control bytes.
  */
private[graft] object DocId {
  val Sep = "\u0001"
  private val Esc = "\u0002"
  private val NullMark = "\u0000"

  /** Encode one tag column's value (null-safe, injective). */
  private def encodeValue(c: Column): Column =
    when(c.isNull, lit(NullMark)).otherwise(
      replace(replace(replace(c.cast("string"),
        lit(Esc), lit(Esc + "e")),
        lit(NullMark), lit(Esc + "z")),
        lit(Sep), lit(Esc + "s")))

  /** The doc id over the given tag columns (already sorted by name —
    * every caller sorts once; this object never re-orders). */
  def encode(tagCols: Seq[String]): Column =
    concat_ws(Sep, tagCols.map(c => encodeValue(col(c))): _*)

  /** Decode field `i` (0-based) of a doc id back to the raw tag value —
    * null for a null tag (NOT "": the facade's index-served /search keeps
    * the direct path's null/empty distinction). */
  def decodeField(docId: Column, i: Int): Column = {
    val part = element_at(split(docId, Sep, -1), i + 1)
    when(part === NullMark, lit(null).cast("string")).otherwise(
      replace(replace(replace(part,
        lit(Esc + "s"), lit(Sep)),
        lit(Esc + "z"), lit(NullMark)),
        lit(Esc + "e"), lit(Esc)))
  }

  /** Driver-side twin of [[encode]] for specs and driver-built ids. */
  def encodeRaw(values: Seq[Option[String]]): String =
    values.map {
      case None => NullMark
      case Some(v) => v.replace(Esc, Esc + "e")
        .replace(NullMark, Esc + "z").replace(Sep, Esc + "s")
    }.mkString(Sep)
}
