package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → training-text extraction: the boilerplate-stripping step
  * every web-corpus pipeline runs before quality scoring and dedup
  * (the trafilatura/justext class of cleaning, reduced to its
  * deterministic core). One scan-stage projection per document —
  * every step is a codegen'd string expression, no UDF, no shuffle —
  * so at 100 TB this rides the same scan that feeds the rest of the
  * corpus-prep DAG.
  *
  * The cleaning contract (order matters and is part of the contract;
  * the oracle replays the identical sequence):
  *   1. drop `<script>`/`<style>` blocks and `<!-- comments -->`
  *      (their CONTENT is code, not prose — tag-stripping alone would
  *      leak it into the training text);
  *   2. strip every remaining tag to a single space (space, not
  *      empty: `</p><p>` must not glue adjacent words);
  *   3. decode the entity set that survives in prose, `&amp;` LAST —
  *      decoding it first would manufacture new entities out of
  *      `&amp;lt;` and double-decode (the classic ordering bug);
  *   4. collapse whitespace runs and trim.
  *
  * All patterns are RE2-safe (no backreferences or lookaround), so
  * Spark's Java regex and DuckDB's RE2 agree literally — the same
  * portability constraint [[graft.pipeline.Pipeline.piiScrub]] pins.
  */
object Html {

  /** `(?is)`: case-insensitive, dot-matches-newline — script bodies
    * span lines and tags mix case in the wild. Non-greedy `.*?` stops
    * at the FIRST closing tag, so two adjacent blocks don't fuse. */
  val scriptPattern = "(?is)<script[^>]*>.*?</script>"
  val stylePattern = "(?is)<style[^>]*>.*?</style>"
  val commentPattern = "(?s)<!--.*?-->"
  val tagPattern = "(?s)<[^>]+>"
  /** An anchor OPEN tag: `<a` followed by whitespace or `>` — counts
    * links without matching `<abbr>`/`<article>`. */
  val anchorPattern = "(?i)<a[\\s>]"
  val titlePattern = "(?is)<title[^>]*>(.*?)</title>"

  /** The entity decode table in application order — `&amp;` last (see
    * the contract above). Pure string replaces, not regexes. */
  val entityDecode: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")

  /** The cleaned prose of an HTML column as a Column expression. */
  def cleanText(html: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(
        regexp_replace(html, scriptPattern, " "),
        stylePattern, " "),
      commentPattern, " ")
    val noTags = regexp_replace(noBlocks, tagPattern, " ")
    val decoded = entityDecode.foldLeft(noTags) { case (c, (ent, ch)) =>
      replace(c, lit(ent), lit(ch))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Per-document extraction record: the page title, anchor count,
    * and the cleaned prose (exported as length + md5 so the gate
    * hashes real cleaned TEXT without shipping it twice).
    *
    * Output: (id, title, n_links, clean_len, clean_fp).
    */
  def extract(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val h = col(htmlCol)
    val clean = cleanText(h)
    df.select(col(idCol),
      regexp_extract(h, titlePattern, 1).as("title"),
      size(regexp_extract_all(h, lit(anchorPattern), lit(0)))
        .cast("long").as("n_links"),
      length(clean).cast("long").as("clean_len"),
      md5(clean).as("clean_fp"))
  }
}
