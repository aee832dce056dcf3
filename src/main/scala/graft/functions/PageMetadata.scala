package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Typed metadata extraction from raw HTML — the analog of the
  * reference's EXIF extraction into typed columns (`extract_exif.py`
  * via `winnow/utils/utils.py:226-294`, landed as the 26 typed columns
  * of `db/schema.py:105-138`). One declarative projection over the
  * binary column: every field is a codegen'd regexp/length expression,
  * so the operator is a single narrow map over the scan (no UDFs, no
  * shuffle) and scales linearly with input splits.
  *
  * Extraction is deterministic and frozen (same contract as
  * TextFunctions.extractText): regex-based, tolerant of missing tags
  * (null/0 instead of errors) — not a general HTML parser, exactly as
  * the reference tolerates missing EXIF fields.
  */
object PageMetadata {

  private def html(c: Column): Column = decode(c, "UTF-8")

  /** First capture group or null when the pattern misses (regexp_extract
    * returns '' on miss; normalized to null like absent EXIF fields).
    */
  private def extractOrNull(s: Column, pattern: String): Column = {
    val v = regexp_extract(s, pattern, 1)
    when(length(v) > 0, v)
  }

  def title(htmlBytes: Column): Column =
    extractOrNull(html(htmlBytes), "(?is)<title[^>]*>(.*?)</title>")

  def metaContent(htmlBytes: Column, name: String): Column =
    extractOrNull(html(htmlBytes),
      s"""(?is)<meta\\s+name=["']$name["']\\s+content=["']([^"']*)["']""")

  def charset(htmlBytes: Column): Column =
    extractOrNull(html(htmlBytes), """(?is)<meta[^>]*charset=["']?([\w-]+)""")

  def langAttr(htmlBytes: Column): Column =
    extractOrNull(html(htmlBytes), """(?is)<html[^>]*\blang=["']([\w-]+)["']""")

  def canonicalUrl(htmlBytes: Column): Column =
    extractOrNull(html(htmlBytes),
      """(?is)<link\s+rel=["']canonical["']\s+href=["']([^"']*)["']""")

  /** Typed publication timestamp (the reference's DateTime-typed EXIF
    * columns, `db/schema.py:120-123`): the `article:published_time`
    * OpenGraph meta (or a `date` meta), parsed as an ISO-8601 UTC
    * instant. Absent tag OR unparseable content -> null, exactly like
    * a missing/garbled EXIF date — `try_to_timestamp` never throws.
    */
  def publishedTs(htmlBytes: Column): Column = {
    val raw = coalesce(
      extractOrNull(html(htmlBytes),
        """(?is)<meta\s+property=["']article:published_time["']\s+content=["']([^"']*)["']"""),
      extractOrNull(html(htmlBytes),
        """(?is)<meta\s+name=["']date["']\s+content=["']([^"']*)["']"""))
    try_to_timestamp(raw, lit("yyyy-MM-dd'T'HH:mm:ss'Z'"))
  }

  private def countTag(s: Column, tag: String): Column =
    size(regexp_extract_all(s, lit(s"(?is)<$tag[\\s>]"), lit(0))).cast("long")

  /** pages(url, html, ...) -> typed metadata columns per url. */
  def extract(pages: DataFrame, htmlCol: String = "html"): DataFrame = {
    val s = html(col(htmlCol))
    pages.select(
      col("url"),
      title(col(htmlCol)).as("title"),
      charset(col(htmlCol)).as("charset"),
      langAttr(col(htmlCol)).as("lang_attr"),
      metaContent(col(htmlCol), "description").as("meta_description"),
      metaContent(col(htmlCol), "keywords").as("meta_keywords"),
      canonicalUrl(col(htmlCol)).as("canonical_url"),
      publishedTs(col(htmlCol)).as("published_ts"),
      countTag(s, "a").as("n_links"),
      countTag(s, "img").as("n_images"),
      countTag(s, "p").as("n_paragraphs"),
      size(regexp_extract_all(s, lit("(?is)<h[1-6][\\s>]"), lit(0)))
        .cast("long").as("n_headings"),
      (size(regexp_extract_all(s, lit("(?is)<script[\\s>]"), lit(0))) > 0)
        .as("has_script"),
      (size(regexp_extract_all(s, lit("(?is)<style[\\s>]"), lit(0))) > 0)
        .as("has_style"),
      length(s).cast("long").as("html_len"),
      length(TextFunctions.extractText(col(htmlCol))).cast("long").as("text_len"))
  }
}
