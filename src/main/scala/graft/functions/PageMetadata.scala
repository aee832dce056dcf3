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

  def metaProperty(htmlBytes: Column, prop: String): Column =
    extractOrNull(html(htmlBytes),
      s"""(?is)<meta\\s+property=["']$prop["']\\s+content=["']([^"']*)["']""")

  /** Numeric meta content -> long, null on absent/garbage (ANSI-safe:
    * the cast only ever sees digit strings).
    */
  private def numericOrNull(v: Column): Column = {
    val digits = regexp_extract(coalesce(v, lit("")), """^(\d{1,9})$""", 1)
    when(length(digits) > 0, digits.cast("long"))
  }

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
    * The trailing offset is PARSED (`XXX`, which accepts `Z`), not
    * treated as a literal — the UTC contract holds regardless of
    * `spark.sql.session.timeZone`, so external consumers without the
    * entrypoints' UTC pin still get the correct instant.
    */
  def publishedTs(htmlBytes: Column): Column =
    parseIsoInstant(coalesce(
      metaProperty(htmlBytes, "article:published_time"),
      metaContent(htmlBytes, "date")))

  /** Offset-aware ISO-8601 parse tolerant of the three dominant
    * real-world shapes: seconds+offset (`…T08:30:00Z`), fractional
    * millis+offset (`…T08:30:00.000Z` — very common for OpenGraph
    * timestamps), and a bare date (`2024-03-01`, the usual form of the
    * `date` meta fallback — taken as UTC midnight, the only
    * deterministic reading). The offset is always PARSED (`XXX`
    * accepts `Z`), never a literal, so the UTC contract holds
    * regardless of `spark.sql.session.timeZone`. Anything else → null,
    * like a garbled EXIF date.
    */
  private def parseIsoInstant(raw: Column): Column =
    coalesce(
      try_to_timestamp(raw, lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
      try_to_timestamp(raw, lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
      try_to_timestamp(concat(raw, lit("T00:00:00+00:00")),
        lit("yyyy-MM-dd'T'HH:mm:ssXXX")))

  /** Last-modification timestamp (`General_File_Modified_Date` analog,
    * `db/schema.py:121`): `article:modified_time` OpenGraph property or
    * a `last-modified` meta, parsed with the same offset-aware UTC
    * contract as [[publishedTs]].
    */
  def modifiedTs(htmlBytes: Column): Column =
    parseIsoInstant(coalesce(
      metaProperty(htmlBytes, "article:modified_time"),
      metaContent(htmlBytes, "last-modified")))

  /** `<!DOCTYPE xxx>` root keyword (`General_Format_Commercial` analog —
    * the container format name).
    */
  def doctype(htmlBytes: Column): Column =
    extractOrNull(html(htmlBytes), """(?is)^\s*<!DOCTYPE\s+(\w+)""")

  /** One meta-tag regex drives the full-blob map: every
    * `<meta name|property="k" content="v">` pair, key lowercased,
    * FIRST occurrence wins (duplicate keys would make
    * `map_from_entries` throw under ANSI).
    */
  private val metaTagRe =
    """(?is)<meta\s+(?:name|property)=["']([^"']+)["']\s+content=["']([^"']*)["']"""

  /** The `Json_full_exif` analog (`db/schema.py:138`): ALL meta tags as
    * a queryable MAP(STRING, STRING) — typed columns above are the
    * curated view, this is the lossless blob (`element_at(meta_all,
    * 'og:type')` etc.).
    */
  def metaAll(htmlBytes: Column): Column = {
    val s = html(htmlBytes)
    val tags = regexp_extract_all(s, lit(metaTagRe), lit(0))
    val entries = transform(tags, t => struct(
      lower(regexp_extract(t, metaTagRe, 1)).as("key"),
      regexp_extract(t, metaTagRe, 2).as("value")))
    val keys = transform(entries, e => e.getField("key"))
    // first-wins key dedup: keep entry i iff its key is absent from the
    // i-entry prefix (meta tags per page are ~dozens, so O(m^2) locally
    // is noise next to the regex scan)
    val deduped = filter(entries, (e, i) =>
      array_position(slice(keys, lit(1), i), e.getField("key")) === 0)
    map_from_entries(deduped)
  }

  private def countTag(s: Column, tag: String): Column =
    size(regexp_extract_all(s, lit(s"(?is)<$tag[\\s>]"), lit(0))).cast("long")

  /** pages(url, html, ...) -> typed metadata columns per url: the full
    * 26+-typed-column analog of the reference exif table
    * (`db/schema.py:105-138` — string/float/datetime classes all
    * represented) plus the `meta_all` blob map (`Json_full_exif`).
    * Still one declarative narrow projection over the scan — regex +
    * HOF expressions, no UDFs, no shuffle.
    */
  def extract(pages: DataFrame, htmlCol: String = "html"): DataFrame = {
    val s = html(col(htmlCol))
    val txt = TextFunctions.extractText(col(htmlCol))
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
      length(txt).cast("long").as("text_len"),
      // --- file/container class (General_FileSize / FileExtension /
      //     Format_Commercial analogs) ---
      length(col(htmlCol)).cast("long").as("file_size"), // raw BYTES
      extractOrNull(col("url"),
        """\.([A-Za-z0-9]{1,8})(?:[?#].*)?$""").as("url_ext"),
      doctype(col(htmlCol)).as("doctype"),
      metaContent(col(htmlCol), "generator").as("generator"),
      // --- date class (File_Modified_Date analog) ---
      modifiedTs(col(htmlCol)).as("modified_ts"),
      // --- content-unit class (FrameCount / Duration analogs) ---
      when(length(txt) === 0, lit(0L))
        .otherwise(size(filter(split(txt, "\\s+"), w => length(w) > 0))
          .cast("long")).as("n_words"),
      size(regexp_extract_all(txt, lit("[.!?]+"), lit(0)))
        .cast("long").as("n_sentences"),
      // --- rate class (OverallBitRate analog: markup overhead) ---
      when(length(txt) > 0,
        length(s).cast("double") / length(txt).cast("double"))
        .as("markup_ratio"),
      // --- media-dimension class (Video_Width/Height analogs) ---
      numericOrNull(metaProperty(col(htmlCol), "og:image:width"))
        .as("og_image_w"),
      numericOrNull(metaProperty(col(htmlCol), "og:image:height"))
        .as("og_image_h"),
      // --- media-presence class (Audio_*/Video_* analogs) ---
      (countTag(s, "audio") + countTag(s, "video") + countTag(s, "embed"))
        .as("n_media_tags"),
      // --- the lossless blob (Json_full_exif analog) ---
      metaAll(col(htmlCol)).as("meta_all"))
  }
}
