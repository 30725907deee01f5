package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Web-corpus preprocessing: markup-to-text extraction and URL
 * normalization — the step-zero of every web-scale training pipeline
 * (C4, CCNet, RefinedWeb all begin by stripping crawl HTML and
 * canonicalizing URLs for domain-level dedup/caps). Pure codegen'd
 * column programs, scan-local, no shuffle, no UDFs; every regex stays
 * in the RE2-safe subset (no backreferences, no lookaround) so an
 * external engine replays each step verbatim.
 *
 * The reference is a streaming-ETL deployment with no web-text plane;
 * these extend the engine along the training-data axis like the dedup
 * and eval families.
 */
object Web {

  /**
   * Markup → text extraction (the trafilatura/jusText role reduced to
   * its deterministic core): drop script/style element CONTENT, drop
   * comments, strip remaining tags, decode the five predefined HTML
   * entities plus decimal numeric references for ASCII, collapse
   * whitespace. Order matters and is part of the contract: script and
   * style bodies must go before the generic tag strip (their content
   * is not text), entities decode after tags (so `&lt;b&gt;` never
   * becomes a strippable tag — the classic double-decode bug), and
   * `&amp;` decodes LAST (so `&amp;lt;` yields the literal `&lt;`).
   */
  def stripMarkup(html: Column): Column = {
    val noScript = regexp_replace(html,
      "<script[^>]*>.*?</script>|<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noScript, "<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    // decimal numeric references for the ASCII range: two regex passes
    // (tens then singles) would need a callback; instead decode the
    // common text codes explicitly — a bounded, documented vocabulary
    val numeric = Seq(34 -> "\"", 38 -> "&", 39 -> "'", 60 -> "<",
      62 -> ">", 97 -> "a", 101 -> "e", 111 -> "o")
      .foldLeft(noTags) { case (c, (code, ch)) =>
        regexp_replace(c, s"&#$code;", ch)
      }
    val named = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#x27;" -> "'", "&amp;" -> "&") // amp LAST by contract
      .foldLeft(numeric) { case (c, (e, ch)) => regexp_replace(c, e, ch) }
    trim(regexp_replace(named, " +", " "))
  }

  /** Lowercased host of an absolute URL, default ports stripped
    * (`:80`, `:443`). */
  def host(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1)),
      ":(443|80)$", "")

  /** Registrable-ish domain: the last two dot-labels of the host (a
    * public-suffix list is a config concern; two labels is the
    * deterministic core the caps/blocklists key on). Any port — even a
    * non-default one [[host]] keeps in the authority — is dropped
    * first: a domain key must never fragment by port. */
  def domain(url: Column): Column =
    regexp_extract(regexp_replace(host(url), ":[0-9]+$", ""),
      "([^.]+\\.[^.]+)$", 1)

  /** Path component (no query/fragment); empty for bare hosts. */
  def path(url: Column): Column =
    regexp_extract(url, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)

  /**
   * Canonical URL: lowercase scheme and host, default port stripped,
   * fragment dropped, tracking parameters removed (`utm_*`, `fbclid`,
   * `gclid`), surviving query parameters SORTED (byte order) so
   * parameter permutations collapse to one key — the canonicalization
   * under which URL-level dedup and per-domain caps actually work.
   */
  def normalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val q = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = array_join(
      sort_array(filter(split(q, "&"),
        p => length(p) > 0 && !p.rlike("^(utm_[a-z]+|fbclid|gclid)="))),
      "&")
    concat(scheme, lit("://"), host(url), path(url),
      when(length(kept) > 0, concat(lit("?"), kept)).otherwise(lit("")))
  }
}
