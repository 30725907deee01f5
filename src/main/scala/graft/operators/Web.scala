package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /**
   * Domain-level boilerplate line removal (the CCNet/RefinedWeb stage
   * after markup strip: every page of a site repeats its header, nav,
   * and footer lines — per-line document frequency within the domain
   * separates template from content where per-document rules cannot):
   * a line is boilerplate iff it appears in at least `minDf` DISTINCT
   * documents of the same domain; such lines are removed from every
   * document, content lines keep their original order.
   *
   * Output: input columns + `clean_text` (surviving lines joined by
   * `\n`), `n_lines`, `n_lines_removed`.
   *
   * Scale shape (the [[graft.operators.Dedup.rebuildFromSpanVerdicts]]
   * posture): the DF count and the verdict join move only
   * (domain, 64-bit line hash, id, pos) rows — line TEXT never enters
   * any exchange — and the rebuild is in-row: removed positions come
   * back as a thin per-doc int array and `clean_text` filters the
   * original split in place. State is bounded by distinct
   * (domain, line) pairs, which template repetition makes tiny
   * relative to the corpus.
   */
  def dropBoilerplateLines(docs: DataFrame, idCol: String,
                           domainCol: String, textCol: String,
                           minDf: Int): DataFrame = {
    val lines = split(col(textCol), "\n")
    val exploded = lineHashRows(docs, idCol, domainCol, textCol)
    val boiler = templateFilter(exploded, minDf)
    val removedPos = exploded.join(boiler, Seq("__dom", "__lh"))
      .groupBy("__id")
      .agg(sort_array(collect_list(col("__pos"))).as("__removed"))
    docs.join(removedPos, col(idCol) === col("__id"), "left")
      .withColumn("n_lines", size(lines).cast("long"))
      .withColumn("n_lines_removed",
        coalesce(size(col("__removed")), lit(0)).cast("long"))
      .withColumn("clean_text", array_join(
        filter(lines, (_, i) => !array_contains(
          coalesce(col("__removed"), array().cast("array<int>")), i)), "\n"))
      .drop("__id", "__removed")
  }

  /** One row per line occurrence: (`__id`, `__dom`, `__pos`, `__lh` =
    * 64-bit line hash). Line text never leaves the scan projection. */
  private def lineHashRows(docs: DataFrame, idCol: String,
                           domainCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("__id"), col(domainCol).as("__dom"),
        split(col(textCol), "\n").as("__ls"))
      .select(col("__id"), col("__dom"),
        posexplode(col("__ls")).as(Seq("__pos", "__l")))
      .select(col("__id"), col("__dom"), col("__pos"),
        xxhash64(col("__l")).as("__lh"))

  private def templateFilter(exploded: DataFrame, minDf: Int): DataFrame = {
    require(minDf >= 2, "minDf must be >= 2 (1 would remove every line)")
    exploded
      .groupBy("__dom", "__lh")
      .agg(countDistinct(col("__id")).as("__df"))
      .filter(col("__df") >= minDf)
      .select(col("__dom"), col("__lh"))
  }

  /**
   * Per-domain template table: the (domain, 64-bit line hash) pairs
   * whose per-line distinct-document frequency within the domain
   * reaches `minDf` — the persisted artifact incremental boilerplate
   * removal consults (the `Dedup.fingerprints` analogue for the Web
   * family). 16 B per template line; re-learn on yesterday's corpus,
   * apply to today's crawl with [[dropKnownBoilerplate]].
   * Output columns: (`domain`, `line_h`).
   */
  def boilerplateTemplates(docs: DataFrame, idCol: String,
                           domainCol: String, textCol: String,
                           minDf: Int): DataFrame =
    templateFilter(lineHashRows(docs, idCol, domainCol, textCol), minDf)
      .select(col("__dom").as("domain"), col("__lh").as("line_h"))

  /**
   * Remove KNOWN template lines — a precomputed [[boilerplateTemplates]]
   * table — from documents. Stateless per row once the domain's
   * template list joins in, so it runs UNCHANGED on an unbounded
   * stream (stream-static broadcast join on the domain + in-row line
   * filter — the `corpusFreqStatsAgainst` pattern): where
   * [[dropBoilerplateLines]] must see the whole corpus to COUNT,
   * this applies yesterday's learned templates to today's pages as
   * they arrive. Applied to the SAME corpus the templates were
   * learned from, the two produce identical output (the spec pins
   * it, batch and streaming).
   *
   * Output contract matches [[dropBoilerplateLines]]: input columns +
   * `clean_text`, `n_lines`, `n_lines_removed`.
   */
  def dropKnownBoilerplate(docs: DataFrame, domainCol: String,
                           textCol: String, templates: DataFrame): DataFrame = {
    val tmap = templates.groupBy(col("domain").as("__tdom"))
      .agg(sort_array(collect_list(col("line_h"))).as("__tl"))
    val tl = coalesce(col("__tl"), array().cast("array<bigint>"))
    docs.join(broadcast(tmap), col(domainCol) === col("__tdom"), "left")
      // the split materializes before the lambdas read it (the
      // wordShinglesOf perf contract)
      .withColumn("__lsr", split(col(textCol), "\n"))
      .withColumn("n_lines", size(col("__lsr")).cast("long"))
      .withColumn("clean_text", array_join(
        filter(col("__lsr"), l => !array_contains(tl, xxhash64(l))), "\n"))
      .withColumn("n_lines_removed",
        (col("n_lines") -
          size(filter(col("__lsr"), l => !array_contains(tl, xxhash64(l))))
            .cast("long")).cast("long"))
      .drop("__tdom", "__tl", "__lsr")
  }
}
