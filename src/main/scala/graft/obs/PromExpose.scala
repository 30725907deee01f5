package graft.obs

/**
 * Prometheus text exposition rendering — the serving half of the
 * reference's observability loop. The reference runs a JMX→Prometheus
 * javaagent inside the worker serving `:9876/metrics`
 * (`docker-compose.yaml:146-148,112`) and Prometheus scrapes it
 * (`prometheus/prometheus.yml`, `docker-compose.yaml:176-182`);
 * here the engine's own `MetricsFeed` gauges render in the same
 * text format (0.0.4) behind the control-plane HTTP server, so the
 * SAME scrape loop this engine runs against external targets
 * (`HttpScrapeLoop` → `PromText.parse`) closes over its own metrics —
 * spec-pinned as an exact roundtrip.
 *
 * Rendering is driver-local string work over one-value-per-series
 * gauges (bounded by |metrics| × |queries|) — no Spark job, safe to
 * serve from the single-threaded control-plane executor.
 */
object PromExpose {

  private def escapeLabel(v: String): String =
    v.flatMap {
      case '\\' => "\\\\"
      case '"'  => "\\\""
      case '\n' => "\\n"
      case c    => c.toString
    }

  private def fmt(v: Double): String =
    if (v.isNaN) "NaN"
    else if (v.isPosInfinity) "+Inf"
    else if (v.isNegInfinity) "-Inf"
    else v.toString

  /** Render latest gauge readings as exposition text: one `# TYPE`
    * header per metric, one `name{query="…"} value` line per series.
    * `prefix` namespaces the engine's metrics (`graft_` by default —
    * the exporter-style job prefix). */
  def render(latest: Seq[(String, String, Double)],
             prefix: String = "graft_"): String = {
    val sb = new StringBuilder
    latest.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (name, series) =>
      sb.append(s"# TYPE $prefix$name gauge\n")
      series.sortBy(_._2).foreach { case (_, query, v) =>
        sb.append(s"""$prefix$name{query="${escapeLabel(query)}"} ${fmt(v)}""")
          .append('\n')
      }
    }
    sb.result()
  }
}
