package graft.core

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/**
 * Declarative pipeline configuration — the engine's control plane,
 * mirroring the reference's connector-config REST surface (SURVEY §3.1,
 * README.md:88-109: `{"name": ..., "config": {connector.class,
 * transforms, ...}}`). A spec is JSON-loadable so the REST-shaped
 * workflow ("PUT a JSON config, get a running pipeline") carries over;
 * `Pipeline.build` turns it into a DataFrame program and
 * `writeStream.start()` is the RUNNING task.
 */
final case class StageSpec(stageType: String, options: Map[String, String]) {
  def option(key: String): String =
    options.getOrElse(key,
      throw new IllegalArgumentException(s"$stageType: missing option '$key'"))
  def optionOr(key: String, default: String): String =
    options.getOrElse(key, default)
}

final case class PipelineSpec(name: String, source: StageSpec,
                              transforms: Seq[StageSpec], sink: StageSpec) {
  /** Canonical JSON form — parseable by [[PipelineSpec.fromJson]]
    * (fromJson(toJson) == this), so `GET /connectors/{name}` returns a
    * config the caller can PUT straight back. Jackson renders values,
    * so escaping is symmetric with the parser. */
  def toJson: String = {
    val m = new ObjectMapper()
    def stage(s: StageSpec) = {
      val n = m.createObjectNode()
      n.put("type", s.stageType)
      val o = n.putObject("options")
      s.options.toSeq.sortBy(_._1).foreach { case (k, v) => o.put(k, v) }
      n
    }
    val root = m.createObjectNode()
    root.put("name", name)
    root.set[com.fasterxml.jackson.databind.node.ObjectNode]("source", stage(source))
    val arr = root.putArray("transforms")
    transforms.foreach(t => arr.add(stage(t)))
    root.set[com.fasterxml.jackson.databind.node.ObjectNode]("sink", stage(sink))
    m.writeValueAsString(root)
  }
}

object PipelineSpec {
  private val mapper = new ObjectMapper()

  private def stage(n: JsonNode, what: String): StageSpec = {
    require(n != null && n.hasNonNull("type"), s"pipeline spec: $what needs a 'type'")
    val opts = Option(n.get("options")).map { o =>
      o.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    }.getOrElse(Map.empty[String, String])
    StageSpec(n.get("type").asText(), opts)
  }

  /** Parse a pipeline spec from its JSON form:
    * `{"name": ..., "source": {"type", "options"}, "transforms": [...],
    *   "sink": {"type", "options"}}`. */
  def fromJson(json: String): PipelineSpec = {
    val root = mapper.readTree(json)
    require(root.hasNonNull("name"), "pipeline spec: missing 'name'")
    val transforms = Option(root.get("transforms")).map { t =>
      t.elements().asScala.map(stage(_, "transform")).toSeq
    }.getOrElse(Seq.empty)
    PipelineSpec(
      root.get("name").asText(),
      stage(root.get("source"), "source"),
      transforms,
      stage(root.get("sink"), "sink"))
  }
}
