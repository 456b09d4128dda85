package graft.tools

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Local gitignored credentials file (reference src/secrets.py
  * load_local_secrets): a JSON object read from `local_secrets.json`
  * next to the working directory, overridable via the
  * LOCAL_SECRETS_FILE environment variable. Missing, unreadable, or
  * non-object content degrades to an empty object — secrets are
  * optional everywhere they're consumed.
  */
object LocalSecrets {

  val DefaultSecretsFilename = "local_secrets.json"

  private val mapper = new ObjectMapper()

  def load(path: Option[String] = None): JsonNode = {
    val candidate = path
      .orElse(sys.env.get("LOCAL_SECRETS_FILE"))
      .getOrElse(DefaultSecretsFilename)
    val f = new java.io.File(candidate)
    if (!f.isFile) mapper.createObjectNode()
    else
      try {
        val node = mapper.readTree(f)
        if (node != null && node.isObject) node else mapper.createObjectNode()
      } catch { case _: java.io.IOException => mapper.createObjectNode() }
  }

  /** Nested section as an object node ({} when absent/mistyped). */
  def section(root: JsonNode, name: String): JsonNode = {
    val n = root.path(name)
    if (n.isObject) n else mapper.createObjectNode()
  }

  def str(node: JsonNode, key: String): Option[String] = {
    val v = node.path(key)
    if (v.isTextual) Some(v.asText()) else None
  }

  def strings(node: JsonNode, key: String): Seq[String] = {
    val v = node.path(key)
    if (!v.isArray) Seq.empty
    else {
      val b = Seq.newBuilder[String]
      v.forEach(e => if (e.isTextual) b += e.asText())
      b.result()
    }
  }

  def int(node: JsonNode, key: String, default: Int): Int = {
    val v = node.path(key)
    if (v.canConvertToInt) v.asInt()
    else str(node, key).flatMap(_.toIntOption).getOrElse(default)
  }

  def bool(node: JsonNode, key: String, default: Boolean): Boolean = {
    val v = node.path(key)
    if (v.isBoolean) v.asBoolean() else default
  }
}
