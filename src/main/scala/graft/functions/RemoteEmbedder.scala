package graft.functions

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper

/**
 * Remote HTTP embedding source — the implementation slot for the
 * reference's Cohere client (app/utils/embedding.py:28-63), shaped
 * request-for-request so a user can point it at the same endpoint:
 *
 *   POST {baseUrl}/embed
 *   Authorization: Bearer {apiKey}
 *   {"texts": [...], "model": "...", "input_type": "search_document"}
 *
 * and reads `embeddings.float` from the 200 response. Error mapping
 * mirrors the reference: non-200 raises with the response body
 * (embedding.py:55-57), a timeout raises its own message
 * (embedding.py:59-61), and a missing API key fails at construction
 * (embedding.py:19-21).
 *
 * OFF by default: the engine's default embedder stays the hermetic
 * `HashingEmbedder` (seeded, reproducible); this class is constructed
 * explicitly by callers who want the network source. It is
 * Serializable (the HTTP client rebuilds per executor via transient
 * lazy), so `Embedder.embedColumn(RemoteEmbedder(cfg))` distributes —
 * each task embeds its partition's batch with its own connection, no
 * driver funnel.
 */
final case class RemoteEmbedderConfig(
    baseUrl: String,
    apiKey: String,
    model: String = "embed-v4.0",          // config.py:19
    dimension: Int = 1024,                  // config.py:20
    timeoutSeconds: Long = 30L)             // config.py request_timeout_seconds

final case class RemoteEmbedder(cfg: RemoteEmbedderConfig) extends Embedder {
  require(cfg.apiKey != null && cfg.apiKey.nonEmpty,
    "API key is required. Set it in RemoteEmbedderConfig.apiKey.")

  def dimension: Int = cfg.dimension

  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(cfg.timeoutSeconds))
    .build()
  @transient private lazy val mapper = new ObjectMapper()

  def embed(texts: Seq[String]): Seq[Array[Float]] = {
    if (texts.isEmpty) return Seq.empty
    val payload = {
      val root = mapper.createObjectNode()
      val arr = root.putArray("texts")
      texts.foreach(t => arr.add(if (t == null) "" else t))
      root.put("model", cfg.model)
      root.put("input_type", "search_document") // embedding.py:40
      mapper.writeValueAsString(root)
    }
    val request = HttpRequest.newBuilder()
      .uri(URI.create(s"${cfg.baseUrl}/embed"))
      .timeout(Duration.ofSeconds(cfg.timeoutSeconds))
      .header("Authorization", s"Bearer ${cfg.apiKey}")
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(payload))
      .build()
    val response =
      try client.send(request, HttpResponse.BodyHandlers.ofString())
      catch {
        case _: java.net.http.HttpTimeoutException =>
          throw new RuntimeException("Timeout while generating embeddings")
      }
    if (response.statusCode() != 200)
      throw new RuntimeException(
        s"Failed to generate embeddings: ${response.body()}")
    val floats = mapper.readTree(response.body()).path("embeddings").path("float")
    require(floats.isArray && floats.size() == texts.size,
      s"embedding response carried ${floats.size()} vectors for ${texts.size} texts")
    (0 until floats.size()).map { i =>
      val row = floats.get(i)
      val v = new Array[Float](row.size())
      var j = 0
      while (j < v.length) { v(j) = row.get(j).floatValue(); j += 1 }
      v
    }
  }
}
