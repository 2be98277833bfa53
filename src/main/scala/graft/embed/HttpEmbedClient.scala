package graft.embed

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper

/** Concrete HTTP [[EmbedClient]] for the reference's vectorizer
  * service (app/core/document_ingestor.py:587–633): POSTs JSON to
  * `/vectorizer/string/` (single text, `{"text": ...}` →
  * `{"vectorized text": <json vector>}`) and `/vectorizer/list/`
  * (batch, `{"texts": [...]}` → `{"vectorized texts": <json
  * vectors>}`), with the reference's 10 s request timeout.
  *
  * Transport errors and retryable statuses (408/429/5xx) raise
  * [[EmbedTransientException]] so [[ServiceEmbedder]]'s exponential
  * backoff drives the retry loop (the reference retries 5× inline —
  * here retry policy lives in ONE place for every client); any other
  * non-200 is a fatal protocol error and fails the task immediately.
  *
  * One instance holds one pooled [[HttpClient]]; [[ClientPool]] keys
  * it per (host, port, dim) per executor JVM — the long-lived
  * `requests.Session` the reference keeps, in Spark's executor model.
  */
final class HttpEmbedClient(host: String, port: Int, val dim: Int,
                            requestTimeoutMs: Long = 10000L)
    extends EmbedClient {

  private val base = s"http://$host:$port"
  private val stringUrl = URI.create(s"$base/vectorizer/string/")
  private val listUrl = URI.create(s"$base/vectorizer/list/")
  private val mapper = new ObjectMapper()
  private val http = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(requestTimeoutMs))
    .build()

  private def post(url: URI, body: String): String = {
    val req = HttpRequest.newBuilder(url)
      .header("Content-Type", "application/json")
      .header("Accept", "application/json")
      .timeout(Duration.ofMillis(requestTimeoutMs))
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .build()
    val resp =
      try http.send(req, HttpResponse.BodyHandlers.ofString())
      catch {
        case e: java.io.IOException =>
          throw new EmbedTransientException(s"vectorizer I/O: ${e.getMessage}", e)
        case e: java.net.http.HttpTimeoutException =>
          throw new EmbedTransientException(s"vectorizer timeout", e)
      }
    resp.statusCode() match {
      case 200 => resp.body()
      case s if s == 408 || s == 429 || s >= 500 =>
        throw new EmbedTransientException(s"vectorizer HTTP $s: ${resp.body()}")
      case s =>
        throw new RuntimeException(s"vectorizer HTTP $s: ${resp.body()}")
    }
  }

  /** The payload fields are JSON-ENCODED STRINGS in the reference
    * protocol (`json.loads(response_json["vectorized text"])`); a
    * direct array value is accepted too.
    */
  private def vectorsField(body: String, field: String)
      : com.fasterxml.jackson.databind.JsonNode = {
    val root = mapper.readTree(body)
    val node = root.get(field)
    require(node != null, s"vectorizer response missing '$field': $body")
    if (node.isTextual) mapper.readTree(node.asText()) else node
  }

  private def toVec(node: com.fasterxml.jackson.databind.JsonNode)
      : Array[Double] = {
    val out = new Array[Double](node.size())
    var i = 0
    while (i < out.length) { out(i) = node.get(i).asDouble(); i += 1 }
    out
  }

  def embedBatch(texts: Seq[String]): Seq[Array[Double]] = texts match {
    case Seq(one) =>
      val req = mapper.createObjectNode()
      req.put("text", one)
      Seq(toVec(vectorsField(post(stringUrl, mapper.writeValueAsString(req)),
        "vectorized text")))
    case many =>
      val req = mapper.createObjectNode()
      val arr = req.putArray("texts")
      many.foreach(arr.add)
      val vs = vectorsField(post(listUrl, mapper.writeValueAsString(req)),
        "vectorized texts")
      (0 until vs.size()).map(i => toVec(vs.get(i)))
  }
}

/** Serializable factory: opens the pooled client on each executor. */
final class HttpEmbedClientFactory(host: String, port: Int, dim: Int,
                                   requestTimeoutMs: Long = 10000L)
    extends EmbedClientFactory {
  def open(): EmbedClient =
    new HttpEmbedClient(host, port, dim, requestTimeoutMs)
  override def poolKey: String = s"http-$host-$port-$dim"
}
