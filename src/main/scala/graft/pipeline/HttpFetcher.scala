package graft.pipeline

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** HTTP implementation of [[Ingest.Fetcher]] over `java.net.http.HttpClient`
  * — the real-ingestion counterpart of the reference's
  * `requests.get(...).raise_for_status()`
  * (`/root/reference/dags/fetch_data_with_meta_from_api.py:22,44`).
  *
  *  - `total()` probes `metaUrl` and reads the JSON `total` field
  *    (string or number, like Python's `int(json['total'])`).
  *  - `page(n, perPage)` GETs `pageUrl?per_page=..&page=..` and flattens
  *    each object of the JSON array to string fields (null JSON values
  *    are absent from the map, so the CSV writer emits empty fields —
  *    `brewery.get(key)` → None parity).
  *  - Any non-2xx response throws (raise_for_status parity). 5xx and
  *    connect/read errors get `maxRetries` bounded retries with
  *    exponential backoff — GETs are idempotent; 4xx never retries.
  *
  * Serializable for [[Ingest.ingestDistributed]] executor fan-out: the
  * client and JSON mapper are `@transient lazy`, rebuilt per JVM.
  */
final class HttpFetcher(metaUrl: String, pageUrl: String,
                        maxRetries: Int = 3, backoffMs: Long = 200,
                        timeoutSec: Long = 30)
    extends Ingest.Fetcher {

  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(timeoutSec))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  @transient private lazy val mapper = new ObjectMapper()

  override def total(): Int = {
    val node = mapper.readTree(get(metaUrl))
    require(node.hasNonNull("total"),
      s"meta response from $metaUrl lacks a 'total' field: $node")
    node.get("total").asText().toInt
  }

  override def page(n: Int, perPage: Int): Seq[Map[String, String]] = {
    // honor an existing query string on the base URL
    val sep = if (pageUrl.contains("?")) "&" else "?"
    val body = get(s"$pageUrl${sep}per_page=$perPage&page=$n")
    val arr = mapper.readTree(body)
    require(arr.isArray, s"expected JSON array from $pageUrl, got ${arr.getNodeType}")
    val out = Seq.newBuilder[Map[String, String]]
    arr.forEach { obj: JsonNode =>
      val m = Map.newBuilder[String, String]
      obj.fields().forEachRemaining { e =>
        if (!e.getValue.isNull) m += e.getKey -> e.getValue.asText()
      }
      out += m.result()
    }
    out.result()
  }

  /** GET with raise-on-non-2xx and bounded retry (5xx / IO only). */
  private def get(url: String): String = {
    var lastErr: Throwable = null
    var attempt = 0
    while (attempt <= maxRetries) {
      if (attempt > 0) Thread.sleep(backoffMs << (attempt - 1))
      try {
        val req = HttpRequest.newBuilder(URI.create(url))
          .timeout(Duration.ofSeconds(timeoutSec)).GET().build()
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        val code = resp.statusCode()
        if (code >= 200 && code < 300) return resp.body()
        val err = new IllegalStateException(s"HTTP $code for $url")
        if (code < 500) throw err // 4xx: caller error, never retried
        lastErr = err
      } catch {
        case e: java.io.IOException => lastErr = e // connect/read failure: retry
        case e: InterruptedException =>
          Thread.currentThread().interrupt(); throw new RuntimeException(e)
      }
      attempt += 1
    }
    throw lastErr
  }
}
