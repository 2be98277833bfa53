package graft

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import graft.embed._

/** Recording client: captures every batch size it serves (JVM-static —
  * local-mode tasks share the JVM, which is exactly the pooling
  * contract under test).
  */
object RecordingState {
  val opens = new AtomicInteger(0)
  val batchSizes = new ConcurrentLinkedQueue[Integer]()
  val failuresLeft = new AtomicInteger(0)
  def reset(failFirst: Int = 0): Unit = {
    opens.set(0); batchSizes.clear(); failuresLeft.set(failFirst)
  }
}

final class RecordingClient(val dim: Int) extends EmbedClient {
  def embedBatch(texts: Seq[String]): Seq[Array[Double]] = {
    if (RecordingState.failuresLeft.getAndDecrement() > 0)
      throw new EmbedTransientException("injected transient failure")
    RecordingState.batchSizes.add(texts.length)
    texts.map(t => HashEmbedder.embedText(t, dim))
  }
}

final class RecordingFactory(dim: Int) extends EmbedClientFactory {
  def open(): EmbedClient = {
    RecordingState.opens.incrementAndGet()
    new RecordingClient(dim)
  }
  override def poolKey: String = s"recording-$dim"
}

/** Always-failing client: proves retry exhaustion propagates. */
final class DeadFactory extends EmbedClientFactory {
  def open(): EmbedClient = new EmbedClient {
    val dim = 8
    def embedBatch(texts: Seq[String]): Seq[Array[Double]] =
      throw new EmbedTransientException("service down")
  }
  override def poolKey: String = "dead"
}

class ServiceEmbedderSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 40)

  test("service path is bit-equal to the distributed hash embedder") {
    RecordingState.reset()
    val svc = new ServiceEmbedder(new RecordingFactory(64), dim = 64,
      batchSize = 16, backoffMs = 0L)
    val viaService = svc.embedDocs(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Double](1)).toMap
    val viaGroupBy = HashEmbedder.embedDocs(docs, "doc_id", "text", 64)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Double](1)).toMap
    assert(viaService.keySet == viaGroupBy.keySet && viaService.nonEmpty)
    viaService.foreach { case (id, v) =>
      v.zip(viaGroupBy(id)).foreach { case (a, b) => assert(a == b, s"doc $id") }
    }
  }

  test("rows drain in bounded batches, one RPC per batch") {
    RecordingState.reset()
    val n = docs.count()
    val svc = new ServiceEmbedder(new RecordingFactory(64), dim = 64,
      batchSize = 7, backoffMs = 0L)
    svc.embedDocs(docs.repartition(3), "doc_id", "text").count()
    val sizes = RecordingState.batchSizes.toArray(Array.empty[Integer]).map(_.toInt)
    assert(sizes.sum == n, s"every row embedded exactly once (${sizes.sum} vs $n)")
    assert(sizes.forall(_ <= 7), s"no batch exceeds batchSize: ${sizes.toSeq}")
    // ceil(rows/batch) per partition: at most one ragged tail batch
    // per partition, so calls < rows/7 + nPartitions
    assert(sizes.length <= n / 7 + 3, s"batched, not per-row: ${sizes.length} calls")
  }

  test("client is pooled: one open per JVM across partitions and jobs") {
    RecordingState.reset()
    val svc = new ServiceEmbedder(new RecordingFactory(64), dim = 64,
      batchSize = 8, backoffMs = 0L)
    svc.embedDocs(docs.repartition(4), "doc_id", "text").count()
    svc.embedDocs(docs.repartition(2), "doc_id", "text").count()
    // the factory opened at most once (0 if an earlier suite already
    // populated the pool under the same key — never once per task)
    assert(RecordingState.opens.get() <= 1,
      s"expected pooled client, got ${RecordingState.opens.get()} opens")
  }

  test("transient failures retry with backoff and recover") {
    RecordingState.reset(failFirst = 2)
    val svc = new ServiceEmbedder(new RecordingFactory(64), dim = 64,
      batchSize = 1000, maxRetries = 3, backoffMs = 0L)
    val out = svc.embedDocs(docs.coalesce(1), "doc_id", "text").count()
    assert(out == docs.count())
  }

  test("retry exhaustion surfaces the transient error") {
    val e = intercept[Exception] {
      ServiceEmbedder.withRetries(2, 0L) {
        throw new EmbedTransientException("service down")
      }
    }
    assert(e.getMessage.contains("service down"))
  }

  test("driver-side embedText goes through the same client path") {
    RecordingState.reset()
    val svc = new ServiceEmbedder(new RecordingFactory(64), dim = 64,
      batchSize = 4, backoffMs = 0L)
    val q = svc.embedText("spark hash merge")
    val expect = HashEmbedder.embedText("spark hash merge", 64)
    assert(q.toSeq == expect.toSeq)
  }

  test("null text embeds as empty string instead of NPE") {
    RecordingState.reset()
    val s = spark
    import s.implicits._
    val df = Seq((1L, "hello world"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val svc = new ServiceEmbedder(new RecordingFactory(64), dim = 64,
      batchSize = 4, backoffMs = 0L)
    val out = svc.embedDocs(df, "doc_id", "text").collect()
    assert(out.length == 2)
    val nullVec = out.find(_.getLong(0) == 2L).get.getSeq[Double](1)
    assert(nullVec == HashEmbedder.embedText("", 64).toSeq)
  }

  test("streaming ingest embeds through the service path, batch-equal per row") {
    RecordingState.reset()
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val svc = new ServiceEmbedder(new RecordingFactory(64), dim = 64,
      batchSize = 4, backoffMs = 0L)
    // embedDocs is a stateless mapPartitions, so the SAME code path
    // runs under Structured Streaming with no changes
    val embedded = svc.embedDocs(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = embedded.writeStream.format("memory")
      .queryName("svc_stream_out").outputMode("append").start()
    try {
      input.addData((1L, "spark hash merge"), (2L, "hello world"))
      q.processAllAvailable()
      input.addData((3L, "streaming batch parity"))
      q.processAllAvailable()
      val out = s.table("svc_stream_out").collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      assert(out.keySet == Set(1L, 2L, 3L))
      assert(out(1L) == HashEmbedder.embedText("spark hash merge", 64).toSeq)
      assert(out(3L) == HashEmbedder.embedText("streaming batch parity", 64).toSeq)
    } finally q.stop()
  }

  test("the chunk→embed→search pipeline runs unchanged on the service embedder") {
    RecordingState.reset()
    val d = Tables.documents(spark, sfDir).filter(col("doc_id") < 30)
    val queryText = graft.text.Chunker.chunkDocs(d, 500, 400)
      .filter(col("doc_id") === 3 && col("chunk_id") === 0)
      .select("chunk").collect().head.getString(0)
    val svc = new ServiceEmbedder(new RecordingFactory(64), dim = 64,
      batchSize = 16, backoffMs = 0L)
    val top = Embedder.chunkEmbedSearch(d, svc, 500, 400, queryText, 3).collect()
    assert(top.nonEmpty)
    assert(top.head.getAs[Long]("ckey") == 3000L, "self-match ranks first")
    assert(math.abs(top.head.getAs[Double]("score") - 1.0) < 1e-9)
  }

  // ---- HttpEmbedClient against a local stub vectorizer ------------

  /** Stub of the reference vectorizer API (document_ingestor.py:
    * 587–633 protocol): `/vectorizer/string/` takes {"text": t} and
    * answers {"vectorized text": "<json vector>"} (the vector is a
    * JSON-ENCODED STRING, as the reference's json.loads implies);
    * `/vectorizer/list/` takes {"texts": [...]}. Vectors are the
    * deterministic hash embedding, so HTTP results are comparable to
    * the in-process embedder. `failQueue` makes the next requests
    * answer a given status first — the 429/503/timeout ladder.
    */
  private def withStubServer(dim: Int)(
      body: (Int, java.util.concurrent.ConcurrentLinkedQueue[Integer],
             AtomicInteger) => Unit): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val failQueue = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
    val hits = new AtomicInteger(0)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def handler(single: Boolean): com.sun.net.httpserver.HttpHandler =
      exchange => {
        hits.incrementAndGet()
        val fail = failQueue.poll()
        if (fail != null) {
          val msg = "injected".getBytes("UTF-8")
          exchange.sendResponseHeaders(fail.intValue(), msg.length)
          exchange.getResponseBody.write(msg)
          exchange.close()
        } else {
          val req = mapper.readTree(exchange.getRequestBody)
          val resp = mapper.createObjectNode()
          if (single) {
            val v = HashEmbedder.embedText(req.get("text").asText(), dim)
            resp.put("vectorized text", mapper.writeValueAsString(v))
          } else {
            val ts = req.get("texts")
            val vs: Array[Array[Double]] = (0 until ts.size())
              .map(i => HashEmbedder.embedText(ts.get(i).asText(), dim))
              .toArray
            resp.put("vectorized texts", mapper.writeValueAsString(vs))
          }
          val out = mapper.writeValueAsBytes(resp)
          exchange.getResponseHeaders.set("Content-Type", "application/json")
          exchange.sendResponseHeaders(200, out.length)
          exchange.getResponseBody.write(out)
          exchange.close()
        }
      }
    server.createContext("/vectorizer/string/", handler(single = true))
    server.createContext("/vectorizer/list/", handler(single = false))
    server.start()
    try body(server.getAddress.getPort, failQueue, hits)
    finally server.stop(0)
  }

  test("HTTP client embeds through the real wire protocol, equal to the hash embedder") {
    withStubServer(64) { (port, _, hits) =>
      val svc = new ServiceEmbedder(
        new HttpEmbedClientFactory("127.0.0.1", port, 64), dim = 64,
        batchSize = 16, backoffMs = 0L)
      val viaHttp = svc.embedDocs(docs, "doc_id", "text")
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Double](1)).toMap
      val viaGroupBy = HashEmbedder.embedDocs(docs, "doc_id", "text", 64)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Double](1)).toMap
      assert(viaHttp == viaGroupBy)
      assert(hits.get() > 0)
      // driver-side single text goes through /vectorizer/string/
      assert(svc.embedText("alpha beta").toSeq ==
        HashEmbedder.embedText("alpha beta", 64).toSeq)
    }
  }

  test("HTTP 429/503 answers retry with backoff and recover") {
    withStubServer(8) { (port, failQueue, hits) =>
      failQueue.add(429); failQueue.add(503)
      val svc = new ServiceEmbedder(
        new HttpEmbedClientFactory("127.0.0.1", port, 8), dim = 8,
        maxRetries = 3, backoffMs = 1L)
      val v = svc.embedText("retry me")
      assert(v.toSeq == HashEmbedder.embedText("retry me", 8).toSeq)
      assert(hits.get() == 3, s"expected 2 failures + 1 success, got ${hits.get()}")
    }
  }

  test("HTTP 400 is fatal immediately — no retry burn on protocol errors") {
    withStubServer(8) { (port, failQueue, hits) =>
      failQueue.add(400)
      val svc = new ServiceEmbedder(
        new HttpEmbedClientFactory("127.0.0.1", port, 8), dim = 8,
        maxRetries = 3, backoffMs = 1L)
      val e = intercept[RuntimeException](svc.embedText("bad"))
      assert(!e.isInstanceOf[EmbedTransientException])
      assert(e.getMessage.contains("400"))
      assert(hits.get() == 1, s"400 must not retry, got ${hits.get()} requests")
    }
  }

  test("HTTP connection refusal is transient: exhausts retries then surfaces") {
    // a port with no listener — connection refused on every attempt
    val deadPort = {
      val ss = new java.net.ServerSocket(0)
      val p = ss.getLocalPort; ss.close(); p
    }
    val svc = new ServiceEmbedder(
      new HttpEmbedClientFactory("127.0.0.1", deadPort, 8,
        requestTimeoutMs = 500L), dim = 8, maxRetries = 1, backoffMs = 1L)
    intercept[EmbedTransientException](svc.embedText("nobody home"))
  }
}
