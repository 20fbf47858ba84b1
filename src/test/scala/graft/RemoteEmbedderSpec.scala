package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{RemoteEmbedder, RemoteEmbedderConfig}

/** Hermetic drive of the remote-embedder slot against a local stub
  * server: batch POST shape, auth header, success parse, error mapping,
  * timeout mapping — no network, mirroring embedding.py:28-63 behavior. */
class RemoteEmbedderSpec extends AnyFunSuite {

  private def withServer(handler: HttpExchange => Unit)(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/embed", (ex: HttpExchange) => handler(ex))
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  test("batch POST carries texts/model/input_type and the Bearer header") {
    @volatile var seenAuth: String = null
    @volatile var seenBody: String = null
    withServer { ex =>
      seenAuth = ex.getRequestHeaders.getFirst("Authorization")
      seenBody = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      respond(ex, 200,
        """{"embeddings":{"float":[[1.0,0.0],[0.5,0.5]]}}""")
    } { url =>
      val e = RemoteEmbedder(RemoteEmbedderConfig(url, apiKey = "k123", dimension = 2))
      val out = e.embed(Seq("alpha", "beta"))
      assert(out.map(_.toSeq) == Seq(Seq(1.0f, 0.0f), Seq(0.5f, 0.5f)))
      assert(seenAuth == "Bearer k123")
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(seenBody)
      assert(node.get("texts").size() == 2)
      assert(node.get("texts").get(0).asText() == "alpha")
      assert(node.get("model").asText() == "embed-v4.0")
      assert(node.get("input_type").asText() == "search_document")
    }
  }

  test("non-200 raises with the response body (reference error mapping)") {
    withServer { ex => respond(ex, 429, """{"message":"rate limited"}""") } { url =>
      val e = RemoteEmbedder(RemoteEmbedderConfig(url, apiKey = "k"))
      val ex = intercept[RuntimeException] { e.embed(Seq("x")) }
      assert(ex.getMessage.startsWith("Failed to generate embeddings:"))
      assert(ex.getMessage.contains("rate limited"))
    }
  }

  test("timeout raises the reference's timeout message") {
    withServer { ex =>
      Thread.sleep(3000)
      respond(ex, 200, """{"embeddings":{"float":[[0.0]]}}""")
    } { url =>
      val e = RemoteEmbedder(RemoteEmbedderConfig(url, apiKey = "k", timeoutSeconds = 1L))
      val ex = intercept[RuntimeException] { e.embed(Seq("x")) }
      assert(ex.getMessage == "Timeout while generating embeddings")
    }
  }

  test("missing api key fails at construction; count mismatch rejected") {
    intercept[IllegalArgumentException] {
      RemoteEmbedder(RemoteEmbedderConfig("http://localhost:9", apiKey = ""))
    }
    withServer { ex =>
      respond(ex, 200, """{"embeddings":{"float":[[1.0]]}}""") // 1 vec for 2 texts
    } { url =>
      val e = RemoteEmbedder(RemoteEmbedderConfig(url, apiKey = "k"))
      intercept[IllegalArgumentException] { e.embed(Seq("a", "b")) }
    }
  }

  test("empty batch short-circuits without a request") {
    val e = RemoteEmbedder(RemoteEmbedderConfig("http://127.0.0.1:9", apiKey = "k"))
    assert(e.embed(Seq.empty).isEmpty) // port 9 would refuse: proves no call
  }

  test("survives java serialization (executor shipping)") {
    val e = RemoteEmbedder(RemoteEmbedderConfig("http://127.0.0.1:9", apiKey = "k"))
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(e)
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray)).readObject()
      .asInstanceOf[RemoteEmbedder]
    assert(back.cfg == e.cfg && back.dimension == e.dimension)
  }
}
