package graft.gen

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.api.Engine

/**
 * HTTP LLM client against an in-process stub server (N17): success,
 * auth/payload shape, non-2xx mapping, malformed-body mapping, and
 * timeout mapping — the reference's error taxonomy
 * (`app/ai/llm.py:52-72`) — plus the end-to-end path where `Engine.ask`
 * consumes real "QUERY:" candidates through HTTP.
 */
class HttpLlmClientSpec extends AnyFunSuite {

  private def chatJson(content: String): String = {
    val esc = content.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")
    s"""{"choices": [{"message": {"role": "assistant", "content": "$esc"}}]}"""
  }

  /** Start a one-route stub server; returns (baseUrl, recorded bodies, stop). */
  private def withServer(handler: HttpExchange => (Int, String))(
      f: (String, collection.mutable.Buffer[String]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val bodies = collection.mutable.Buffer.empty[String]
    server.createContext("/v1/chat/completions", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        bodies += new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        val (code, body) = handler(ex)
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(code, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/v1", bodies)
    finally server.stop(0)
  }

  test("success path: posts the OpenAI payload shape and returns trimmed content") {
    withServer(_ => (200, chatJson("  QUERY: SELECT 1\n"))) { (base, bodies) =>
      val client = new HttpLlmClient(LlmConfig(base, "test-model", apiKey = Some("sk-x")))
      val out = client.chatComplete("sys prompt", "user \"quoted\" prompt", maxTokens = 512)
      assert(out == Right("QUERY: SELECT 1"))
      val body = bodies.head
      assert(body.contains("\"model\": \"test-model\""))
      assert(body.contains("\"temperature\": 0.1") && body.contains("\"max_tokens\": 512"))
      assert(body.contains("\"role\": \"system\"") && body.contains("user \\\"quoted\\\" prompt"))
    }
  }

  test("non-2xx status maps to a readable Left, not an exception") {
    withServer(_ => (503, """{"error": "overloaded"}""")) { (base, _) =>
      val client = new HttpLlmClient(LlmConfig(base, "m"))
      val out = client.chatComplete("s", "u")
      assert(out.isLeft && out.swap.toOption.get.contains("503"))
    }
  }

  test("malformed response body maps to a readable Left") {
    withServer(_ => (200, """{"unexpected": true}""")) { (base, _) =>
      val client = new HttpLlmClient(LlmConfig(base, "m"))
      val out = client.chatComplete("s", "u")
      assert(out.isLeft && out.swap.toOption.get.toLowerCase.contains("malformed"))
    }
    withServer(_ => (200, "not json at all {{")) { (base, _) =>
      val client = new HttpLlmClient(LlmConfig(base, "m"))
      assert(client.chatComplete("s", "u").isLeft)
    }
  }

  test("timeout maps to a readable Left within the configured budget") {
    withServer { _ => Thread.sleep(3000); (200, chatJson("late")) } { (base, _) =>
      val client = new HttpLlmClient(LlmConfig(base, "slow-model", timeoutSeconds = 1L))
      val out = client.chatComplete("s", "u")
      assert(out.isLeft && out.swap.toOption.get.toLowerCase.contains("timed out"))
    }
  }

  test("connection refusal maps to a readable Left") {
    val client = new HttpLlmClient(LlmConfig("http://127.0.0.1:1/v1", "m", timeoutSeconds = 2L))
    val out = client.chatComplete("s", "u")
    assert(out.isLeft)
  }

  test("fromEnv builds only when LLM_BASE_URL and LLM_MODEL are both set") {
    assert(HttpLlmClient.fromEnv(Map.empty).isEmpty)
    assert(HttpLlmClient.fromEnv(Map("LLM_BASE_URL" -> "http://x")).isEmpty)
    assert(HttpLlmClient.fromEnv(Map("LLM_BASE_URL" -> "http://x", "LLM_MODEL" -> "m")).isDefined)
  }
}

/** End-to-end: Engine.ask consumes QUERY: candidates through real HTTP. */
class HttpLlmEngineSpec extends SparkSpec {

  test("Engine.ask runs an LLM candidate fetched over HTTP") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/chat/completions", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val content = "QUERY: SELECT c_mktsegment, COUNT(*) AS cnt FROM customer " +
          "GROUP BY c_mktsegment ORDER BY c_mktsegment LIMIT 10"
        val body = s"""{"choices": [{"message": {"content": "$content"}}]}"""
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/v1"
      val engine = Engine.forFixtures(spark, sfDir,
        new HttpLlmClient(LlmConfig(base, "stub-model")))
      val r = engine.ask("how many customers per market segment")
      val qr = r.toOption.get
      assert(qr.sql.contains("GROUP BY c_mktsegment"))
      assert(qr.rowcount == 5)
    } finally server.stop(0)
  }
}
