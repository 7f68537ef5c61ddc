package graft.gen

/**
 * Pluggable LLM client trait (N9/N17 in SURVEY.md §2.9; ref
 * `app/ai/llm.py:23-72`, `app/models/inference.py:151-213`). The engine is
 * fully functional offline: when no client is configured, generation falls
 * back to the deterministic `Templates` path — preserving the reference's
 * trained-model → LLM → template fallback chain (V14, routes_ai.py:173-226).
 */
trait LlmClient {
  /** OpenAI-style chat completion; returns raw assistant text. */
  def chatComplete(system: String, user: String, maxTokens: Int = 256): Either[String, String]
}

/** Offline default: always unavailable, forcing the template path. */
object NoOpLlmClient extends LlmClient {
  def chatComplete(system: String, user: String, maxTokens: Int): Either[String, String] =
    Left("no LLM configured (offline mode)")
}

/** Connection settings for an OpenAI-compatible endpoint (ref
  * `app/settings.py` LLM_BASE_URL / LLM_MODEL / LLM_API_KEY; candidate
  * generation uses the longer 90s timeout + 512 tokens,
  * `app/models/inference.py:186-213`). */
final case class LlmConfig(
    baseUrl: String,
    model: String,
    apiKey: Option[String] = None,
    timeoutSeconds: Long = 60L)

/**
 * OpenAI-compatible chat-completions client over `java.net.http` (N17;
 * ref `app/ai/llm.py:23-72`): POSTs
 * `{model, messages: [system, user], temperature: 0.1, max_tokens}` to
 * `<base>/chat/completions`, optional Bearer auth, and maps every
 * failure class to a human-readable Left — timeout, connection refusal,
 * non-2xx status, malformed body — so `Engine.ask` degrades to the
 * template path instead of throwing (V14 fallback chain).
 */
final class HttpLlmClient(config: LlmConfig) extends LlmClient {
  import java.net.http.{HttpClient, HttpRequest, HttpResponse}

  private val http: HttpClient = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(config.timeoutSeconds))
    .build()

  def chatComplete(system: String, user: String, maxTokens: Int = 256): Either[String, String] = {
    import graft.api.Responses.jsonString
    val body =
      s"""{"model": ${jsonString(config.model)}, "messages": [""" +
        s"""{"role": "system", "content": ${jsonString(system)}}, """ +
        s"""{"role": "user", "content": ${jsonString(user)}}], """ +
        s""""temperature": 0.1, "max_tokens": $maxTokens}"""
    val builder = HttpRequest.newBuilder()
      .uri(java.net.URI.create(config.baseUrl.stripSuffix("/") + "/chat/completions"))
      .timeout(java.time.Duration.ofSeconds(config.timeoutSeconds))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body))
    config.apiKey.foreach(k => builder.header("Authorization", s"Bearer $k"))
    try {
      val resp = http.send(builder.build(), HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        Left(s"LLM service returned error ${resp.statusCode()}: ${resp.body().take(500)}")
      else parseContent(resp.body())
    } catch {
      case _: java.net.http.HttpTimeoutException =>
        Left(s"LLM request timed out after ${config.timeoutSeconds} seconds (model ${config.model})")
      case e: java.net.ConnectException =>
        Left(s"Could not connect to LLM service at ${config.baseUrl}: ${Option(e.getMessage).getOrElse("")}")
      case e: java.io.IOException =>
        Left(s"LLM request failed: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(500)}")
    }
  }

  /** `choices[0].message.content`, trimmed (ref llm.py:48-51). */
  private def parseContent(raw: String): Either[String, String] =
    try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(raw)
      val content = root.path("choices").path(0).path("message").path("content")
      if (content.isMissingNode || !content.isTextual)
        Left(s"Malformed LLM response (no choices[0].message.content): ${raw.take(200)}")
      else Right(content.asText.trim)
    } catch {
      case e: Exception => Left(s"Malformed LLM response JSON: ${Option(e.getMessage).getOrElse("").take(200)}")
    }
}

object HttpLlmClient {
  /** Build from LLM_BASE_URL / LLM_MODEL / LLM_API_KEY env vars; None
    * when unconfigured (offline mode — ref llm.py:16-18 raises
    * LLMNotConfigured; here the caller falls back to NoOpLlmClient). */
  def fromEnv(env: Map[String, String] = sys.env): Option[HttpLlmClient] =
    for {
      base <- env.get("LLM_BASE_URL").filter(_.nonEmpty)
      model <- env.get("LLM_MODEL").filter(_.nonEmpty)
    } yield new HttpLlmClient(LlmConfig(base, model, env.get("LLM_API_KEY").filter(_.nonEmpty)))
}

object LlmCandidates {
  /** Parse "QUERY:"-prefixed candidate lines from raw LLM output (ref
    * inference.py:196-213). */
  def parse(raw: String): Seq[String] =
    raw.linesIterator.map(_.trim).collect {
      case l if l.toUpperCase.startsWith("QUERY:") => l.drop(6).trim
      case l if l.toUpperCase.startsWith("SELECT") => l
    }.filter(_.nonEmpty).toSeq
}
