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

object LlmCandidates {
  /** Parse "QUERY:"-prefixed candidate lines from raw LLM output (ref
    * inference.py:196-213). */
  def parse(raw: String): Seq[String] =
    raw.linesIterator.map(_.trim).collect {
      case l if l.toUpperCase.startsWith("QUERY:") => l.drop(6).trim
      case l if l.toUpperCase.startsWith("SELECT") => l
    }.filter(_.nonEmpty).toSeq
}
