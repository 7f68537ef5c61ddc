package graft.catalog

import java.security.MessageDigest

/**
 * Schema fingerprint (N14 in SURVEY.md §2.9; ref
 * `app/models/trainer.py:110-117`): sha256 over a canonical JSON of
 * `{table: [column names]}` with sorted keys, truncated to 16 hex chars.
 * Byte-stable: same schema → same id across runs/JVMs.
 */
object Fingerprint {

  /** Canonical JSON: keys sorted, arrays kept in given order, python-style
    * `", "` / `": "` separators so the text form is stable and readable. */
  private[catalog] def canonicalJson(schema: Map[String, Seq[String]]): String =
    schema.toSeq.sortBy(_._1).map { case (t, cols) =>
      "\"" + t + "\": [" + cols.map("\"" + _ + "\"").mkString(", ") + "]"
    }.mkString("{", ", ", "}")

  def schemaId(schema: Map[String, Seq[String]]): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val digest = md.digest(canonicalJson(schema).getBytes("UTF-8"))
    digest.map("%02x".format(_)).mkString.take(16)
  }
}
