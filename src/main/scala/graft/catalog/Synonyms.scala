package graft.catalog

/**
 * Synonym mining over table/column names (N13 in SURVEY.md §2.9; ref
 * `app/schema/crawler.py:278-311`, `app/mongodb_adapter.py:298-327`):
 * underscore→space variants, singular↔plural (-s), and `*_id` → base name.
 * Stored in the engine's catalog sidecar to aid schema linking.
 */
object Synonyms {

  def forName(name: String): Seq[String] = {
    val n = name.toLowerCase
    val out = collection.mutable.LinkedHashSet.empty[String]
    if (n.contains("_")) out += n.replace("_", " ")
    if (n.endsWith("s") && n.length > 1) out += n.dropRight(1)
    else out += n + "s"
    if (n.endsWith("_id") && n.length > 3) {
      val base = n.dropRight(3)
      out += base
      out += base + "s"
    }
    out.toSeq.filterNot(_ == n)
  }

  /** `{name -> synonyms}` for every table and column name in a schema. */
  def mine(schema: Map[String, Seq[String]]): Map[String, Seq[String]] = {
    val names = schema.keys ++ schema.values.flatten
    names.map(n => n -> forName(n)).filter(_._2.nonEmpty).toMap
  }
}
