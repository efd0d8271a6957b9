package graft.queries

/** LLM-data-pipeline tier (dedup, similarity, text analysis, multimodal). */
object Extensions {
  val all: Seq[(String, Q)] = Seq.empty
}
