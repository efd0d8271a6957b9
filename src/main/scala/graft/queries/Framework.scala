package graft.queries

/** Engine-lifecycle proof queries (SURVEY §2A) — populated below. */
object Framework {
  val all: Seq[(String, Q)] = Seq.empty
}
