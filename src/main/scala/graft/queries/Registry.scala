package graft.queries

/** All driver-checkable queries, one Seq per operator family. */
object Registry {
  val all: Seq[Q] =
    Relational.qs ++ DedupQueries.qs ++ VectorQueries.qs ++
      TextQueries.qs ++ ScalarQueries.qs ++ MiscQueries.qs ++
      PipelineQueries.qs ++ OlapQueries.qs ++ CorpusQueries.qs ++
      GraphQueries.qs ++ RetrievalQueries.qs ++ ReportQueries.qs ++
      PcaQueries.qs ++ C4Queries.qs ++ BpeQueries.qs ++ PqQueries.qs

  private lazy val index: Map[String, Q] = all.map(q => q.name -> q).toMap
  def byName(name: String): Q = index(name)
}
