package graft.queries

import graft.core.GQuery

/** Central registry of the engine's declared query surface. */
object Registry {
  def all: Seq[GQuery] = {
    val qs = Relational.queries ++ Joins.queries ++ Windows.queries ++
      Scalars.queries ++ DialectSql.queries ++ Dedup.queries ++
      Federation.queries ++ Similarity.queries ++ TextAnalysis.queries ++
      MediaQueries.queries ++ StreamQueries.queries ++ Pipeline.queries ++
      Curation.queries ++ VectorOps.queries ++ Clustering.queries ++
      Graph.queries ++ Events.queries
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs
  }
}
