package graft.catalog

import graft.core.QueryDef

/** Registry of every verifiable operator demonstration. SparkEntry
  * derives its `queries` / `oracleSql` maps from here so the names can
  * never drift apart. */
object Catalog {
  def all: Seq[QueryDef] =
    CoreQueries.all ++ ExtendedQueries.all ++ DeltaQueries.all ++
      AnalyticsQueries.all ++ WarehouseQueries.all ++ GraphQueries.all ++
      ProfilingQueries.all ++ RankStatsQueries.all ++
      RobustStatsQueries.all ++ TimeSeriesQueries.all ++
      TokenizerQueries.all ++ LlmQueries.all

  def byName: Map[String, QueryDef] = {
    val defs = all
    require(defs.map(_.name).distinct.size == defs.size, "duplicate query names")
    defs.map(q => q.name -> q).toMap
  }
}
