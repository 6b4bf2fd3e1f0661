package graft

import graft.queries._

/** The judge-facing query inventory: one entry per implemented operator
  * (SURVEY §2 + north-star extensions), each with a DuckDB oracle where the
  * semantics are SQL-expressible.
  *
  * Conventions (driver hash-compare safety):
  *  - every column aliased identically in Spark and SQL;
  *  - timestamps emitted as epoch-seconds BIGINT (integer round-trips
  *    engine-to-engine bit-exactly, minute-aligned timestamps may not);
  *  - double aggregates rounded (2 dp for large sums, 4–6 dp otherwise);
  *  - DuckDB `sum(BIGINT)` returns HUGEINT → always CAST sums explicitly;
  *  - Spark int-typed scalars cast to long (DuckDB scalar fns yield BIGINT);
  *  - deterministic sets only: ties broken by a unique key before any limit.
  */
object Queries {
  val all: Map[String, Q] =
    EventQueries.all ++ RelationalQueries.all ++ TextQueries.all ++
      SimilarityQueries.all ++ StreamingQueries.all ++ MultimodalQueries.all ++
      AdvancedQueries.all ++ SqlQueries.all ++ SourceQueries.all ++
      LineQueries.all ++ CorpusStatsQueries.all ++ MaintenanceQueries.all ++
      AnalyticsQueries.all ++ SetSimilarityQueries.all

  val oracles: Map[String, String] =
    EventQueries.oracles ++ RelationalQueries.oracles ++
      TextQueries.oracles ++ SimilarityQueries.oracles ++
      StreamingQueries.oracles ++ MultimodalQueries.oracles ++
      AdvancedQueries.oracles ++ SqlQueries.oracles ++ SourceQueries.oracles ++
      LineQueries.oracles ++ CorpusStatsQueries.oracles ++
      MaintenanceQueries.oracles ++ AnalyticsQueries.oracles ++
      SetSimilarityQueries.oracles
}
