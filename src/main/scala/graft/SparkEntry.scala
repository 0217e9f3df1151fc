package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator from SURVEY.md §2 to a
  * (session, sf-dir) => DataFrame; `oracleSql` holds the DuckDB-equivalent
  * SQL with IDENTICAL column names (driver sorts columns by name and hashes
  * values). Modules contribute via [[graft.queries.QueryModule]].
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    RelationalQueries,
    WindowQueries,
    AggQueries,
    JoinQueries,
    MetricsQueries,
    DedupTextQueries,
    CorpusQueries,
    ServeQueries,
    TradeQueries,
    DashboardQueries,
    StreamQueries,
    KernelQueries,
    SplitQueries,
    PrepQueries,
    FeatureQueries,
    SignalQueries,
    EnsembleQueries,
    EngineQueries,
    LobQueries,
    LayoutQueries,
    StatQueries,
    SyntheticQueries,
    EventQueries,
    SourceQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
