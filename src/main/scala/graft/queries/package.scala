package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** A driver-contract query: (session, sf-dir) => result frame. */
  type QFn = (SparkSession, String) => DataFrame

  /** A query module contributes named queries and (optionally) the
    * equivalent DuckDB oracle SQL for each (driver t2 correctness gate).
    */
  trait QueryModule {
    def queries: Map[String, QFn]
    def oracles: Map[String, String]
  }
}
