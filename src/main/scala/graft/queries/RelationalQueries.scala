package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Det._

/** Core relational operators from SURVEY.md §2.2-§2.4, §2.6-§2.7,
  * re-expressed on the testdata star schema. Every query has a DuckDB
  * oracle with identical column names and deterministic values (double
  * sums routed through fixed-scale decimals, see [[Det]]).
  *
  * Reference semantics mirrored (cites into /root/reference):
  *  - pricing-style grouped aggregation  (etl/database_manager.py:3417-3480)
  *  - date-range filter                  (etl/data_storage.py:143-147)
  *  - quality-check single-pass agg      (etl/yfinance_extractor.py:123-150)
  *  - recent-N top-k                     (etl/database_manager.py:1688-1720)
  *  - anti-join integrity checks         (etl/database_manager.py:1367-1382)
  */
object RelationalQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(s, dir, name)

  override def queries: Map[String, QFn] = Map(
    // TPC-H Q1-shaped pricing summary: group-agg with arithmetic inside sum.
    "q1_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          dsum($"l_extendedprice" * (lit(1) - $"l_discount")).as("sum_disc_price"),
          davg($"l_quantity").as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // Date-range filter + projection (pushed to parquet scan).
    "q2_filter_range" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .where($"l_shipdate" >= lit("1995-01-01") && $"l_shipdate" < lit("1995-04-01"))
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_returnflag")
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // Recent-N top-k: ORDER BY ... DESC LIMIT n (TakeOrderedAndProject).
    "q3_topk" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .select($"o_orderkey", $"o_totalprice", $"o_orderdate")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(100)
    }),

    // Inner equi-join + group agg (broadcast the small dim).
    "q4_join_inner" -> ((s, dir) => {
      import s.implicits._
      val cust = t(s, dir, "customer")
      val nat = broadcast(t(s, dir, "nation"))
      cust.join(nat, cust("c_nationkey") === nat("n_nationkey"))
        .groupBy($"n_name")
        .agg(count(lit(1)).as("n_customers"),
          dsum($"c_acctbal").as("total_acctbal"))
        .orderBy($"n_name")
    }),

    // Anti-join: customers with no orders (NOT EXISTS).
    "q5_anti_join" -> ((s, dir) => {
      import s.implicits._
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    })
  )

  override def oracles: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlSum("l_quantity")} AS sum_qty,
         |  ${sqlSum("l_extendedprice")} AS sum_base_price,
         |  ${sqlSum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |  ${sqlAvg("l_quantity")} AS avg_qty,
         |  COUNT(*) AS count_order
         |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q2_filter_range" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-04-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q3_topk" ->
      """SELECT o_orderkey, o_totalprice, o_orderdate
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q4_join_inner" ->
      s"""SELECT n_name, COUNT(*) AS n_customers,
         |  ${sqlSum("c_acctbal")} AS total_acctbal
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q5_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin
  )
}
