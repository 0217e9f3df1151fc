package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Det._

/** Join + set-operation semantics from SURVEY.md §2.3/§2.7:
  * as-of alignment (etl/time_series_feature_builder.py:222-234), semi/anti
  * joins (etl/database_manager.py:1367-1382), self left-join opener lookup
  * (round_trips view, :1405-1430), UNION ALL + anti-join dedup arm
  * (trade_close_linkages, :1383-1404), split non-overlap intersection
  * (etl/split_diagnostics.py:81).
  *
  * Scale design: the as-of join is the union+last(ignoreNulls) window
  * pattern — ONE shuffle by key, no per-row subqueries; small dimensions
  * are broadcast; range join is equi-key + range predicate so Spark plans
  * a hash join with a residual filter, not a cartesian.
  */
object JoinQueries extends QueryModule {

  override def queries: Map[String, QFn] = Map(
    // As-of join: for each click, the last signup value of the same user
    // at-or-before its timestamp. Union + last(_, ignoreNulls) — the
    // scalable single-shuffle form (no per-row lookup).
    "q30_asof_join" -> ((s, dir) => {
      import s.implicits._
      val ev = graft.Tables.load(s, dir, "events")
      val clicks = ev.where($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id", $"value", lit(0).as("is_macro"))
      val signups = ev.where($"event_type" === "signup")
        .select($"user_id", $"ts", $"event_id", $"value", lit(1).as("is_macro"))
      // order macro rows BEFORE measure rows at identical (ts): asof >=
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts", $"is_macro".desc, $"event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      clicks.unionByName(signups)
        .withColumn("asof_signup_value",
          last(when($"is_macro" === 1, $"value"), ignoreNulls = true).over(w))
        .where($"is_macro" === 0)
        .select($"user_id", $"event_id", $"value", $"asof_signup_value")
    }),

    // Left-semi: customers having ≥1 order in a date range (EXISTS).
    "q31_semi_join" -> ((s, dir) => {
      import s.implicits._
      val cust = graft.Tables.load(s, dir, "customer")
      val ord = graft.Tables.load(s, dir, "orders")
        .where($"o_orderdate" >= lit("1999-01-01"))
      cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
        .select($"c_custkey", $"c_mktsegment")
    }),

    // Equi+range join: lineitems shipped within 30 days of their order date.
    "q32_range_join" -> ((s, dir) => {
      import s.implicits._
      val li = graft.Tables.load(s, dir, "lineitem")
      val ord = graft.Tables.load(s, dir, "orders")
      li.join(ord,
          li("l_orderkey") === ord("o_orderkey") &&
            li("l_shipdate") >= ord("o_orderdate") &&
            li("l_shipdate") <= date_add(ord("o_orderdate"), 30))
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_fast_ships"),
          dsum($"l_extendedprice").as("sum_price"))
    }),

    // Self left-join: each later line joined to its order's line #1
    // "opener" with COALESCE fallback (round_trips shape).
    "q33_self_join_opener" -> ((s, dir) => {
      import s.implicits._
      val li = graft.Tables.load(s, dir, "lineitem")
      val closes = li.where($"l_linenumber" > 1)
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"l_quantity")
      val openers = li.where($"l_linenumber" === 1)
        .select($"l_orderkey".as("o_key"), $"l_extendedprice".as("open_price"))
      closes.join(openers, closes("l_orderkey") === openers("o_key"), "left")
        .select($"l_orderkey", $"l_linenumber",
          coalesce($"open_price", $"l_extendedprice").as("entry_price"),
          ($"l_extendedprice" - coalesce($"open_price", $"l_extendedprice")).as("price_delta"))
    }),

    // UNION ALL + anti-join dedup arm (trade_close_linkages shape).
    "q34_union_linkage" -> ((s, dir) => {
      import s.implicits._
      val li = graft.Tables.load(s, dir, "lineitem")
      val armA = li.where($"l_returnflag" === "R")
        .select($"l_orderkey", $"l_linenumber", lit("returned").as("link_kind"))
      val armB = li.where($"l_linestatus" === "F")
        .select($"l_orderkey", $"l_linenumber")
        .join(armA.select($"l_orderkey", $"l_linenumber"),
          Seq("l_orderkey", "l_linenumber"), "left_anti")
        .select($"l_orderkey", $"l_linenumber", lit("legacy").as("link_kind"))
      armA.unionByName(armB)
    }),

    // INTERSECT: building-segment customers that also ordered urgently.
    "q35_intersect" -> ((s, dir) => {
      import s.implicits._
      val a = graft.Tables.load(s, dir, "customer")
        .where($"c_mktsegment" === "BUILDING").select($"c_custkey")
      val b = graft.Tables.load(s, dir, "orders")
        .where($"o_orderpriority" === "1-URGENT")
        .select($"o_custkey".as("c_custkey"))
      a.intersect(b)
    }),

    // EXCEPT: split non-overlap check shape (distinct set difference).
    "q36_except" -> ((s, dir) => {
      import s.implicits._
      val a = graft.Tables.load(s, dir, "customer")
        .where($"c_mktsegment" === "BUILDING").select($"c_custkey")
      val b = graft.Tables.load(s, dir, "orders")
        .where($"o_orderpriority" === "1-URGENT")
        .select($"o_custkey".as("c_custkey"))
      a.except(b)
    })
  )

  override def oracles: Map[String, String] = Map(
    "q30_asof_join" ->
      """SELECT c.user_id, c.event_id, c.value,
        |  (SELECT s.value FROM events s
        |   WHERE s.event_type = 'signup' AND s.user_id = c.user_id
        |     AND s.ts <= c.ts
        |   ORDER BY s.ts DESC, s.event_id DESC LIMIT 1) AS asof_signup_value
        |FROM events c WHERE c.event_type = 'click'""".stripMargin,
    "q31_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1999-01-01')""".stripMargin,
    "q32_range_join" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n_fast_ships,
         |  ${sqlSum("l_extendedprice")} AS sum_price
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  AND l_shipdate >= o_orderdate
         |  AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
         |GROUP BY 1""".stripMargin,
    "q33_self_join_opener" ->
      """SELECT c.l_orderkey, c.l_linenumber,
        |  COALESCE(o.l_extendedprice, c.l_extendedprice) AS entry_price,
        |  c.l_extendedprice - COALESCE(o.l_extendedprice, c.l_extendedprice) AS price_delta
        |FROM lineitem c LEFT JOIN lineitem o
        |  ON o.l_orderkey = c.l_orderkey AND o.l_linenumber = 1
        |WHERE c.l_linenumber > 1""".stripMargin,
    "q34_union_linkage" ->
      """SELECT l_orderkey, l_linenumber, 'returned' AS link_kind
        |FROM lineitem WHERE l_returnflag = 'R'
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'legacy' AS link_kind
        |FROM lineitem t WHERE l_linestatus = 'F'
        |  AND NOT EXISTS (SELECT 1 FROM lineitem r
        |    WHERE r.l_returnflag = 'R' AND r.l_orderkey = t.l_orderkey
        |      AND r.l_linenumber = t.l_linenumber)""".stripMargin,
    "q35_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin,
    "q36_except" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin
  )
}
