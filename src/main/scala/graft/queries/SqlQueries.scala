package graft.queries

import graft.sources.Tables

/** Raw-SQL interface: the engine's tables registered as views and queried
  * through `spark.sql` — demonstrating that the full Spark SQL dialect is
  * part of the engine surface (the reference has no SQL layer at all,
  * SURVEY "What the reference IS").
  */
object SqlQueries {

  // Memoized per session: view registration re-reads eight parquet footers
  // otherwise, which dominated these queries' wall time (~1 s). Temp view
  // names are catalog-global, so the memo records WHICH dir a session's
  // views currently point at and re-registers whenever it changes —
  // skipping on a (session, dir) pair alone would silently serve a
  // previously-registered dir's data after a switch back. Keyed by the
  // session object (identity equality) with stopped sessions evicted, not
  // by identityHashCode, which a later session could collide with.
  private val registeredDir =
    new java.util.concurrent.ConcurrentHashMap[org.apache.spark.sql.SparkSession, String]()

  private def registerViews(s: org.apache.spark.sql.SparkSession, dir: String): Unit =
    synchronized {
      registeredDir.keySet.removeIf(x => x.sparkContext.isStopped)
      if (registeredDir.get(s) != dir) {
        Seq("lineitem", "orders", "customer", "supplier", "part",
          "nation", "region", "documents").foreach { t =>
          Tables.table(s, dir, t).createOrReplaceTempView(t)
        }
        // recorded only AFTER all eight registrations succeed: marking
        // first would make a partial failure un-retryable (the memo would
        // claim the dir is registered while some views still point at the
        // previous dir)
        registeredDir.put(s, dir)
      }
    }

  /** TPC-H Q1 shape submitted as SQL text (same semantics as `q1_agg`,
    * same oracle). */
  private val sqlQ1: Q = (s, dir) => {
    registerViews(s, dir)
    s.sql("""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sum_base_price_fp,
             sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
               AS sum_disc_price_fp,
             round(avg(l_quantity), 4) AS avg_qty,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) div count(*)
               AS avg_price_fp,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY 1, 2""")
  }

  /** Correlated subquery through SQL — a shape the DataFrame DSL can't
    * write directly (Catalyst decorrelates it into a join). The
    * above-average predicate is cross-multiplied into exact integers
    * (price_fp · n > sum_fp ⟺ price > avg): comparing against a DOUBLE
    * avg() put one order exactly at the ULP boundary at the 10× corpus,
    * flipping a row between engines (found by the 10× full-registry
    * oracle run). TWO correlated scalar subqueries — Catalyst
    * decorrelates both, a strictly richer instance of the gate's shape. */
  private val sqlCorrelated: Q = (s, dir) => {
    registerViews(s, dir)
    s.sql("""
      SELECT o_custkey, count(*) AS n_big_orders
      FROM orders o
      WHERE CAST(round(o_totalprice * 100) AS BIGINT)
              * (SELECT count(*) FROM orders i
                 WHERE i.o_custkey = o.o_custkey)
            > (SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT))
               FROM orders i WHERE i.o_custkey = o.o_custkey)
      GROUP BY 1""")
  }

  private val sqlCorrelatedSql =
    """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_big_orders
      |FROM orders o
      |WHERE CAST(round(o_totalprice * 100) AS BIGINT)
      |        * (SELECT count(*) FROM orders i
      |           WHERE i.o_custkey = o.o_custkey)
      |      > (SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT))
      |         FROM orders i WHERE i.o_custkey = o.o_custkey)
      |GROUP BY 1""".stripMargin

  /** Recursive CTE (Spark 4 `WITH RECURSIVE`): generate the full month
    * calendar spanning the data, then LEFT JOIN so empty months surface
    * as zero rows — the gaps-in-time-series shape a plain GROUP BY can't
    * produce. Spark requires UNION ALL in the recursive step (acyclic
    * here: the month column strictly increases to a bound). */
  private val sqlRecursiveMonths: Q = (s, dir) => {
    registerViews(s, dir)
    s.sql("""
      WITH RECURSIVE months(m) AS (
        SELECT DATE '1992-01-01'
        UNION ALL
        SELECT m + INTERVAL '1' MONTH FROM months WHERE m < DATE '1998-12-01'
      )
      -- total_price is exact integer cents (the fixed-point family rule):
      -- round(sum(double), 2) flipped a cent on 7/84 months at the 100x
      -- corpus (15 M orders), the same order-dependent summation class as
      -- TPC-H q5/q7 — per-row cents then an order-free integer sum.
      SELECT date_format(m, 'yyyy-MM') AS month,
             count(o_orderkey) AS n_orders,
             coalesce(sum(cast(round(o_totalprice * 100) as bigint)), 0)
               AS total_price_fp
      FROM months LEFT JOIN orders
        ON date_trunc('MONTH', o_orderdate) = CAST(m AS TIMESTAMP)
      GROUP BY 1""")
  }

  private val sqlRecursiveMonthsSql =
    """WITH RECURSIVE months(m) AS (
      |  SELECT DATE '1992-01-01'
      |  UNION ALL
      |  SELECT m + INTERVAL 1 MONTH FROM months WHERE m < DATE '1998-12-01'
      |)
      |SELECT strftime(m, '%Y-%m') AS month,
      |       CAST(count(o_orderkey) AS BIGINT) AS n_orders,
      |       CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT)), 0) AS BIGINT)
      |         AS total_price_fp
      |FROM months LEFT JOIN orders
      |  ON date_trunc('month', o_orderdate) = CAST(m AS TIMESTAMP)
      |GROUP BY 1""".stripMargin

  /** LATERAL correlated subquery with ORDER BY + LIMIT — top-1-per-row
    * without a window function (the decorrelated per-group-top-k shape;
    * Catalyst plans the lateral as a join). */
  private val sqlLateralTop: Q = (s, dir) => {
    registerViews(s, dir)
    s.sql("""
      SELECT r_name, top.s_name AS top_supplier, top.bal
      FROM region,
      LATERAL (SELECT s_name, round(s_acctbal, 2) AS bal
               FROM supplier JOIN nation ON s_nationkey = n_nationkey
               WHERE n_regionkey = r_regionkey
               ORDER BY s_acctbal DESC, s_name LIMIT 1) top""")
  }

  private val sqlLateralTopSql =
    """SELECT r_name, top.s_name AS top_supplier, top.bal
      |FROM region,
      |LATERAL (SELECT s_name, round(CAST(s_acctbal AS DOUBLE), 2) AS bal
      |         FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |         WHERE n_regionkey = r_regionkey
      |         ORDER BY s_acctbal DESC, s_name LIMIT 1) top""".stripMargin

  val all: Map[String, Q] = Map(
    "sql_q1"               -> sqlQ1,
    "sql_correlated"       -> sqlCorrelated,
    "sql_recursive_months" -> sqlRecursiveMonths,
    "sql_lateral_top"      -> sqlLateralTop,
  )

  val oracles: Map[String, String] = Map(
    // same oracle as the DSL form — dialect in, identical result out
    "sql_q1"               -> RelationalQueries.oracles("q1_agg"),
    "sql_correlated"       -> sqlCorrelatedSql,
    "sql_recursive_months" -> sqlRecursiveMonthsSql,
    "sql_lateral_top"      -> sqlLateralTopSql,
  )
}
