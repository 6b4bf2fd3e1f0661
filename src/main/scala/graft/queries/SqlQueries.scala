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
             round(sum(l_extendedprice), 2) AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             round(avg(l_quantity), 4) AS avg_qty,
             round(avg(l_extendedprice), 4) AS avg_price,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY 1, 2""")
  }

  /** Correlated subquery through SQL — a shape the DataFrame DSL can't
    * write directly (Catalyst decorrelates it into a join). */
  private val sqlCorrelated: Q = (s, dir) => {
    registerViews(s, dir)
    s.sql("""
      SELECT o_custkey, count(*) AS n_big_orders
      FROM orders o
      WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders i
                            WHERE i.o_custkey = o.o_custkey)
      GROUP BY 1""")
  }

  private val sqlCorrelatedSql =
    """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_big_orders
      |FROM orders o
      |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders i
      |                      WHERE i.o_custkey = o.o_custkey)
      |GROUP BY 1""".stripMargin

  val all: Map[String, Q] = Map(
    "sql_q1"         -> sqlQ1,
    "sql_correlated" -> sqlCorrelated,
  )

  val oracles: Map[String, String] = Map(
    // same oracle as the DSL form — dialect in, identical result out
    "sql_q1"         -> RelationalQueries.oracles("q1_agg"),
    "sql_correlated" -> sqlCorrelatedSql,
  )
}
