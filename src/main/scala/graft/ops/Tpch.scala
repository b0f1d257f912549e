package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Prims._

/** Classic TPC-H analytics shapes beyond q3/q5 (which live in
  * [[EnrichJoin]]) — extension queries proving the star-schema scan /
  * pushdown / join-strategy story on the standard benchmark surface. The
  * reference has no SQL analytics surface (it is a Flink DataStream demo);
  * these extend the engine the way a warehouse user would exercise it.
  *
  * House determinism rules apply: money math in DECIMAL(18,2), surfaced as
  * double; timestamps surfaced as epoch micros; every query ends in an
  * ORDER BY over a unique key so LIMIT and hashing are cross-engine stable.
  */
object Tpch {

  /** tpch_q6 (extension): the forecasting-revenue-change scan — a pure
    * filter + global aggregate with NO join and NO groupBy. The point at
    * 100 TB: every predicate (shipdate range, discount band, quantity cap)
    * reaches the parquet scan as `PushedFilters`, `ReadSchema` is 4 columns
    * of 11, and the aggregation is a map-side partial followed by a
    * single-row final — the cheapest possible plan over the largest table.
    * Discount bounds are exact fixture grid points (0.00..0.10 step 0.01)
    * so double comparison is bit-stable cross-engine. */
  def tpchQ6(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1999-01-01").cast("timestamp_ntz") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(dec2(col("l_extendedprice")) * dec2(col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_rows"))

  def tpchQ6Sql: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      |  AND l_shipdate < TIMESTAMP '1999-01-01'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  /** tpch_q10 (extension): returned-item reporting — top 20 customers by
    * revenue lost to returns in one quarter. Scale shape: the quarter
    * filter pushes to the orders scan and the returnflag filter to the
    * lineitem scan BEFORE the fact⋈fact shuffle on orderkey; customer
    * joins on custkey (huge⋈huge at 100 TB → natural shuffle key); nation
    * is a broadcast dim; top-20 is TakeOrderedAndProject, never a global
    * sort. */
  def tpchQ10(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1998-04-01").cast("timestamp_ntz"))
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))).as("rev"))
    val c = Tables.customer(s, dir)
      .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    val n = Tables.nation(s, dir).select("n_nationkey", "n_name")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
      .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
  }

  def tpchQ10Sql: String =
    """SELECT c_custkey, c_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  c_acctbal, n_name
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1998-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-04-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** tpch_q14 (extension): promotion-effect — the share of one month's
    * revenue carried by PROMO parts, i.e. a conditional aggregate over a
    * fact⋈dim join. Scale shape: the month filter pushes to the lineitem
    * scan; part (the dim) is explicitly broadcast — the join never
    * shuffles the fact side; the CASE rides the join output inside one
    * whole-stage-codegen span. The fixture's p_type domain is single-word
    * ('PROMO', 'ECONOMY', ...) so the predicate is equality, not LIKE. */
  def tpchQ14(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1998-06-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1998-07-01").cast("timestamp_ntz"))
      .select(col("l_partkey"),
        (dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))).as("rev"))
    val p = Tables.part(s, dir).select("p_partkey", "p_type")
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) * sum(when(col("p_type") === "PROMO", col("rev")).otherwise(dec2(lit(0))))
          .cast("double") / sum(col("rev")).cast("double")).as("promo_pct"),
        sum(col("rev")).cast("double").as("total_rev"))
  }

  def tpchQ14Sql: String =
    """SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
      |      THEN CAST(l_extendedprice AS DECIMAL(18,2))
      |        * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
      |    / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS promo_pct,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_rev
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1998-06-01'
      |  AND l_shipdate < TIMESTAMP '1998-07-01'""".stripMargin

  /** tpch_q18 (extension): large-volume orders — customers whose orders
    * exceed a quantity threshold, the classic HAVING-subquery shape.
    * Spark-first formulation: the subquery is a pre-aggregation of
    * lineitem on orderkey (map-side partial sum, one shuffle), filtered to
    * the ~2% of orders above the threshold, then joined back — Catalyst
    * sees a small build side and broadcasts it, so neither orders nor the
    * re-scan of lineitem shuffles a second time on the probe path. At
    * 100 TB the same plan holds: the filtered aggregate is tiny relative
    * to the facts, and AQE converts the back-join to broadcast at
    * runtime. */
  def tpchQ18(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(s, dir)
      .groupBy("l_orderkey")
      .agg(sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"))
      .filter(col("sum_qty") > 250)
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        epochUs(col("o_orderdate").cast("timestamp")).as("o_date_us"))
    val c = Tables.customer(s, dir).select("c_custkey", "c_name")
    o.join(big, col("o_orderkey") === col("l_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
      .select("c_custkey", "c_name", "o_orderkey", "o_date_us",
        "o_totalprice", "sum_qty")
  }

  def tpchQ18Sql: String =
    """SELECT c_custkey, c_name, o_orderkey,
      |  epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS o_date_us,
      |  o_totalprice, sum_qty
      |FROM orders
      |JOIN (SELECT l_orderkey,
      |        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING sum_qty > 250) big ON o_orderkey = big.l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** tpch_q4 (extension): order-priority checking — the EXISTS /
    * LEFT SEMI shape. Counts one quarter's orders having at least one
    * late line item, per priority. The fixture carries no
    * commit/receipt dates, so Q4's lateness predicate adapts to
    * "shipped more than 30 days after the order date" — the same
    * correlated (equi + range) EXISTS structure. Scale shape: the
    * quarter filter pushes to the orders scan; the semi join is a hash
    * join on orderkey carrying the range predicate as a residual
    * condition (both sides huge at 100 TB → natural shuffle key;
    * fixture-scale AQE broadcasts the filtered orders side) — a semi
    * join never duplicates orders however many line items match. */
  def tpchQ4(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1998-04-01").cast("timestamp_ntz"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val l = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
    o.join(l, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  def tpchQ4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1998-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** inactive_customers (extension): the LEFT ANTI join surface —
    * customers with NO order since a cutoff. Scale shape: the date
    * filter pushes to the orders scan; the anti join is a plain hash
    * exchange on custkey (or broadcast when the active set is small
    * under AQE) — never a NOT IN that degenerates to a nested loop;
    * only (custkey) survives the orders scan, so the build side is
    * key-width regardless of order-row width. */
  def inactiveCustomers(s: SparkSession, dir: String): DataFrame = {
    val recent = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("2000-06-01").cast("timestamp_ntz"))
      .select("o_custkey")
    Tables.customer(s, dir)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  def inactiveCustomersSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey
      |    AND o_orderdate >= TIMESTAMP '2000-06-01')
      |ORDER BY c_custkey""".stripMargin

  /** top_parts_per_brand (extension): top-3 parts by lifetime revenue
    * within each brand — the grouped top-k shape. The rank's ORDER BY
    * carries the unique p_partkey tiebreak so k is exact on any input
    * (a revenue tie can never inflate the group beyond 3 rows or make
    * the result engine-dependent). Scale shape: revenue is ONE
    * map-combinable aggregate on partkey; part is a broadcast dim; and
    * the `rank <= 3` filter over the window triggers Spark's
    * WindowGroupLimit — each partition keeps a 3-element heap per
    * brand BEFORE the exchange, so the window sort never sees more
    * than 3·|brands| rows per side (asserted in PlanGuardSpec). */
  def topPartsPerBrand(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rev = Tables.lineitem(s, dir)
      .groupBy("l_partkey")
      .agg(sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
        .cast("double").as("revenue"))
    val w = Window.partitionBy("p_brand")
      .orderBy(col("revenue").desc, col("p_partkey"))
    rev.join(broadcast(Tables.part(s, dir).select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .withColumn("brand_rank", rank().over(w).cast("long"))
      .filter(col("brand_rank") <= 3)
      .select("p_brand", "brand_rank", "p_partkey", "revenue")
      .orderBy("p_brand", "brand_rank")
  }

  def topPartsPerBrandSql: String =
    """SELECT p_brand, brand_rank, p_partkey, revenue FROM (
      |  SELECT p_brand, p_partkey, revenue,
      |    CAST(rank() OVER (PARTITION BY p_brand
      |      ORDER BY revenue DESC, p_partkey) AS BIGINT) AS brand_rank
      |  FROM (
      |    SELECT p_brand, p_partkey,
      |      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |    FROM lineitem JOIN part ON l_partkey = p_partkey
      |    GROUP BY p_brand, p_partkey))
      |WHERE brand_rank <= 3
      |ORDER BY p_brand, brand_rank""".stripMargin
}
