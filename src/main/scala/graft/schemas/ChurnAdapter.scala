package graft.schemas

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Adapters mapping the driver's TPC-H-ish testdata onto the reference's
  * raw churn tables (FIXTURES.md §A; reference schemas reconstructed from
  * RF/randomforest_churn.scala:43-58).
  *
  *   members_data ← customer      (USR_NUM_ID, CHANNEL_NUM_ID, REGISTRAT_DATE, VIP_TYPE_NUM_ID)
  *   sales_data   ← orders⋈lineitem (ORDER_DATE, TML_NUM_ID, SUB_UNIT_NUM_ID, USR_NUM_ID,
  *                                   TRADE_AMOUNT, ITEM_NUM_ID, DISCOUNT_AMOUNT, PRICE_TYPE, WX_APP_SIGN)
  *   goods_data   ← part          (ITEM_NUM_ID, PTY_NUM_1)
  *   points_data  ← events        (USR_NUM_ID, RESERVED_INTEGRAL, TSC_DTME)
  *
  * Every derivation is deterministic and ANSI-SQL-expressible so the DuckDB
  * oracle can replicate it verbatim (see [[ChurnAdapter.duckdbWith]]).
  */
object ChurnAdapter {

  /** Observation window defaults (orders span 1995-01-01..2001-08-01). */
  val FeatureStart = "1996-01-01"
  val FeatureEnd   = "1996-06-30"
  val LabelStart   = "1996-07-01"
  val LabelEnd     = "1996-09-30"

  def members(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, sfDir, "customer").select(
      $"c_custkey".as("USR_NUM_ID"),
      $"c_nationkey".cast("int").as("CHANNEL_NUM_ID"),
      date_add(to_date(lit("1995-01-01")), ($"c_custkey" % 1000).cast("int"))
        .as("REGISTRAT_DATE"),
      ($"c_custkey" % 4).cast("int").as("VIP_TYPE_NUM_ID"))
  }

  /** sales = orders ⋈ lineitem — the one fact-fact join in the adapter.
    * At warehouse scale this is the classic co-location candidate: both
    * sides keyed by orderkey, so the production layout is bucketed
    * (`bucketBy(N, "o_orderkey")` / `bucketBy(N, "l_orderkey")` at write
    * time) or pre-joined into a denormalized sales table — either removes
    * the shuffle entirely; Spark's SMJ then reads co-located buckets.
    * The driver testdata is unbucketed single files, so locally this is
    * a sort-merge join sized by AQE; correctness is identical. */
  def sales(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val orders   = Tables.load(spark, sfDir, "orders")
    val lineitem = Tables.load(spark, sfDir, "lineitem")
    orders.join(lineitem, $"o_orderkey" === $"l_orderkey").select(
      to_date($"o_orderdate").as("ORDER_DATE"),
      $"o_orderkey".as("TML_NUM_ID"),
      $"l_suppkey".as("SUB_UNIT_NUM_ID"),
      $"o_custkey".as("USR_NUM_ID"),
      $"l_extendedprice".as("TRADE_AMOUNT"),
      $"l_partkey".as("ITEM_NUM_ID"),
      ($"l_extendedprice" * $"l_discount").as("DISCOUNT_AMOUNT"),
      when($"l_discount" > 0, 1).otherwise(0).as("PRICE_TYPE"),
      ($"l_orderkey" % 2).cast("int").as("WX_APP_SIGN"))
  }

  /** Category universe = the reference's 15 PTY_NUM_1 ids
    * (RF/randomforest_churn.scala:140-152) + one unmapped id, assigned
    * round-robin by part key. */
  val PtyIds: Seq[Int] = Seq(
    2501, 2104, 2101, 2102, 2502, 2307, 2106, 2105,
    2507, 2309, 2403, 2306, 2407, 2304, 2301, 2999)

  def goods(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, sfDir, "part").select(
      $"p_partkey".as("ITEM_NUM_ID"),
      element_at(array(PtyIds.map(lit): _*),
        ($"p_partkey" % 16).cast("int") + 1).as("PTY_NUM_1"))
  }

  def points(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, sfDir, "events").select(
      $"user_id".as("USR_NUM_ID"),
      $"value".as("RESERVED_INTEGRAL"),
      to_date($"ts").as("TSC_DTME"))
  }

  /** DuckDB WITH-clauses replicating the adapters exactly — prepend to any
    * oracle SQL that consumes the reference-shaped tables. */
  val duckdbWith: String =
    """WITH members AS (
      |  SELECT c_custkey AS USR_NUM_ID,
      |         CAST(c_nationkey AS INT) AS CHANNEL_NUM_ID,
      |         DATE '1995-01-01' + CAST(c_custkey % 1000 AS INT) AS REGISTRAT_DATE,
      |         CAST(c_custkey % 4 AS INT) AS VIP_TYPE_NUM_ID
      |  FROM customer),
      |sales AS (
      |  SELECT CAST(o_orderdate AS DATE) AS ORDER_DATE,
      |         o_orderkey AS TML_NUM_ID,
      |         l_suppkey AS SUB_UNIT_NUM_ID,
      |         o_custkey AS USR_NUM_ID,
      |         l_extendedprice AS TRADE_AMOUNT,
      |         l_partkey AS ITEM_NUM_ID,
      |         l_extendedprice * l_discount AS DISCOUNT_AMOUNT,
      |         CASE WHEN l_discount > 0 THEN 1 ELSE 0 END AS PRICE_TYPE,
      |         CAST(l_orderkey % 2 AS INT) AS WX_APP_SIGN
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |goods AS (
      |  SELECT p_partkey AS ITEM_NUM_ID,
      |         ([2501,2104,2101,2102,2502,2307,2106,2105,2507,2309,2403,2306,2407,2304,2301,2999])
      |           [CAST(p_partkey % 16 AS INT) + 1] AS PTY_NUM_1
      |  FROM part),
      |points AS (
      |  SELECT user_id AS USR_NUM_ID,
      |         value AS RESERVED_INTEGRAL,
      |         CAST(ts AS DATE) AS TSC_DTME
      |  FROM events)""".stripMargin
}
