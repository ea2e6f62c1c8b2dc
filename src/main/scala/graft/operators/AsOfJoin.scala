package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** As-of (point-in-time) join — for each left row, the single most recent
  * right row with `right.ts <= left.ts` in the same key group. The classic
  * time-series operator Spark has no native form of (DuckDB: `ASOF JOIN`;
  * kdb: `aj`); the naive encoding — a theta-join on `l.ts >= r.ts` plus a
  * per-left-row argmax — explodes to O(|L|·|R|) rows per key before
  * pruning.
  *
  * Implementation is the scale-correct union form: tag both sides, union
  * them (schema-aligned), and in ONE window over (keys, time order) carry
  * the latest right-side payload forward onto each left row
  * (`last(..., ignoreNulls)` over rows unbounded-preceding..current).
  * Right rows sort before left rows at equal timestamps, so a same-instant
  * right row IS visible to the left row (`<=` semantics). Cost: one
  * shuffle of |L|+|R| rows on the keys, linear window pass — no row
  * explosion at any key cardinality or time density, which is what
  * survives a 100× scale-up of either side.
  */
object AsOfJoin {

  /** Generic as-of join.
    *
    * @param left      probe side; all its columns survive
    * @param right     reference side
    * @param keys      equi-join key columns (same names both sides)
    * @param leftTs    left event-time column name
    * @param rightTs   right event-time column name
    * @param payload   right columns to attach (renamed `prefix` + name);
    *                  each left row gets the payload of the latest right
    *                  row at-or-before its timestamp, or nulls if none
    * @param tiebreak  right column ordering ties at equal timestamps —
    *                  the HIGHEST tiebreak value wins (deterministic)
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tiebreak: String, prefix: String = "asof_"): DataFrame = {
    val keyCols = keys.map(col)
    val rPayload = struct((rightTs +: payload).distinct.map(col): _*)
    val rPayloadType = right.select(rPayload).schema.head.dataType
    val leftCols = left.columns.filterNot(keys.contains)
    val lRow = struct(leftCols.map(col): _*)
    val lRowType = left.select(lRow).schema.head.dataType

    val taggedLeft = left.select(keyCols :+
      col(leftTs).as("__ts") :+ lit(1).as("__side") :+
      lit(null).cast("bigint").as("__tie") :+
      lit(null).cast(rPayloadType).as("__rp") :+ lRow.as("__lrow"): _*)
    val taggedRight = right.select(keyCols :+
      col(rightTs).as("__ts") :+ lit(0).as("__side") :+
      col(tiebreak).cast("bigint").as("__tie") :+
      rPayload.as("__rp") :+ lit(null).cast(lRowType).as("__lrow"): _*)

    // right rows (__side=0) order before left rows at equal __ts; among
    // equal-ts right rows the highest tiebreak sorts last, so `last` picks
    // it. The WHOLE payload struct is carried as one value — carrying each
    // field independently would backfill a NULL field of the latest right
    // row from an older right row, emitting a mixed row that never existed.
    val w = Window.partitionBy(keyCols: _*).orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val outFields = (payload :+ rightTs).distinct
    taggedLeft.unionByName(taggedRight)
      .select(keyCols ++ Seq(col("__side"), col("__lrow"),
        last(col("__rp"), ignoreNulls = true).over(w).as("__m")): _*)
      .where(col("__side") === 1)
      .select(keyCols ++ leftCols.map(c => col(s"__lrow.$c").as(c)) ++
        outFields.map(p => col(s"__m.$p").as(prefix + p)): _*)
  }

  /** Query form: each purchase event joined as-of to the user's most
    * recent at-or-before click — attribution's "which click drove this
    * purchase", with the wait in whole seconds. Purchases with no prior
    * click keep null click columns (they survive, as a left join would).
    */
  def eventsAsOf(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"), col("value"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    asOf(purchases, clicks, Seq("user_id"), "ts", "ts",
        payload = Seq("event_id"), tiebreak = "event_id", prefix = "click_")
      .select(
        col("purchase_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        round(col("value"), 2).as("purchase_value"),
        col("click_event_id").as("click_id"),
        (col("ts").cast("long") - col("click_ts").cast("long")).as("wait_sec"))
      .orderBy("purchase_id")
  }

  /** DuckDB oracle for [[eventsAsOf]] — the same union + carry-forward
    * window, spelled in SQL (not DuckDB's ASOF JOIN keyword: its equal-ts
    * tiebreak among reference rows is unspecified, and the oracle must be
    * deterministic). Event-instant ordering runs on `::TIMESTAMP` (µs)
    * values, matching Spark's µs-truncated view of the ns parquet column;
    * wait_sec floors via integer `epoch_us // 1e6`, never a double epoch.
    */
  val eventsAsOfSql: String =
    """WITH u AS (
      |  SELECT user_id, ts::TIMESTAMP AS ts, 1 AS side, NULL::BIGINT AS tie,
      |    event_id AS purchase_id, value, NULL::BIGINT AS r_click_id,
      |    NULL::TIMESTAMP AS r_click_ts
      |  FROM events WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT user_id, ts::TIMESTAMP, 0, event_id, NULL, NULL, event_id, ts::TIMESTAMP
      |  FROM events WHERE event_type = 'click'),
      |w AS (
      |  SELECT *,
      |    last_value(r_click_id IGNORE NULLS) OVER win AS click_id,
      |    last_value(r_click_ts IGNORE NULLS) OVER win AS click_ts
      |  FROM u
      |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, side, tie
      |                 ROWS UNBOUNDED PRECEDING))
      |SELECT purchase_id, user_id,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
      |  round(value, 2) AS purchase_value, click_id,
      |  epoch_us(ts) // 1000000 - epoch_us(click_ts) // 1000000 AS wait_sec
      |FROM w WHERE side = 1 ORDER BY purchase_id""".stripMargin
}
