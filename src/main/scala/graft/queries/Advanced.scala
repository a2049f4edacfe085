package graft.queries

import graft.{QueryDef, Tables}
import graft.text.TextOps
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Extension tier 4 (session 4): event-time analytics breadth
  * (time-RANGE rolling frames, ordered funnels), training-mixture
  * planning, and the bounded-heap grouped top-k that replaces the
  * window-sort formulation at scale.
  */
object Advanced {

  private def r6(c: Column): Column = graft.Rounding.r6(c)

  /** Rolling 1-hour aggregate per user over event time — a RANGE
    * frame (value-based, peers share the frame), not a ROWS frame:
    * for each event, the count and value-sum of that user's events
    * in the preceding hour inclusive. One shuffle on user_id; the
    * per-partition sliding computation is linear (Spark maintains
    * the moving frame incrementally, no per-row rescan). The frame
    * is keyed on exact integer microseconds so both engines bound
    * it identically. */
  val rollingHour: QueryDef = QueryDef.sql(
    """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us, value
         FROM events)
       SELECT event_id, user_id,
              CAST(count(*) OVER w AS BIGINT) AS n_1h,
              floor((sum(value) OVER w) * 1000000 + 0.5) / 1000000 AS sum_1h
       FROM e
       WINDOW w AS (PARTITION BY user_id ORDER BY us
                    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
       ORDER BY event_id""") { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-3600000000L, 0L)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("value"))
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_1h"),
        r6(sum(col("value")).over(w)).as("sum_1h"))
      .orderBy(col("event_id"))
  }

  /** Ordered conversion funnel signup → click → purchase per user:
    * each stage's timestamp must strictly follow the previous
    * stage's (min qualifying time), the standard product-analytics
    * semantics. Three conditional-min aggregations, each joined
    * back on user_id — every stage keys on user_id, so at scale the
    * first shuffle's partitioning is reused by AQE for the rest
    * (and the per-user stage tables are corpus-of-users-sized, far
    * smaller than the event log they summarize). */
  val funnelStages: QueryDef = QueryDef.sql(
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
       s AS (SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN us END) AS signup_us
             FROM e GROUP BY 1),
       c AS (SELECT e.user_id,
               min(CASE WHEN event_type = 'click' AND us > signup_us
                        THEN us END) AS click_us
             FROM e JOIN s ON e.user_id = s.user_id GROUP BY 1),
       p AS (SELECT e.user_id,
               min(CASE WHEN event_type = 'purchase' AND us > click_us
                        THEN us END) AS purchase_us
             FROM e JOIN c ON e.user_id = c.user_id GROUP BY 1)
       SELECT s.user_id, s.signup_us, c.click_us, p.purchase_us,
              CAST(CASE WHEN purchase_us IS NOT NULL THEN 3
                        WHEN click_us IS NOT NULL THEN 2
                        WHEN signup_us IS NOT NULL THEN 1
                        ELSE 0 END AS BIGINT) AS stage
       FROM s JOIN c ON s.user_id = c.user_id
              JOIN p ON s.user_id = p.user_id
       ORDER BY s.user_id""") { (sp, d) =>
    val e = Tables.events(sp, d)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val s = e.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "signup", col("us")))
        .as("signup_us"))
    val c = e.join(s, "user_id")
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "click" &&
        col("us") > col("signup_us"), col("us"))).as("click_us"))
    val p = e.join(c, "user_id")
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "purchase" &&
        col("us") > col("click_us"), col("us"))).as("purchase_us"))
    s.join(c, "user_id").join(p, "user_id")
      .select(col("user_id"), col("signup_us"), col("click_us"),
        col("purchase_us"),
        when(col("purchase_us").isNotNull, 3L)
          .when(col("click_us").isNotNull, 2L)
          .when(col("signup_us").isNotNull, 1L)
          .otherwise(0L).as("stage"))
      .orderBy(col("user_id"))
  }

  /** Training-mixture weights per source (Pile/Dolma-style):
    * temperature-scaled sampling weights w_s ∝ tokens_s^α with
    * α = 0.5 — upweights small sources relative to proportional
    * sampling. One vocabulary-free aggregate (tiny: one row per
    * source), the normalizer broadcast back in-plan. `alloc` is the
    * per-source document budget a 100k-doc training mix would draw.
    * Complements q76 (which ENFORCES a budget); this query PLANS
    * one. */
  val mixtureWeights: QueryDef = QueryDef.sql(
    """WITH t AS (SELECT source, count(*) AS n_docs,
             sum(len(string_split(trim(text), ' '))) AS toks
           FROM documents GROUP BY 1),
       z AS (SELECT sum(sqrt(toks)) AS z FROM t)
       SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
              CAST(toks AS BIGINT) AS tokens,
              floor((sqrt(toks) / z) * 1000000 + 0.5) / 1000000 AS weight,
              CAST(floor((sqrt(toks) / z) * 100000 + 0.5) AS BIGINT) AS alloc
       FROM t, z ORDER BY source""") { (s, d) =>
    val t = Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextOps.tokenCount(col("text")).cast("long")).as("tokens"))
    val z = t.agg(sum(sqrt(col("tokens"))).as("z"))
    t.crossJoin(broadcast(z))
      .select(col("source"), col("n_docs"), col("tokens"),
        r6(sqrt(col("tokens")) / col("z")).as("weight"),
        floor(sqrt(col("tokens")) / col("z") * lit(100000.0) + lit(0.5))
          .cast("long").as("alloc"))
      .orderBy(col("source"))
  }

  /** Grouped top-k through the bounded-heap aggregate
    * (`ops/TopK.scala`) — top-3 customers by account balance per
    * nation WITHOUT the window sort: only ≤ k rows per (nation ×
    * input partition) cross the shuffle, versus row_number()'s full
    * shuffle+sort of the corpus. The oracle IS the window
    * formulation, so this row proves the two agree exactly
    * (ties broken ord DESC, id ASC on both sides). */
  val groupedTopK: QueryDef = QueryDef.sql(
    """SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
              CAST(rk AS BIGINT) AS rank, c_custkey AS custkey,
              floor((c_acctbal) * 1000000 + 0.5) / 1000000 AS acctbal
       FROM (SELECT c_nationkey, c_custkey, c_acctbal,
               row_number() OVER (PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC, c_custkey) AS rk
             FROM customer)
       WHERE rk <= 3 ORDER BY nationkey, rank""") { (s, d) =>
    val top3 = graft.ops.TopK.topk(3)
    Tables.customer(s, d)
      .groupBy(col("c_nationkey").cast("long").as("nationkey"))
      .agg(top3(col("c_acctbal").cast("double"), col("c_custkey"))
        .as("top"))
      .select(col("nationkey"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("nationkey"), (col("pos") + 1).cast("long").as("rank"),
        col("e.id").as("custkey"), r6(col("e.ord")).as("acctbal"))
      .orderBy(col("nationkey"), col("rank"))
  }

  val defs: Map[String, QueryDef] = Map(
    "q87_rolling_hour" -> rollingHour,
    "q88_funnel_stages" -> funnelStages,
    "q89_mixture_weights" -> mixtureWeights,
    "q90_grouped_topk" -> groupedTopK,
  )
}
