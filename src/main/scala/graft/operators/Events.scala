package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Events surface (SURVEY.md §2.J + §2.C5): time-window aggregations,
  * stateful-style dedup, as-of join, stream-static enrichment. All run here
  * in batch and are Structured-Streaming-compatible shapes (`window`,
  * `session_window`, `dropDuplicates`, stream-static join).
  */
object Events {

  val queries: Seq[Q] = Seq(

    // ---- §2.J1: tumbling window aggregate ----
    Q("q_events_tumbling",
      """SELECT CAST(time_bucket(INTERVAL '1 day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS ws,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS val_sum
        |FROM events GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
             Relational.dsum(col("value"), 4).as("val_sum"))
        .select(col("w.start").as("ws"), col("event_type"), col("n"), col("val_sum"))
        .orderBy("ws", "event_type")
    },

    // ---- §2.J2: sliding window (1 day window, 12 h slide => 2 windows/event) ----
    Q("q_events_sliding",
      """SELECT ws, event_type, count(*) AS n FROM (
        |  SELECT CAST(time_bucket(INTERVAL '12 hours', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS ws,
        |         event_type FROM events
        |  UNION ALL
        |  SELECT CAST(time_bucket(INTERVAL '12 hours', CAST(ts AS TIMESTAMP)) - INTERVAL '12 hours' AS TIMESTAMP) AS ws,
        |         event_type FROM events
        |) GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 day", "12 hours").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("ws"), col("event_type"), col("n"))
        .orderBy("ws", "event_type")
    },

    // ---- §2.J3: session window (30 min gap) vs gap-and-island oracle ----
    Q("q_events_session",
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sid AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g
        |), sess AS (
        |  SELECT user_id, sid, count(*) AS c,
        |    max(epoch_us(ts)) - min(epoch_us(ts)) AS len_us
        |  FROM sid GROUP BY user_id, sid
        |)
        |SELECT user_id, count(*) AS n_sessions, CAST(sum(c) AS BIGINT) AS n_events,
        |  max(len_us) AS max_len_us
        |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
        .agg(count(lit(1)).as("c"),
             (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("len_us"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), sum(col("c")).as("n_events"),
             max(col("len_us")).as("max_len_us"))
        .orderBy("user_id")
    },

    // ---- §2.J5: deterministic dedup — earliest event per (user, type) ----
    Q("q_events_dedup",
      """SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS first_ts FROM (
        |  SELECT user_id, event_type, event_id, ts,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events
        |) WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"), col("ts").as("first_ts"))
        .orderBy("user_id", "event_type")
    },

    // ---- §2.C5: as-of join — latest prior 'view' for each 'purchase' ----
    Q("q_events_asof",
      // explicit windowed replay, NOT DuckDB's ASOF JOIN: among several
      // views sharing the latest v.ts, ASOF picks an UNSPECIFIED row,
      // while the engine deterministically carries the greatest payload
      // struct (max view event_id at that ts) — the rn ordering pins the
      // same row so equal-ts testdata can never flake the compare
      """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT * FROM events WHERE event_type = 'view'),
        |m AS (
        |  SELECT p.event_id, v.event_id AS view_id, v.ts AS vts,
        |    row_number() OVER (PARTITION BY p.event_id
        |      ORDER BY v.ts DESC, v.event_id DESC) AS rn
        |  FROM p JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
        |)
        |SELECT p.event_id, m.view_id,
        |  epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(m.vts AS TIMESTAMP)) AS gap_us
        |FROM p LEFT JOIN (SELECT * FROM m WHERE rn = 1) m USING (event_id)
        |ORDER BY p.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id")
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"))
      AsofJoin.leftAsof(purchases, views, key = "user_id",
          leftTs = "ts", rightTs = "ts",
          rightCols = Seq("event_id" -> "view_id", "ts" -> "view_ts"))
        .select(col("event_id"),
                col("view_id"),
                (unix_micros(col("ts")) - unix_micros(col("view_ts"))).as("gap_us"))
        .orderBy("event_id")
    },

    // ---- ordered funnel: view -> click -> purchase per user ----
    // Classic product-analytics shape the events schema serves: each stage
    // is "first qualifying event STRICTLY AFTER the previous stage", so a
    // user who clicked before ever viewing does not count as stage 2.
    // Three filtered min-aggregates chained by per-user equi-joins — each
    // stage's state is one row per surviving user (shrinking monotonically),
    // shuffled by user_id; stage joins reuse that partitioning. No window
    // over the full event stream, no self-join of events with events.
    Q("q_events_funnel",
      """WITH t1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id
        |), t2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN t1 ON t1.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY e.user_id
        |), t3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN t2 ON t2.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY e.user_id
        |)
        |SELECT (SELECT count(*) FROM t1) AS n_view,
        |       (SELECT count(*) FROM t2) AS n_view_click,
        |       (SELECT count(*) FROM t3) AS n_view_click_purchase""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      def stage(typ: String, prev: org.apache.spark.sql.DataFrame, prevTs: String, out: String) =
        ev.filter(col("event_type") === typ)
          .join(prev, Seq("user_id"))
          .filter(col("ts") > col(prevTs))
          .groupBy("user_id").agg(min(col("ts")).as(out))
      val t1 = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      val t2 = stage("click", t1, "t1", "t2")
      val t3 = stage("purchase", t2, "t2", "t3")
      def n(df: org.apache.spark.sql.DataFrame, name: String) =
        df.agg(count(lit(1)).as(name))
      n(t1, "n_view").crossJoin(n(t2, "n_view_click"))
        .crossJoin(n(t3, "n_view_click_purchase"))
    },

    // ---- §2.J6: stream-static join (events enriched by customer dim) ----
    Q("q_events_enrich",
      """SELECT c_mktsegment, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS val_sum
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment, event_type ORDER BY c_mktsegment, event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .join(broadcast(Tables.customer(s, d)), col("user_id") === col("c_custkey"))
        .groupBy("c_mktsegment", "event_type")
        .agg(count(lit(1)).as("n"),
             Relational.dsum(col("value"), 4).as("val_sum"))
        .orderBy("c_mktsegment", "event_type")
    },

    // ---- CDC changelog apply: materialize current state from an event
    // log. Each event upserts its user's state; an 'error' event is the
    // tombstone (the user's record is withdrawn until a later non-error
    // event re-creates it) — the standard latest-wins merge a snapshot
    // consumer runs over a captured change stream. Window is keyed by
    // user_id, so the plan is partition-parallel at any key cardinality;
    // the (ts DESC, event_id DESC) tie-break makes latest-wins exact and
    // engine-portable. user_id IS NOT NULL on both sides: Spark's
    // partitionBy would pool NULL keys into one partition-sized group
    // (the r11 asof lesson) and SQL row_number treats NULLs as one
    // partition too — symmetric exclusion beats divergent NULL merges.
    Q("q_events_cdc_apply",
      """SELECT user_id, event_type AS last_type,
        |  CAST(ts AS TIMESTAMP) AS last_ts,
        |  round(value, 6) AS last_value, n_events
        |FROM (
        |  SELECT user_id, event_type, ts, value,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n_events
        |  FROM events WHERE user_id IS NOT NULL
        |) WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val byUser = Window.partitionBy("user_id")
      val latest = byUser.orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .filter(col("user_id").isNotNull)
        .withColumn("rn", row_number().over(latest))
        .withColumn("n_events", count(lit(1)).over(byUser))
        .filter(col("rn") === 1 && col("event_type") =!= "error")
        .select(col("user_id"), col("event_type").as("last_type"),
          col("ts").as("last_ts"), round(col("value"), 6).as("last_value"),
          col("n_events"))
        .orderBy("user_id")
    },

    // ---- CDC snapshot-consumer composition: state_t + changelog ----
    // The incremental form of the reference's snapshot swap
    // (/root/reference/cloud2sql/collect.py:198-203 materializes each
    // run from scratch): a consumer holding snapshot-time state applies
    // ONLY the new changelog slice and must land on exactly the state a
    // full recompute produces. [[cdcState]] over the pre-cut prefix is
    // the stored snapshot (INCLUDING tombstoned users — the state store
    // keeps them so a later event can revive the key with the right
    // n_events); [[cdcApply]] merges the post-cut slice; publishing
    // filters tombstones, same as q_events_cdc_apply. The oracle is the
    // FULL recompute over all events — the composition has no
    // incremental shortcut on the oracle side to hide behind. Plan
    // shape: two keyed windows (prefix state + merge), both
    // partition-parallel at any key cardinality; the changelog slice
    // rides a pushed-down ts filter.
    Q("q_events_cdc_snapshot",
      """SELECT user_id, event_type AS last_type,
        |  CAST(ts AS TIMESTAMP) AS last_ts,
        |  round(value, 6) AS last_value, n_events
        |FROM (
        |  SELECT user_id, event_type, ts, value,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts DESC, event_id DESC) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n_events
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |) WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val cut = lit("2024-01-16 00:00:00").cast("timestamp")
      // NULL ts is excluded SYMMETRICALLY (the oracle filters it too): a
      // cut-based composition needs every event classifiable into exactly
      // one slice, and a NULL ts satisfies neither `<= cut` nor `> cut` —
      // it would silently vanish from the composed state while a full
      // recompute counts it (producers CAN emit NULL ts: SqliteSource
      // degrades out-of-range integer timestamps to NULL by contract)
      val ev = Tables.events(s, d).filter(col("ts").isNotNull)
      val state = cdcState(ev.filter(col("ts") <= cut))
      cdcApply(state, ev.filter(col("ts") > cut))
        .filter(col("last_type") =!= "error")
        .select(col("user_id"), col("last_type"), col("last_ts"),
          round(col("last_value"), 6).as("last_value"), col("n_events"))
        .orderBy("user_id")
    }
  )

  /** Full per-user CDC state over an event slice — the STORED form of
    * q_events_cdc_apply's merge, kept unpublished: tombstoned users
    * (latest event 'error') stay in the state with their event count, so
    * a later changelog event can revive the key with an exact cumulative
    * n_events. NULL user_ids are excluded (the r11 asof lesson: Spark's
    * partitionBy pools NULL keys into one partition-sized group).
    * Returns (user_id, last_type, last_ts, last_event_id, last_value,
    * n_events).
    */
  def cdcState(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val byUser = Window.partitionBy("user_id")
    val latest = byUser.orderBy(col("ts").desc, col("event_id").desc)
    events.filter(col("user_id").isNotNull)
      .withColumn("__rn", row_number().over(latest))
      .withColumn("n_events", count(lit(1)).over(byUser))
      .filter(col("__rn") === 1)
      .select(col("user_id"), col("event_type").as("last_type"),
        col("ts").as("last_ts"), col("event_id").as("last_event_id"),
        col("value").as("last_value"), col("n_events"))
  }

  /** Advance a [[cdcState]] snapshot by a changelog slice: each state row
    * re-enters the merge as one pseudo-event carrying its cumulative
    * weight (`n_events`), changelog events carry weight 1, and the keyed
    * (ts DESC, event_id DESC) latest-wins merge runs over the union —
    * exact because the state row's (ts, event_id) IS the true maximum of
    * its prefix, so the global latest and the summed count both compose.
    * PRECONDITION: the changelog is disjoint from the events already
    * folded into `state` (a replayed event would double-count n_events —
    * the standard at-least-once dedup belongs upstream, e.g.
    * q_events_dedup's dropDuplicates). One shuffle on user_id; state
    * cardinality bounds the window's key count, per-key history is
    * 1 + the user's changelog size.
    */
  def cdcApply(state: org.apache.spark.sql.DataFrame,
               changelog: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val st = state.select(col("user_id"), col("last_type").as("event_type"),
      col("last_ts").as("ts"), col("last_event_id").as("event_id"),
      col("last_value").as("value"), col("n_events").as("__w"))
    val ch = changelog.filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        col("value"), lit(1L).as("__w"))
    val byUser = Window.partitionBy("user_id")
    val latest = byUser.orderBy(col("ts").desc, col("event_id").desc)
    st.unionByName(ch)
      .withColumn("__rn", row_number().over(latest))
      .withColumn("__n", sum(col("__w")).over(byUser))
      .filter(col("__rn") === 1)
      .select(col("user_id"), col("event_type").as("last_type"),
        col("ts").as("last_ts"), col("event_id").as("last_event_id"),
        col("value").as("last_value"), col("__n").as("n_events"))
  }
}
