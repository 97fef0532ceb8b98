package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{Engine, Tables}

/** The temporal joins as PURE SPARK SQL — the migration surface for a
  * verbatim-SQL user (the reference's users live in SQL files; Databricks
  * ships a RANGE_JOIN hint for exactly this audience). Each recipe is the
  * same scalable shape the DataFrame operators plan — bucketized equi
  * join, never the BroadcastNestedLoopJoin a naive `BETWEEN`/inequality
  * ON-clause produces — expressed with nothing but builtin SQL
  * (`sequence`, `LATERAL VIEW explode`, window functions), so it can be
  * pasted into any Spark SQL context; the `graft_*` functions
  * ([[graft.GraftExtensions]]) are available in the same session for the
  * kernels SQL lacks. GoldSqlSpec pins each recipe's rows EQUAL to its
  * DataFrame twin (q_range_join / q_asof_join / q_session_overlap).
  *
  * The range-join text carries the full production shape including the
  * `maxBuckets` replication cap (over-cap intervals fall back to a
  * keys-only equi join, cf. [[EventOps.rangeJoinOf]]); the overlap
  * recipe shows the exactly-once max-start-bucket core — for the capped
  * sentinel variant use the DataFrame operator, the pattern is the same.
  */
object TemporalSql {

  /** Left-extended purchase→click-session attribution as one SQL text —
    * the q_range_join semantics (EventOps.rangeJoin) over an `events`
    * view. CTE tour: sessionize clicks by `gapSec` windows; compute each
    * session's bucket count `_nb`; in-cap sessions explode into their
    * covered `bucketSec` buckets (LATERAL VIEW over `sequence` with an
    * EXPLICIT step 1 — reversed intervals must throw, not silently
    * descend); purchases map to their single bucket and equi-join on
    * (user, bucket) with the exact BETWEEN as residual; over-cap
    * sessions fall back to the keys-only join; the anti-join arm keeps
    * unmatched purchases with NULL session columns. */
  def rangeJoinSql(gapSec: Long = 1800L, bucketSec: Long = 3600L,
      maxBuckets: Int = 4096): String = {
    val bUs = bucketSec * 1000000L
    s"""WITH clicks AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
), marked AS (
  SELECT *, CASE WHEN prev IS NULL
      OR unix_micros(ts) - prev > ${gapSec}000000 THEN 1 ELSE 0 END AS new_s
  FROM (SELECT *, lag(unix_micros(ts)) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) AS prev FROM clicks)
), numbered AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM marked
), sess AS (
  SELECT user_id, session_idx,
    min(ts) AS session_start, max(ts) AS session_end
  FROM numbered GROUP BY user_id, session_idx
), iv AS (
  SELECT *, unix_micros(session_end) div $bUs
          - unix_micros(session_start) div $bUs + 1 AS _nb
  FROM sess
), ivb AS (
  SELECT user_id, session_idx, session_start, session_end, _bucket
  FROM (SELECT * FROM iv WHERE _nb <= $maxBuckets)
  LATERAL VIEW explode(sequence(unix_micros(session_start) div $bUs,
    unix_micros(session_end) div $bUs, CAST(1 AS BIGINT))) x AS _bucket
), p AS (
  SELECT user_id, ts, event_id, value FROM events
  WHERE event_type = 'purchase'
), matched AS (
  SELECT p.event_id, p.user_id, p.ts, i.session_idx,
    i.session_start, i.session_end, p.value
  FROM p JOIN ivb i ON p.user_id = i.user_id
   AND unix_micros(p.ts) div $bUs = i._bucket
   AND p.ts >= i.session_start AND p.ts <= i.session_end
  UNION ALL
  SELECT p.event_id, p.user_id, p.ts, i.session_idx,
    i.session_start, i.session_end, p.value
  FROM p JOIN iv i ON p.user_id = i.user_id
   AND p.ts >= i.session_start AND p.ts <= i.session_end
  WHERE i._nb > $maxBuckets
)
SELECT * FROM matched
UNION ALL
SELECT p.event_id, p.user_id, p.ts,
  CAST(NULL AS BIGINT) AS session_idx,
  CAST(NULL AS TIMESTAMP) AS session_start,
  CAST(NULL AS TIMESTAMP) AS session_end, p.value
FROM p LEFT ANTI JOIN matched m ON p.event_id = m.event_id
ORDER BY event_id"""
  }

  /** Left AS-OF join as one SQL text — the q_asof_join semantics
    * (EventOps.asofJoin): clicks annotated with the latest same-user
    * purchase at-or-before them. The union-marker trick in SQL: both
    * sides union with references carrying their payload as ONE struct,
    * a running `last(ref, true)` (ignore-nulls) window ordered by
    * (ts, is_probe, tie) picks the latest reference — references sort
    * before probes at equal ts, so `<=` semantics hold — and probe rows
    * unpack the struct. One window over one exchange; no inequality
    * join anywhere. */
  def asofJoinSql: String =
    """WITH refs AS (
  SELECT user_id, ts, event_id, value FROM events
  WHERE event_type = 'purchase'
), probes AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
), u AS (
  SELECT user_id, ts, event_id AS tie, 0 AS is_probe,
    named_struct('ts', ts, 'event_id', event_id, 'value', value) AS ref,
    CAST(NULL AS BIGINT) AS probe_id
  FROM refs
  UNION ALL
  SELECT user_id, ts, event_id, 1,
    CAST(NULL AS STRUCT<ts: TIMESTAMP, event_id: BIGINT, value: DOUBLE>),
    event_id
  FROM probes
), w AS (
  SELECT *, last(ref, true) OVER (PARTITION BY user_id
      ORDER BY ts, is_probe, tie
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
  FROM u
)
SELECT probe_id AS event_id, user_id, ts,
  m.event_id AS ref_event_id, m.ts AS ref_ts, m.value AS ref_value
FROM w WHERE is_probe = 1 ORDER BY event_id"""

  /** Interval-overlap join as one SQL text — the q_session_overlap
    * semantics (EventOps.sessionOverlap): click sessions LEFT-joined to
    * overlapping same-user error sessions. Shows the exactly-once core:
    * both session sets explode into their buckets, pairs equi-join on
    * (user, bucket) with the overlap predicate as residual, and the
    * max-start-bucket rule keeps exactly ONE of the shared buckets — no
    * post-join DISTINCT re-shuffling the pair set. (Production cap: the
    * DataFrame operator additionally bounds per-interval replication
    * with two sentinel buckets; same pattern, see
    * [[EventOps.intervalJoinOf]].) */
  def sessionOverlapSql(gapSec: Long = 1800L, bucketSec: Long = 3600L): String = {
    val bUs = bucketSec * 1000000L
    s"""WITH e AS (
  SELECT user_id, ts, event_id, event_type FROM events
  WHERE event_type IN ('click', 'error')
), marked AS (
  SELECT *, CASE WHEN prev IS NULL
      OR unix_micros(ts) - prev > ${gapSec}000000 THEN 1 ELSE 0 END AS new_s
  FROM (SELECT *, lag(unix_micros(ts)) OVER (PARTITION BY user_id, event_type
          ORDER BY ts, event_id) AS prev FROM e)
), numbered AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id, event_type
      ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM marked
), sess AS (
  SELECT user_id, event_type, session_idx,
    min(ts) AS session_start, max(ts) AS session_end
  FROM numbered GROUP BY user_id, event_type, session_idx
), cb AS (
  SELECT user_id, session_idx AS click_idx,
    session_start AS click_start, session_end AS click_end, _bucket
  FROM (SELECT * FROM sess WHERE event_type = 'click')
  LATERAL VIEW explode(sequence(unix_micros(session_start) div $bUs,
    unix_micros(session_end) div $bUs, CAST(1 AS BIGINT))) x AS _bucket
), eb AS (
  SELECT user_id, session_idx AS err_idx,
    session_start AS err_start, session_end AS err_end, _bucket
  FROM (SELECT * FROM sess WHERE event_type = 'error')
  LATERAL VIEW explode(sequence(unix_micros(session_start) div $bUs,
    unix_micros(session_end) div $bUs, CAST(1 AS BIGINT))) x AS _bucket
), matched AS (
  SELECT c.user_id, c.click_idx, e.err_idx,
    c.click_start, c.click_end, e.err_start, e.err_end,
    unix_micros(least(c.click_end, e.err_end))
      - unix_micros(greatest(c.click_start, e.err_start)) AS overlap_us
  FROM cb c JOIN eb e ON c.user_id = e.user_id AND c._bucket = e._bucket
  WHERE greatest(c.click_start, e.err_start) <= least(c.click_end, e.err_end)
    AND c._bucket =
      unix_micros(greatest(c.click_start, e.err_start)) div $bUs
), clicks AS (
  SELECT user_id, session_idx AS click_idx,
    session_start AS click_start, session_end AS click_end
  FROM sess WHERE event_type = 'click'
)
SELECT * FROM matched
UNION ALL
SELECT c.user_id, c.click_idx, CAST(NULL AS BIGINT) AS err_idx,
  c.click_start, c.click_end,
  CAST(NULL AS TIMESTAMP) AS err_start, CAST(NULL AS TIMESTAMP) AS err_end,
  CAST(NULL AS BIGINT) AS overlap_us
FROM clicks c LEFT ANTI JOIN matched m
  ON c.user_id = m.user_id AND c.click_idx = m.click_idx
ORDER BY user_id, click_idx, err_idx"""
  }

  /** FORWARD as-of join as one SQL text — the q_asof_forward semantics
    * (EventOps.asofJoinForward): the union-marker window MIRRORED
    * (ts DESC, tie DESC; references still sort before probes at equal
    * ts, so >= semantics hold). Same one-exchange shape. */
  def asofForwardSql: String =
    """WITH u AS (
  SELECT user_id, ts, event_id AS tie, 0 AS is_probe,
    named_struct('ts', ts, 'event_id', event_id, 'value', value) AS ref,
    CAST(NULL AS BIGINT) AS probe_id
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts, event_id, 1,
    CAST(NULL AS STRUCT<ts: TIMESTAMP, event_id: BIGINT, value: DOUBLE>),
    event_id
  FROM events WHERE event_type = 'click'
), w AS (
  SELECT *, last(ref, true) OVER (PARTITION BY user_id
      ORDER BY ts DESC, is_probe, tie DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
  FROM u
)
SELECT probe_id AS event_id, user_id, ts,
  m.event_id AS ref_event_id, m.ts AS ref_ts, m.value AS ref_value
FROM w WHERE is_probe = 1 ORDER BY event_id"""

  /** NEAREST as-of join as one SQL text — the q_asof_nearest semantics
    * (EventOps.asofJoinNearest): BOTH direction windows over the same
    * union frame (one exchange, two in-partition sorts), smaller
    * absolute gap wins, equal gaps resolve backward. */
  def asofNearestSql: String =
    """WITH u AS (
  SELECT user_id, ts, event_id AS tie, 0 AS is_probe,
    named_struct('ts', ts, 'event_id', event_id, 'value', value) AS ref,
    CAST(NULL AS BIGINT) AS probe_id
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts, event_id, 1,
    CAST(NULL AS STRUCT<ts: TIMESTAMP, event_id: BIGINT, value: DOUBLE>),
    event_id
  FROM events WHERE event_type = 'click'
), w AS (
  SELECT *,
    last(ref, true) OVER (PARTITION BY user_id
      ORDER BY ts, is_probe, tie
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mb,
    last(ref, true) OVER (PARTITION BY user_id
      ORDER BY ts DESC, is_probe, tie DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mf
  FROM u
), sel AS (
  SELECT *, CASE
    WHEN mb IS NULL THEN mf
    WHEN mf IS NULL THEN mb
    WHEN unix_micros(mf.ts) - unix_micros(ts)
       < unix_micros(ts) - unix_micros(mb.ts) THEN mf
    ELSE mb END AS m
  FROM w
)
SELECT probe_id AS event_id, user_id, ts,
  m.event_id AS ref_event_id, m.ts AS ref_ts, m.value AS ref_value
FROM sel WHERE is_probe = 1 ORDER BY event_id"""

  /** Per-user idle-gap report as one SQL text — the q_idle_gaps
    * semantics (EventOps.idleGaps): per-(user, type) gap sessions,
    * merged into covered segments by the running-max sweep, lag gaps
    * between segments. Every window reuses the per-user exchange; the
    * gap pass runs on rows ∝ segments. */
  def idleGapsSql(gapSec: Long = 1800L): String =
    s"""WITH b AS (
  SELECT *, CASE WHEN prev IS NULL
      OR unix_micros(ts) - prev > ${gapSec}000000 THEN 1 ELSE 0 END AS new_s
  FROM (SELECT user_id, event_type, ts, event_id,
          lag(unix_micros(ts)) OVER (PARTITION BY user_id, event_type
            ORDER BY ts, event_id) AS prev FROM events)
), s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id, event_type
      ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM b
), iv AS (
  SELECT user_id, min(ts) AS session_start, max(ts) AS session_end
  FROM s GROUP BY user_id, event_type, session_idx
), m AS (
  SELECT user_id, session_start, session_end,
    max(unix_micros(session_end)) OVER (PARTITION BY user_id
      ORDER BY session_start, session_end
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM iv
), sg AS (
  SELECT *, sum(new_seg) OVER (PARTITION BY user_id
      ORDER BY session_start, session_end
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
  FROM (SELECT *, CASE WHEN prev_max IS NULL
      OR unix_micros(session_start) > prev_max THEN 1 ELSE 0 END AS new_seg
    FROM m)
), per AS (
  SELECT user_id, seg,
    min(unix_micros(session_start)) AS s, max(unix_micros(session_end)) AS e
  FROM sg GROUP BY user_id, seg
), g AS (
  SELECT user_id, s, e,
    s - lag(e) OVER (PARTITION BY user_id ORDER BY s, e) AS gap
  FROM per)
SELECT user_id,
  count_if(gap IS NOT NULL) AS n_gaps,
  COALESCE(sum(gap), 0L) AS idle_us,
  COALESCE(max(gap), 0L) AS max_gap_us,
  max(e) - min(s) AS span_us
FROM g GROUP BY user_id ORDER BY user_id"""

  /** Cohort retention triangle as one SQL text — the q_retention_matrix
    * semantics (EventOps.retentionMatrix): distinct (user, day), cohort
    * by first day, integer week offsets, cohort sizes joined back, one
    * final double division for the rate. */
  def retentionMatrixSql: String =
    """WITH act AS (
  SELECT DISTINCT user_id, to_date(ts) AS d FROM events
), first AS (
  SELECT user_id, min(d) AS cohort_day FROM act GROUP BY user_id
), sizes AS (
  SELECT cohort_day, count(*) AS cohort_size FROM first GROUP BY cohort_day
), cells AS (
  SELECT f.cohort_day,
    CAST(datediff(a.d, f.cohort_day) div 7 AS INT) AS week_offset,
    count(DISTINCT a.user_id) AS n_users
  FROM act a JOIN first f ON a.user_id = f.user_id
  GROUP BY f.cohort_day, CAST(datediff(a.d, f.cohort_day) div 7 AS INT)
)
SELECT c.cohort_day, c.week_offset, c.n_users, s.cohort_size,
  CAST(c.n_users AS DOUBLE) * 100.0 / CAST(s.cohort_size AS DOUBLE)
    AS retention_pct
FROM cells c JOIN sizes s ON c.cohort_day = s.cohort_day
ORDER BY c.cohort_day, c.week_offset"""

  private def withEventsView(spark: SparkSession, sfDir: String): Unit = {
    Engine.configure(spark)
    Tables.events(spark, sfDir).createOrReplaceTempView("events")
  }

  /** Run [[rangeJoinSql]] over the events table — GoldSqlSpec pins the
    * rows equal to EventOps.rangeJoin. */
  def rangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    withEventsView(spark, sfDir); spark.sql(rangeJoinSql())
  }

  /** Run [[asofJoinSql]] — pinned equal to EventOps.asofJoin. */
  def asofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    withEventsView(spark, sfDir); spark.sql(asofJoinSql)
  }

  /** Run [[sessionOverlapSql]] — pinned equal to EventOps.sessionOverlap. */
  def sessionOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    withEventsView(spark, sfDir); spark.sql(sessionOverlapSql())
  }

  /** Run [[asofForwardSql]] — pinned equal to EventOps.asofJoinForward. */
  def asofForward(spark: SparkSession, sfDir: String): DataFrame = {
    withEventsView(spark, sfDir); spark.sql(asofForwardSql)
  }

  /** Run [[asofNearestSql]] — pinned equal to EventOps.asofJoinNearest. */
  def asofNearest(spark: SparkSession, sfDir: String): DataFrame = {
    withEventsView(spark, sfDir); spark.sql(asofNearestSql)
  }

  /** Run [[idleGapsSql]] — pinned equal to EventOps.idleGaps. */
  def idleGaps(spark: SparkSession, sfDir: String): DataFrame = {
    withEventsView(spark, sfDir); spark.sql(idleGapsSql())
  }

  /** Run [[retentionMatrixSql]] — pinned equal to
    * EventOps.retentionMatrix. */
  def retentionMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    withEventsView(spark, sfDir); spark.sql(retentionMatrixSql)
  }
}
