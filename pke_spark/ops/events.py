"""Event-stream operators over the events table (event_id, ts, user_id,
event_type, value, props JSON) — the time-windowed / sessionized /
semi-structured aggregations a training-data pipeline runs next to the
text operators. Batch forms have DuckDB oracle twins; the SAME windowed
aggregation also runs under Structured Streaming with a watermark
(streaming.windowed_event_counts, tested stream == batch).

Scale notes: tumbling windows and sessionization are single-shuffle
plans (groupBy window/event_type; window over user_id); the JSON field
is projected once before aggregation. Timestamps are exported as epoch
seconds (BIGINT) so both engines hash identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30


# ---------------------------------------------------------------- Spark

def events_windowed(events: DataFrame) -> DataFrame:
    """(window_start, event_type, n_events, total_value) — tumbling
    1-hour windows (the batch form of the streaming aggregation)."""
    return (events
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("total_value"))
            .select(F.unix_timestamp("w.start").alias("window_start"),
                    "event_type", "n_events", "total_value"))


def events_sessionized(events: DataFrame,
                       gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """(user_id, session_start, n_events, total_value) — a new session
    starts when the gap to the previous event of the same user exceeds
    ``gap_min`` minutes (run-id trick over event time).

    Gaps are computed on floor-second epochs (unix_timestamp semantics,
    mirrored by epoch_ms//1000 in the SQL twin) and event order is tied
    broken by event_id so both engines see identical sessions."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = events.withColumn(
        "new_s", F.when(gap.isNull() | (gap > gap_min * 60), 1).otherwise(0))
    wc = Window.partitionBy("user_id").orderBy("ts", "event_id") \
        .rowsBetween(Window.unboundedPreceding, 0)
    sess = flagged.withColumn("session_id", F.sum("new_s").over(wc))
    return (sess.groupBy("user_id", "session_id")
            .agg(F.min(F.unix_timestamp("ts")).alias("session_start"),
                 F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("total_value"))
            .select("user_id", "session_start", "n_events", "total_value"))


def events_json_stats(events: DataFrame) -> DataFrame:
    """(event_type, k_bucket, n, avg_value) — aggregate over a field
    parsed out of the semi-structured props column (JSON pushup: the
    field is projected once, before the shuffle)."""
    k = F.get_json_object("props", "$.k").cast("long")
    return (events
            .select("event_type", (k % 10).alias("k_bucket"), "value")
            .groupBy("event_type", "k_bucket")
            .agg(F.count("*").alias("n"),
                 F.round(F.avg("value"), 6).alias("avg_value")))


# --------------------------------------------------------------- DuckDB

def events_windowed_sql() -> str:
    return """SELECT epoch(date_trunc('hour', ts))::BIGINT AS window_start,
       event_type, count(*)::BIGINT AS n_events,
       round(sum(value), 6) AS total_value
FROM events GROUP BY 1, 2"""


def events_sessionized_sql(gap_min: int = SESSION_GAP_MIN) -> str:
    return f"""WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN (epoch_ms(ts) // 1000) - (epoch_ms(lag(ts) OVER
                (PARTITION BY user_id ORDER BY ts, event_id)) // 1000)
                > {gap_min * 60}
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM events),
sess AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged)
SELECT user_id, min(epoch_ms(ts) // 1000)::BIGINT AS session_start,
       count(*)::BIGINT AS n_events, round(sum(value), 6) AS total_value
FROM sess GROUP BY user_id, session_id"""


def events_json_stats_sql() -> str:
    return """SELECT event_type,
       (json_extract(props, '$.k')::BIGINT % 10) AS k_bucket,
       count(*)::BIGINT AS n,
       round(avg(value), 6) AS avg_value
FROM events GROUP BY 1, 2"""
