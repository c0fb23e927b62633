"""Pipeline-2 (DataReport) operator family: parse → filter → window-agg → late split.

Reference behaviors (SURVEY.md §2.2, §2.5, §2.6):
  * ts_parse     — tolerant SimpleDateFormat parse (DataReport.java:100-108);
                   Spark's sentinel for a bad record is NULL, not time==0
  * filter_valid — drop unparseable records (DataReport.java:120-129)
  * format_tsv   — tuple→TSV projection for the late sink (DataReport.java:156-161)
  * window_count — keyed 30 s tumbling count+max(ts) (MyAggFunction.java:19-51);
                   the reference buffers+sorts a whole window pane to find the
                   max — here it is a hash aggregate with map-side partials
  * late_split   — late-data side output (DataReport.java:132,141,146-161),
                   batch twin: threshold predicate split

The corpus `events.ts` is already a timestamp, so the string-parse
operators first format it back to the reference's 'yyyy-MM-dd HH:mm:ss'
wire format (with a deterministic malformed subset to exercise the
error path), then parse — same contract as the Kafka JSON input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flinkproj_spark.sources.tables import load_table

# Deterministic "malformed dt" predicate: the reference's bad-record path
# (ParseException → time=0) has no natural twin in clean corpus data, so
# error-type events stand in for wire corruption.
_BAD = "event_type = 'error'"


def _wire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as they would arrive off the wire: dt as string, with the
    deterministic malformed subset."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        "event_type",
        "user_id",
        F.when(F.expr(_BAD), F.lit("xxxx-bad-date"))
        .otherwise(F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
        .alias("dt"),
    )


def ts_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String→timestamp with error tolerance: try_to_timestamp yields NULL
    on failure (the idiomatic sentinel replacing the reference's time=0,
    DataReport.java:100-108). Emits the parsed epoch seconds."""
    wire = _wire(spark, sf_dir)
    return wire.select(
        "event_id",
        "dt",
        F.unix_timestamp(
            F.try_to_timestamp("dt", F.lit("yyyy-MM-dd HH:mm:ss"))
        ).alias("ts_sec"),
    )


def filter_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record filter: keep rows whose timestamp parsed
    (DataReport.java:120-129 drops time==0; here ts IS NOT NULL)."""
    parsed = ts_parse(spark, sf_dir)
    return parsed.filter(F.col("ts_sec").isNotNull()).select("event_id", "ts_sec")


def format_tsv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tuple→TSV line projection (DataReport.java:156-161:
    f0+"\\t"+f1+"\\t"+f2) — concat_ws keeps it one codegen'd expression."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.concat_ws(
            "\t",
            F.unix_timestamp(F.date_trunc("second", "ts")).cast("string"),
            "event_type",
            F.col("user_id").cast("string"),
        ).alias("line"),
    )


def window_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed tumbling-window COUNT + MAX(ts): for each (event_type,
    30 s event-time window) emit count and the formatted max timestamp
    (MyAggFunction.java:19-51 buffers the pane, sorts, takes the last —
    that whole dance is max(); Spark runs it as partial+final hash agg,
    so no per-window buffering and it parallelizes per key at any scale).

    window.start is emitted as epoch seconds so the oracle compares
    integers, not timezone-bearing timestamps."""
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy(
        F.window("ts", "30 seconds").alias("w"),
        "event_type",
    ).agg(
        F.count("*").alias("cnt"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("time"),
    )
    return agg.select(
        F.unix_timestamp("w.start").alias("window_start"),
        "event_type",
        "cnt",
        "time",
    )


def late_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data side output, batch twin (DataReport.java:141,146-161):
    records older than (max event time − 7 days) are routed to the late
    channel as TSV lines — the same threshold predicate SHAPE the
    streaming foreachBatch splitter applies against its watermark
    bound (ts < high-water-mark − delay). The 7-day constant is
    corpus-tuned, not reference-derived: the reference's real bound is
    40 s (10 s disorder + 30 s allowed lateness, MyWatermark.java:15 +
    DataReport.java:140), but the batch fixture's events table spans
    30 days with no replayable arrival order, so a seconds-scale bound
    would mark ~everything or ~nothing; 7 days against the 30-day span
    keeps both branches live at every SF (the VACUUM_RETAIN_DAYS
    pattern). The streaming twin uses the true 40 s bound. The max()
    is a scalar subquery → broadcast, no shuffle of the fact side."""
    events = load_table(spark, sf_dir, "events")
    threshold = events.agg(
        (F.max("ts") - F.expr("INTERVAL 7 DAYS")).alias("cutoff")
    )
    late = events.join(F.broadcast(threshold)).filter(F.col("ts") < F.col("cutoff"))
    return late.select(
        "event_id",
        F.concat_ws(
            "\t",
            F.unix_timestamp(F.date_trunc("second", "ts")).cast("string"),
            "event_type",
        ).alias("line"),
    )


QUERIES = {
    "ts_parse": ts_parse,
    "filter_valid": filter_valid,
    "format_tsv": format_tsv,
    "window_count": window_count,
    "late_split": late_split,
}

_WIRE_SQL = """
    SELECT event_id, event_type, user_id,
           CASE WHEN event_type = 'error' THEN 'xxxx-bad-date'
                ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END AS dt
    FROM events
"""

ORACLE = {
    "ts_parse": f"""
        SELECT event_id, dt,
               CAST(epoch(try_strptime(dt, '%Y-%m-%d %H:%M:%S')) AS BIGINT) AS ts_sec
        FROM ({_WIRE_SQL})
    """,
    "filter_valid": f"""
        SELECT event_id,
               CAST(epoch(try_strptime(dt, '%Y-%m-%d %H:%M:%S')) AS BIGINT) AS ts_sec
        FROM ({_WIRE_SQL})
        WHERE try_strptime(dt, '%Y-%m-%d %H:%M:%S') IS NOT NULL
    """,
    "format_tsv": """
        SELECT event_id,
               CAST(epoch(date_trunc('second', ts)) AS BIGINT) || chr(9) ||
               event_type || chr(9) || CAST(user_id AS VARCHAR) AS line
        FROM events
    """,
    "window_count": """
        SELECT CAST(FLOOR(epoch(ts) / 30) * 30 AS BIGINT) AS window_start,
               event_type,
               COUNT(*) AS cnt,
               strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS time
        FROM events
        GROUP BY 1, 2
    """,
    "late_split": """
        SELECT event_id,
               CAST(epoch(date_trunc('second', ts)) AS BIGINT) || chr(9) ||
               event_type AS line
        FROM events
        WHERE ts < (SELECT MAX(ts) - INTERVAL 7 DAY FROM events)
    """,
}
