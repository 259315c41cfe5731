"""Incremental / watcher mode — Structured Streaming.

The reference only *promises* watchers (poll / EventBridge / HMS listener —
README.md:41,229-233; no code exists). Here it is the real surface:

- ``watch_events``: file-source stream over an events directory -> tumbling
  1-hour event-time aggregation with a watermark for late data -> sink.
  ``trigger(availableNow=True)`` gives the poll-mode semantics (drain
  what's new, stop); a processingTime trigger gives continuous polling.
- ``scan_stream``: the incremental PII scan — new text values arriving as
  files are scanned with the same extraction operators (the batch/stream
  unification Spark gives for free: `extract_candidates` is a projection,
  usable verbatim on a streaming DataFrame).
- ``events_hourly``: the batch-equivalent of the windowed aggregation
  (identical results on a static directory) — this is what the DuckDB
  oracle checks; the streaming path is asserted equal in tests.

Scale notes: the file source lists incrementally (maxFilesPerTrigger
bounds batch size); the windowed agg state is bounded by the watermark;
findings MERGE into the store keyed on (column_ref, window) would be the
Delta path in production — here the sink is parquet/memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.rules import candidate_score, extract_candidates

EVENTS_SCHEMA = ("event_id bigint, ts timestamp, user_id bigint, "
                 "event_type string, value double, props string")


def _hourly_agg(events: DataFrame, streaming: bool = False) -> DataFrame:
    """Shared batch/stream aggregation: tumbling 1h x event_type.

    Streaming cannot run exact distinct aggregations, so the stream path
    uses approx_count_distinct (HLL state, bounded memory) — exact for the
    small per-window cardinalities here; the batch/oracle path stays
    exact.
    """
    n_users = (F.approx_count_distinct("user_id") if streaming
               else F.countDistinct("user_id"))
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"),
            "event_type")
        .agg(
            F.count("*").alias("n_events"),
            n_users.alias("n_users"),
            (F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
             .cast("double")).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "n_users", "sum_value")
    )


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-equivalent windowed aggregation (oracle-checked)."""
    from ..sources.melt import read_table
    return _hourly_agg(read_table(spark, sf_dir, "events"))


def events_hourly_oracle_sql(events_rel: str = "events") -> str:
    return f"""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
       CAST(round(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS sum_value
FROM {events_rel}
GROUP BY 1, 2
"""


#: Stream-source schema when the parquet carries TIMESTAMP(NANOS): Spark's
#: reader surfaces nanos as LONG under nanosAsLong; the stream projects it
#: back to a microsecond timestamp (same truncation as sources/melt.py).
EVENTS_SCHEMA_NANOS = EVENTS_SCHEMA.replace("ts timestamp", "ts bigint")


def _single_file_glob(path: str) -> str:
    """A glob matching exactly ``path``. The file stream source refuses a
    plain file path (it forces basePath to the path, which must be a
    directory) but accepts a glob — wrapping the first character of the
    final component in a character class makes any file path streamable
    without staging a copy."""
    head, _, tail = path.rpartition("/")
    return f"{head}/[{tail[0]}]{tail[1:]}" if tail else path


def watch_events(spark: SparkSession, events_path: str,
                 watermark: str = "2 hours", nanos: bool = False):
    """Streaming watcher over an events file source (directory, glob, or —
    via the single-file glob rewrite — one parquet file). Returns the
    streaming DataFrame (caller picks the sink/trigger). ``nanos=True``
    reads TIMESTAMP(NANOS) sources in place (requires
    spark.sql.legacy.parquet.nanosAsLong)."""
    import os
    if os.path.isfile(events_path):
        events_path = _single_file_glob(events_path)
    stream = (
        spark.readStream
        .schema(EVENTS_SCHEMA_NANOS if nanos else EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(events_path)
    )
    if nanos:
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000)
                                     .cast("long")))
    return _hourly_agg(stream.withWatermark("ts", watermark),
                       streaming=True)


def run_watcher_once(spark: SparkSession, events_path: str,
                     query_name: str = "cpss_watch",
                     nanos: bool = False) -> DataFrame:
    """Poll-mode drain: process all currently-available files into an
    in-memory sink and return the result as a batch DataFrame."""
    q = (
        watch_events(spark, events_path, nanos=nanos)
        .writeStream.format("memory").queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def stream_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract query: the REAL Structured Streaming path — drain
    the events table IN PLACE with an availableNow watcher (no staging
    rewrite; the source file streams directly via the single-file glob).
    n_users is dropped from the output because the stream path uses HLL
    approx_count_distinct (bounded state); the exact columns are
    oracle-checked against the same SQL as the batch query."""
    from ..sources.melt import nanos_timestamp_columns
    path = f"{sf_dir}/events.parquet"
    nanos = "ts" in nanos_timestamp_columns(path)
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    drained = run_watcher_once(spark, path, "cpss_stream_hourly",
                               nanos=nanos)
    return drained.select("window_start", "event_type", "n_events",
                          "sum_value")


def stream_events_hourly_oracle_sql(events_rel: str = "events") -> str:
    return f"""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events,
       CAST(round(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS sum_value
FROM {events_rel}
GROUP BY 1, 2
"""


def scan_stream(spark: SparkSession, values_dir: str, schema: str =
                "column_ref string, value string") -> DataFrame:
    """Incremental PII scan over a stream of (column_ref, value) files —
    the batch extraction operators apply verbatim (projection-only, so the
    stream runs in append mode; the rollup/distinct would be per-window
    stateful aggregations downstream)."""
    stream = (
        spark.readStream.schema(schema)
        .parquet(values_dir)
        .where(F.col("value").isNotNull())
    )
    return extract_candidates(stream).withColumn("prob", candidate_score())
