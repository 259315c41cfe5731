"""Wide table -> long (column_ref, value STRING) melt — the scan boundary.

The reference's samplers stringify every sampled scalar (reference:
src/catalog_pii_scanner/sampler.py:104-117); here the cast happens at the
scan boundary with an explicit, dialect-stable formatting spec so the Spark
engine and the DuckDB oracle produce byte-identical strings:

- int/bigint  -> plain decimal string
- double      -> via DECIMAL(18,2) (engines' raw double->string formats differ)
- timestamp   -> 'yyyy-MM-dd HH:mm:ss'
- varchar     -> as-is

Melt is a single ``stack()`` projection: no shuffle, input read once, and
Parquet column pruning still applies to any column subset selection.
"""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Column -> type map of the driver's testdata tables (TESTDATA.md; stable
#: across scale factors). 'embeddings' is excluded from melt (vector table).
TESTDATA_SCHEMAS: dict[str, list[tuple[str, str]]] = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [("n_nationkey", "int"), ("n_name", "string"),
               ("n_regionkey", "int")],
    "customer": [("c_custkey", "bigint"), ("c_name", "string"),
                 ("c_nationkey", "int"), ("c_acctbal", "double"),
                 ("c_mktsegment", "string")],
    "supplier": [("s_suppkey", "bigint"), ("s_name", "string"),
                 ("s_nationkey", "int"), ("s_acctbal", "double")],
    "part": [("p_partkey", "bigint"), ("p_name", "string"),
             ("p_brand", "string"), ("p_type", "string"),
             ("p_size", "int"), ("p_retailprice", "double")],
    "orders": [("o_orderkey", "bigint"), ("o_custkey", "bigint"),
               ("o_orderstatus", "string"), ("o_totalprice", "double"),
               ("o_orderdate", "timestamp"), ("o_orderpriority", "string")],
    "lineitem": [("l_orderkey", "bigint"), ("l_partkey", "bigint"),
                 ("l_suppkey", "bigint"), ("l_linenumber", "int"),
                 ("l_quantity", "double"), ("l_extendedprice", "double"),
                 ("l_discount", "double"), ("l_tax", "double"),
                 ("l_returnflag", "string"), ("l_linestatus", "string"),
                 ("l_shipdate", "timestamp")],
    "events": [("event_id", "bigint"), ("ts", "timestamp"),
               ("user_id", "bigint"), ("event_type", "string"),
               ("value", "double"), ("props", "string")],
    "documents": [("doc_id", "bigint"), ("text", "string"),
                  ("lang", "string"), ("source", "string"),
                  ("n_chars", "bigint")],
}


def nanos_timestamp_columns(path: str) -> list[str]:
    """Names of TIMESTAMP(NANOS) columns in a parquet file (footer-only).
    Directory-shaped tables (the normal multi-part layout) are probed via
    their first part file — one footer read either way. The check reads
    the PARQUET logical type, not the arrow-converted schema: pyarrow
    surfaces legacy INT96 timestamps (Spark's own writer default) as
    ``timestamp[ns]`` too, which Spark's reader handles natively — only a
    true Timestamp(nanoseconds) logical type needs the nanosAsLong
    workaround."""
    import glob
    import json
    import os
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            return []
        path = parts[0]
    sch = pq.ParquetFile(path).schema
    out = []
    for i in range(len(sch)):
        col = sch.column(i)
        lt = col.logical_type
        if lt is None or lt.type != "TIMESTAMP":
            continue
        if json.loads(lt.to_json()).get("timeUnit") == "nanoseconds":
            out.append(col.name)
    return out


def read_table(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read a testdata parquet table, normalizing TIMESTAMP(NANOS) columns
    (rejected by Spark's reader; surfaced as long via
    spark.sql.legacy.parquet.nanosAsLong) back to microsecond timestamps —
    the same truncation DuckDB applies."""
    path = f"{sf_dir}/{table}.parquet"
    # Runtime-settable; must hold for ANY caller-provided session (the
    # correctness harness builds a plain one), not just session.py's.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos_timestamp_columns(path):
        # pure-LONG floor division, NOT floor(x / 1000): `/` promotes the
        # ns-epoch LONG (~1.7e18, far past 2^53) to DOUBLE, and the
        # precision loss shifts timestamps by +/-1 us (caught by the
        # randomized full-suite sweep, tools/edge_sweep.py fuzz). And
        # not bare `div`, which truncates toward zero and diverges from
        # floor by 1 us on pre-1970 ns-epochs — DuckDB's TIMESTAMP_NS ->
        # TIMESTAMP cast floors (verified: -1500 ns -> -2 us), so the
        # pmod form keeps engine and oracle identical on ANY epoch.
        df = df.withColumn(
            c, F.timestamp_micros(
                F.expr(f"(`{c}` - pmod(`{c}`, 1000)) div 1000")))
    return df


def stringify_sql(col: str, dtype: str, dialect: str) -> str:
    """Dialect-stable value->string cast expression."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    if dtype in ("int", "bigint"):
        return f"CAST({col} AS {s})"
    if dtype == "double":
        return f"CAST(CAST({col} AS DECIMAL(18,2)) AS {s})"
    if dtype == "timestamp":
        if dialect == "spark":
            return f"date_format({col}, 'yyyy-MM-dd HH:mm:ss')"
        return f"strftime({col}, '%Y-%m-%d %H:%M:%S')"
    return col


def column_ref(table: str, column: str) -> str:
    return f"spark://{table}/{column}"


#: dtype -> value class at the melt boundary (see rules.VALUE_CLASSES):
#: the class label rides along the melted rows so extraction can skip
#: regex families that provably cannot match the column's rendering.
DTYPE_CLASS = {"int": "num", "bigint": "num", "double": "num",
               "timestamp": "ts", "string": "text"}


#: Parquet bytes per melt task. The melt's stringify work (date_format,
#: DECIMAL renders) is CPU-bound and expands the input ~8-10x (stack()
#: multiplies rows by the column count and decompresses), so ~0.5 MiB of
#: parquet is a healthy ~5 MB / sub-second unit of work per task.
MELT_SPLIT_BYTES = 512 * 1024


def _scan_bytes(path: str) -> int | None:
    """Total parquet bytes under ``path`` via the local filesystem, or
    ``None`` when the path is not local (s3://, hdfs:// — anything the
    driver's os.path cannot stat). Callers must treat ``None`` as
    "size unknown" and fall back to the session-parallelism fan-out
    target rather than failing the read Spark itself would handle."""
    import glob
    import os
    try:
        if os.path.isdir(path):
            return sum(os.path.getsize(p)
                       for p in glob.glob(os.path.join(path, "*.parquet")))
        return os.path.getsize(path)
    except OSError:
        return None


def melt_table(spark: SparkSession, sf_dir: str, table: str,
               columns: list[tuple[str, str]] | None = None) -> DataFrame:
    """Read one parquet table and melt to (column_ref, value, vclass).

    The testdata tables are single-row-group files — unsplittable, so
    every scan arrives as ONE task and the whole stringify pass runs on
    one core (optimization guide §2.5 input skew: "one huge
    unsplittable file ... repartition immediately after the read").
    The read is therefore fanned out to a SIZE-DERIVED target (capped
    by the session's shuffle-partition knob, never a constant) before
    the stack(), so the exchange carries the narrow pre-melt rows and
    the melt itself runs at full parallelism. On a production layout
    whose scans already carry enough splits the fan-out is a no-op."""
    import math
    from ..plans.cache import fan_out, session_parallelism
    cols = columns or TESTDATA_SCHEMAS[table]
    df = read_table(spark, sf_dir, table)
    nbytes = _scan_bytes(f"{sf_dir}/{table}.parquet")
    target = session_parallelism(spark)
    if nbytes is not None:
        # size-derived split count on a stat-able (local) path; on remote
        # storage the size is unknown and the session-parallelism target
        # applies (a splittable production layout makes fan_out a no-op).
        target = min(target, max(1, math.ceil(nbytes / MELT_SPLIT_BYTES)))
    df = fan_out(df, parts=target)
    n = len(cols)
    pairs = ", ".join(
        f"'{column_ref(table, c)}', {stringify_sql(c, t, 'spark')}, "
        f"'{DTYPE_CLASS[t]}'"
        for c, t in cols
    )
    return df.selectExpr(
        f"stack({n}, {pairs}) AS (column_ref, value, vclass)")


def melt_df(df: DataFrame, table_label: str,
            columns: tuple[str, ...]) -> DataFrame:
    """Melt already-string columns of an arbitrary DataFrame."""
    pairs = ", ".join(
        f"'{column_ref(table_label, c)}', {c}" for c in columns
    )
    return df.selectExpr(
        f"stack({len(columns)}, {pairs}) AS (column_ref, value)")


def melt_oracle_sql(table: str,
                    columns: list[tuple[str, str]] | None = None) -> str:
    """DuckDB rendering of :func:`melt_table` over the pre-registered view."""
    cols = columns or TESTDATA_SCHEMAS[table]
    selects = [
        f"SELECT '{column_ref(table, c)}' AS column_ref, "
        f"{stringify_sql(c, t, 'duckdb')} AS value, "
        f"'{DTYPE_CLASS[t]}' AS vclass FROM {table}"
        for c, t in cols
    ]
    return "(" + " UNION ALL ".join(selects) + ")"
