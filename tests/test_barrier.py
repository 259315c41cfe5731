"""Plan-shape guards for plans/barrier.py.

These assert against the OPTIMIZED/PHYSICAL plan, not timings: the failure
mode being guarded (Catalyst pushing a filter below its defining
projection and re-evaluating an expensive expression tree — or a whole
duplicate ArrowEvalPython stage) is invisible to result-correctness tests
and flaky to detect by wall-clock on a noisy box.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from catalog_pii_scanner_spark.plans.barrier import barrier_filter


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_barrier_filter_same_rows(spark):
    df = spark.range(100).select("id", (F.col("id") % 10).alias("x"))
    agg = df.groupBy("x").agg(F.count("*").alias("n"))
    plain = agg.where(F.col("n") > 5)
    guarded = barrier_filter(agg, F.col("n") > 5)
    key = lambda r: (r["x"], r["n"])
    assert sorted((r.asDict() for r in guarded.collect()), key=key) \
        == sorted((r.asDict() for r in plain.collect()), key=key)


def test_barrier_filter_not_pushed_through_aggregate(spark):
    df = spark.range(100).select("id", (F.col("id") % 10).alias("x"))
    agg = df.groupBy("x").agg(F.count("*").alias("n"))
    # plain .where on the grouping key would be pushed below the agg;
    # the barrier condition must stay above it (top node = Project over
    # Filter, with the barrier column in the condition).
    guarded = barrier_filter(agg, F.col("x") > 5)
    opt = _optimized(guarded)
    top_filter = next(line for line in opt.split("\n") if "Filter" in line)
    assert "_pushdown_barrier" in top_filter
    agg_pos = opt.index("Aggregate")
    assert opt.index("Filter") < agg_pos, opt


def test_extract_candidates_single_arrow_stage(spark):
    from catalog_pii_scanner_spark.operators.rules import extract_candidates
    vals = spark.createDataFrame(
        [("c1", "a@b.com and 4111 1111 1111 1111")],
        "column_ref string, value string")
    plan = _physical(extract_candidates(vals))
    # one ArrowEvalPython evaluates BOTH checksum UDFs exactly once; the
    # regression is a second stage materialized for the checksum filter.
    assert plan.count("ArrowEvalPython") == 1, plan


def test_running_total_big_window_is_bucket_partitioned(spark):
    """The distributed prefix sum must never plan the data-sized window
    globally: the only partition-less window allowed is the 256-row
    bucket-offsets one."""
    from catalog_pii_scanner_spark.plans.prefix import running_total
    df = spark.range(1000).select(F.col("id"), F.lit(3).alias("w"))
    out = running_total(df, "id", "w")
    plan = _physical(out)
    specs = [line for line in plan.split("\n") if "Window" in line]
    big = [s for s in specs if "_bucket" in s and "_run" in s]
    assert big, plan  # the per-row cumsum window partitions by bucket
    # and the result equals the naive global cumsum
    import hashlib
    order = sorted(range(1000),
                   key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(),
                                  i))
    expected = {i: 3 * rank for rank, i in enumerate(order)}
    got = {r.id: r.run_total for r in out.collect()}
    assert got == expected


def test_gated_fusion_filter_above_distinct(spark):
    from catalog_pii_scanner_spark.operators.ensemble import fuse_predictions
    cands = spark.createDataFrame(
        [("c1", "v", "EMAIL", "a@b.com", 0.95, False)],
        "column_ref string, value string, pii_type string, "
        "match_text string, rule_confidence double, validated boolean"
    ).distinct()
    plan = _physical(fuse_predictions(cands, decision_threshold=0.7))
    # the gate must read `_best` as a plain attribute above the distinct's
    # HashAggregate — pushed down, the full 11-type fusion tree (22 md5
    # calls) is re-evaluated per pre-distinct row.
    gate_line = next(line for line in plan.split("\n")
                     if "Filter" in line and "_pushdown_barrier" in line)
    assert "md5" not in gate_line
    assert plan.index("_pushdown_barrier") < plan.index("HashAggregate")
