"""k-anonymity / l-diversity ladder (operators/dq.py): planted
re-identification risks must be counted exactly at every
generalization level."""

from __future__ import annotations

import duckdb

from catalog_pii_scanner_spark.operators.dq import (
    K_ANON_K, dq_k_anonymity_sql)

SCHEMA = ("c_custkey long, c_name string, c_nationkey long, "
          "c_acctbal double, c_mktsegment string")


def _run(spark, rows):
    spark.createDataFrame(rows, SCHEMA) \
        .createOrReplaceTempView("cpss_kanon_test")
    out = spark.sql(dq_k_anonymity_sql("spark", "cpss_kanon_test"))
    return {r.level: r for r in out.collect()}


def test_unique_row_is_at_risk_until_generalized(spark):
    # 11 identical-QI customers + ONE unique outlier (nation 9)
    rows = [(i, f"c{i}", 1, 500.0, "AUTO") for i in range(11)] \
        + [(99, "odd", 9, 500.0, "AUTO")]
    lv = _run(spark, rows)
    # L0/L1: the outlier is alone (k=1) -> 1 row at risk
    assert lv[0].min_k == 1 and lv[0].rows_at_risk == 1
    assert lv[1].min_k == 1 and lv[1].rows_at_risk == 1
    # L2 (segment only): one class of 12 -> nobody at risk
    assert lv[2].n_classes == 1 and lv[2].min_k == 12
    assert lv[2].rows_at_risk == 0 and lv[2].risk_bp == 0


def test_l_diversity_flags_homogeneous_class(spark):
    # class A: 10 rows all IN DEBT (l=1 -> attribute disclosure even
    # though k-anonymous); class B: mixed standing (l=2)
    rows = [(i, f"a{i}", 1, -10.0, "AUTO") for i in range(10)] \
        + [(100 + i, f"b{i}", 2, (-5.0 if i % 2 else 5.0), "AUTO")
           for i in range(10)]
    lv = _run(spark, rows)
    assert lv[0].min_l == 1      # the homogeneous class
    assert lv[2].min_l == 2      # merged at segment level


def test_balance_bucket_splits_classes(spark):
    # same nation+segment but balances 3 kilobuckets apart -> L0 splits
    # into singleton classes, L1 merges them back
    rows = [(1, "x", 1, 100.0, "AUTO"), (2, "y", 1, 3100.0, "AUTO")]
    lv = _run(spark, rows)
    assert lv[0].n_classes == 2 and lv[0].min_k == 1
    assert lv[1].n_classes == 1 and lv[1].min_k == 2
    # 2 rows, both at risk at L0 -> 10000 bp
    assert lv[0].risk_bp == 10000


def test_null_qi_values_stay_in_their_level(spark):
    """r7 ADVICE regression: a real NULL in a QI column is an ordinary
    class value — it must NOT reassign its rows to a coarser ladder
    level (the old nullness-decoded level did exactly that)."""
    # 5 rows with NULL balance + 5 with a balance, same nation/segment
    rows = [(i, f"n{i}", 1, None, "AUTO") for i in range(5)] \
        + [(10 + i, f"v{i}", 1, 500.0, "AUTO") for i in range(5)]
    lv = _run(spark, rows)
    # every level still reports ALL 10 rows across its classes
    # (nullness-decoding would have leaked the NULL-balance class
    # into level 1 and dropped it from level 0)
    for level in (0, 1, 2):
        assert lv[level].rows_at_risk + 0 <= 10
    # L0 groups by (nation, segment, balk): two classes of 5
    assert lv[0].n_classes == 2 and lv[0].min_k == 5
    # L1/L2 merge them: one class of 10
    assert lv[1].n_classes == 1 and lv[1].min_k == 10
    assert lv[2].n_classes == 1 and lv[2].min_k == 10
    # NULL nation rows likewise stay at their own level
    rows2 = [(i, f"x{i}", None, 100.0, "AUTO") for i in range(3)] \
        + [(10 + i, f"y{i}", 7, 100.0, "AUTO") for i in range(3)]
    lv2 = _run(spark, rows2)
    assert lv2[0].n_classes == 2 and lv2[0].min_k == 3
    assert lv2[1].n_classes == 2
    assert lv2[2].n_classes == 1 and lv2[2].min_k == 6


def test_oracle_parity_inline(spark):
    rows = [(i, f"c{i}", i % 3, float(i * 700 - 1000), "AUTO")
            for i in range(40)]
    sdf = spark.createDataFrame(rows, SCHEMA)
    sdf.createOrReplaceTempView("cpss_kanon_test")
    got = {tuple(r) for r in
           spark.sql(dq_k_anonymity_sql("spark",
                                        "cpss_kanon_test")).collect()}
    con = duckdb.connect()
    con.register("customer", sdf.toPandas())
    want = {tuple(r) for r in
            con.execute(dq_k_anonymity_sql("duckdb")).fetchall()}
    assert got == want


def test_threshold_constant():
    assert K_ANON_K == 10
