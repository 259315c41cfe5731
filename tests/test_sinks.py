"""Findings store round-trip + export schema (reference tests/test_store.py)
and write-back idempotency (reference tests/test_hms_fake.py:120-140)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from catalog_pii_scanner_spark.sinks.findings_store import (
    export_csv, export_json, read_latest_findings, to_findings_records,
    write_findings)
from catalog_pii_scanner_spark.sinks.writeback import (FakeCatalogClient,
                                                       apply_writeback)

PER_TYPE_ROWS = [
    ("parquet://testdata/users/email_addr", "EMAIL", 10, 10, 0.92, 1.0),
    ("parquet://testdata/users/email_addr", "PHONE_NUMBER", 2, 2, 0.61, 0.2),
    ("parquet://testdata/users/notes", "SSN", 5, 4, 0.87, 0.5),
]
SCHEMA = ("column_ref string, pii_type string, n_candidates bigint, "
          "n_values_hit bigint, confidence double, hit_rate double")


@pytest.fixture(scope="module")
def findings(spark):
    return to_findings_records(spark.createDataFrame(PER_TYPE_ROWS, SCHEMA))


def test_findings_record_shape(findings):
    rows = {r.column_ref: r for r in findings.collect()}
    assert rows["parquet://testdata/users/email_addr"].types == \
        ["EMAIL", "PHONE_NUMBER"]
    assert rows["parquet://testdata/users/email_addr"].confidence == \
        pytest.approx(0.92)
    cols = set(findings.columns)
    assert cols == {"column_ref", "types", "confidence", "hit_rate",
                    "model_version", "scanned_at", "source"}


def test_store_roundtrip_upsert(spark, findings, tmp_path_factory):
    store = str(tmp_path_factory.mktemp("store") / "findings")
    write_findings(findings, store)
    write_findings(findings, store)  # second scan run appends
    latest = read_latest_findings(spark, store)
    # upsert-on-read: one row per column_ref despite two appends
    assert latest.count() == 2
    assert latest.groupBy("column_ref").count() \
        .where(F.col("count") > 1).count() == 0


def test_export_json_csv(spark, findings, tmp_path_factory):
    out = tmp_path_factory.mktemp("export")
    export_json(findings, str(out / "j"))
    export_csv(findings, str(out / "c"))
    jrows = [json.loads(line) for p in (out / "j").glob("part-*")
             for line in open(p) if line.strip()]
    assert len(jrows) == 2
    assert set(jrows[0]) == {"column_ref", "types", "confidence",
                             "hit_rate", "model_version", "scanned_at",
                             "source"}
    csv_text = "".join(open(p).read()
                       for p in (out / "c").glob("part-*.csv"))
    assert "EMAIL,PHONE_NUMBER" in csv_text  # list -> comma-joined


def test_parse_since():
    from catalog_pii_scanner_spark.sinks.findings_store import parse_since
    assert parse_since("24h") == 24.0
    assert parse_since("7d") == 168.0
    assert parse_since("1.5") == 1.5


def test_recently_scanned_refs_window(spark, tmp_path_factory):
    from catalog_pii_scanner_spark.sinks.findings_store import (
        recently_scanned_refs)
    store = str(tmp_path_factory.mktemp("inc") / "findings")
    rows = [
        ("spark://users/email", ["EMAIL"], 0.9, 1.0, "m1",
         "2026-01-02 00:00:00", "scan"),
        ("spark://users/phone", ["PHONE_NUMBER"], 0.8, 1.0, "m1",
         "2026-01-01 00:00:00", "scan"),
    ]
    df = spark.createDataFrame(
        rows,
        "column_ref string, types array<string>, confidence double, "
        "hit_rate double, model_version string, scanned_at string, "
        "source string",
    ).withColumn("scanned_at", F.to_timestamp("scanned_at"))
    write_findings(df, store)
    now = "2026-01-02 12:00:00"
    # 24h lookback at that clock covers only the newer finding
    assert recently_scanned_refs(spark, store, 24.0, now=now) \
        == {"spark://users/email"}
    # 72h covers both; 1h covers none
    assert recently_scanned_refs(spark, store, 72.0, now=now) \
        == {"spark://users/email", "spark://users/phone"}
    assert recently_scanned_refs(spark, store, 1.0, now=now) == frozenset()
    # missing store -> empty skip set, not an error
    assert recently_scanned_refs(spark, "/nonexistent/store", 24.0) \
        == frozenset()


def test_cli_scan_since_prunes_scanned_columns(spark, tmp_path_factory,
                                               capsys, monkeypatch):
    """End-to-end incremental flow: a full scan populates the store, an
    immediate --since rescan prunes every previously-scanned column at
    plan construction and emits []."""
    import catalog_pii_scanner_spark.cli as cli
    store = str(tmp_path_factory.mktemp("inc2") / "findings")
    monkeypatch.setattr(cli, "_spark", lambda app: spark)
    args = ["scan", "--sf-dir", "/root/testdata/sf0.001",
            "--tables", "orders", "--store", store]
    assert cli.main(args) == 0
    first = json.loads(capsys.readouterr().out)
    assert [f["column_ref"] for f in first] == ["spark://orders/o_orderdate"]
    assert cli.main(args + ["--since", "24h"]) == 0
    captured = capsys.readouterr()
    # the scanned column is pruned; the other 5 re-scan but find nothing
    assert json.loads(captured.out) == []
    assert '"skipped_columns": 1' in captured.err


def test_ref_decomposition_unified_across_sink_and_plan(spark):
    """r12 ADVICE: desired_tags parsed 3-segment refs while the engine's
    melt refs are 2-segment (spark://table/column) — a 2-segment ref
    landed as schema=<table>, table=<column>, column=NULL, so the apply
    loop would tag the wrong object. One shared ref_parts helper now
    handles both arities, and the diff plan's table_name/column_name
    must equal the sink's parse on the SAME refs."""
    from catalog_pii_scanner_spark.sinks.writeback import (desired_tags,
                                                           ref_parts)
    refs = spark.createDataFrame(
        [("spark://orders/o_comment", ["EMAIL"]),
         ("parquet://testdata/users/email_addr", ["EMAIL"])],
        "column_ref string, types array<string>")
    tags = {r.column_ref: r for r in refs.select(
        "column_ref", *ref_parts()).collect()}
    two, three = (tags["spark://orders/o_comment"],
                  tags["parquet://testdata/users/email_addr"])
    assert (two.schema, two.table, two.column) == \
        (None, "orders", "o_comment")
    assert (three.schema, three.table, three.column) == \
        ("testdata", "users", "email_addr")
    # the sink's desired_tags applies the same decomposition
    dt = {(r.schema, r.table, r.column)
          for r in desired_tags(refs).collect()}
    assert dt == {(None, "orders", "o_comment"),
                  ("testdata", "users", "email_addr")}
    # and the diff plan's table_name/column_name match the sink's parse
    from catalog_pii_scanner_spark.operators.incremental import \
        writeback_diff_plan
    vals = spark.createDataFrame(
        [("spark://orders/o_comment", "reach me at a@b.io")],
        "column_ref string, value string")
    plan = writeback_diff_plan(vals).collect()
    assert [(r.table_name, r.column_name) for r in plan] == \
        [("orders", "o_comment")]


def test_apply_writeback_sql_two_segment_ref(spark):
    """A 2-segment melt ref addresses the bare table in the session
    catalog (current database) — never the broken 'None.<t>' ident."""
    from catalog_pii_scanner_spark.sinks.writeback import \
        apply_writeback_sql
    spark.sql("CREATE TABLE IF NOT EXISTS cpss_wb2seg (notes STRING) "
              "USING parquet")
    try:
        findings = to_findings_records(spark.createDataFrame(
            [("spark://cpss_wb2seg/notes", "EMAIL", 1, 1, 0.9, 0.5)],
            SCHEMA))
        assert apply_writeback_sql(spark, findings) == \
            {"applied": 1, "skipped": 0}
        # idempotent re-run, same bare-table addressing
        assert apply_writeback_sql(spark, findings) == \
            {"applied": 0, "skipped": 1}
        props = {r.key: r.value for r in spark.sql(
            "SHOW TBLPROPERTIES cpss_wb2seg").collect()}
        assert props["cps.pii.col.notes"] == "true"
    finally:
        spark.sql("DROP TABLE IF EXISTS cpss_wb2seg")


def test_writeback_idempotent(findings):
    client = FakeCatalogClient()
    first = apply_writeback(findings, client)
    assert first == {"applied": 2, "skipped": 0}
    calls_after_first = client.api_calls
    second = apply_writeback(findings, client)
    assert second == {"applied": 0, "skipped": 2}
    assert client.api_calls == calls_after_first  # no duplicate mutation
    props, comment = client.get_column("testdata", "users", "email_addr")
    assert props["cps.pii"] == "true"
    assert props["cps.pii.types"] == "EMAIL,PHONE_NUMBER"
    assert comment == "PII:EMAIL,PHONE_NUMBER"


def _mk_findings(spark, rows):
    return to_findings_records(spark.createDataFrame(rows, SCHEMA))


def test_merge_findings_updates_never_duplicates(spark, tmp_path_factory):
    from catalog_pii_scanner_spark.sinks.findings_store import (
        merge_findings, read_merged_findings)
    store = str(tmp_path_factory.mktemp("merge") / "findings")
    base = [(f"parquet://testdata/t/c{i}", "EMAIL", 5, 5, 0.5, 0.5)
            for i in range(40)]
    merge_findings(spark, _mk_findings(spark, base), store)
    first = read_merged_findings(spark, store)
    assert first.count() == 40

    # re-scan updates ONE column with a new confidence + adds one column
    update = [("parquet://testdata/t/c7", "EMAIL", 9, 9, 0.99, 1.0),
              ("parquet://testdata/t/brand_new", "SSN", 1, 1, 0.7, 0.1)]
    merge_findings(spark, _mk_findings(spark, update), store)
    merged = read_merged_findings(spark, store)
    assert merged.count() == 41  # updated, never duplicated
    assert merged.groupBy("column_ref").count() \
        .where(F.col("count") > 1).count() == 0
    got = merged.where(
        F.col("column_ref") == "parquet://testdata/t/c7").collect()[0]
    assert got.confidence == 0.99


def test_merge_findings_rewrites_only_touched_buckets(
        spark, tmp_path_factory):
    """The MERGE layout's point: an upsert must not rewrite buckets whose
    keys did not change (bounded rewrite cost at store scale)."""
    import os
    from catalog_pii_scanner_spark.sinks.findings_store import (
        merge_findings)
    store = str(tmp_path_factory.mktemp("merge2") / "findings")
    base = [(f"parquet://testdata/t/c{i}", "EMAIL", 5, 5, 0.5, 0.5)
            for i in range(40)]
    merge_findings(spark, _mk_findings(spark, base), store)
    mtimes = {
        d: max(os.path.getmtime(os.path.join(store, d, f))
               for f in os.listdir(os.path.join(store, d))
               if f.endswith(".parquet"))
        for d in os.listdir(store) if d.startswith("key_bucket=")
    }
    assert len(mtimes) > 2  # keys spread over several buckets
    merge_findings(spark, _mk_findings(
        spark, [("parquet://testdata/t/c7", "EMAIL", 9, 9, 0.99, 1.0)]),
        store)
    untouched = [
        d for d in mtimes
        if max(os.path.getmtime(os.path.join(store, d, f))
               for f in os.listdir(os.path.join(store, d))
               if f.endswith(".parquet")) == mtimes[d]
    ]
    # exactly one bucket holds c7; every other bucket's files are intact
    assert len(untouched) >= len(mtimes) - 1


def test_jdbc_roundtrip_and_merge(spark, findings, tmp_path_factory):
    """Real JDBC against embedded Derby (the driver Spark ships):
    write -> read back intact; merge is an idempotent keyed upsert."""
    from catalog_pii_scanner_spark.sinks.findings_store import (
        merge_findings_jdbc, read_findings_jdbc, write_findings_jdbc)
    db = str(tmp_path_factory.mktemp("derby") / "findingsdb")
    url = f"jdbc:derby:{db};create=true"
    write_findings_jdbc(findings, url, "findings")
    back = read_findings_jdbc(spark, url, "findings")
    assert back.count() == 2
    assert {tuple(r.types) for r in back.collect()} == \
        {("EMAIL", "PHONE_NUMBER"), ("SSN",)}

    # MERGE: same keys re-scanned -> updated, never duplicated
    merge_findings_jdbc(spark, findings, url, "findings")
    merge_findings_jdbc(spark, findings, url, "findings")
    merged = read_findings_jdbc(spark, url, "findings")
    assert merged.count() == 2
    assert merged.groupBy("column_ref", "model_version").count() \
        .where(F.col("count") > 1).count() == 0


def test_column_fingerprint_sidecar_roundtrip(spark, tmp_path_factory):
    from catalog_pii_scanner_spark.operators.incremental import (
        column_fingerprints)
    from catalog_pii_scanner_spark.sinks.findings_store import (
        changed_column_refs, read_column_fingerprints,
        write_column_fingerprints)
    store = str(tmp_path_factory.mktemp("fps") / "findings")
    vals = spark.createDataFrame(
        [("spark://t/a", f"v{i}") for i in range(20)]
        + [("spark://t/b", f"w{i}") for i in range(10)]
        + [("spark://t/b", None)],   # NULLs excluded from the basis
        "column_ref string, value string")
    fps = column_fingerprints(vals)
    # no sidecar yet -> None (full scan)
    assert changed_column_refs(spark, store, fps) is None
    write_column_fingerprints(fps, store)
    stored = read_column_fingerprints(spark, store)
    assert {r.column_ref: r.n_values for r in stored.collect()} \
        == {"spark://t/a": 20, "spark://t/b": 10}
    # identical content -> nothing changed
    assert changed_column_refs(spark, store, fps) == frozenset()
    # duplicate rows do NOT change the distinct-basis fingerprint
    dup = vals.unionByName(vals.limit(5))
    assert changed_column_refs(
        spark, store, column_fingerprints(dup)) == frozenset()
    # a genuinely new value in one column -> only that column rescans
    vals2 = vals.unionByName(spark.createDataFrame(
        [("spark://t/a", "BRAND-NEW")], "column_ref string, value string"))
    assert changed_column_refs(
        spark, store, column_fingerprints(vals2)) \
        == {"spark://t/a"}
    # a column the store never saw -> rescans
    vals3 = vals.unionByName(spark.createDataFrame(
        [("spark://t/c", "x")], "column_ref string, value string"))
    assert changed_column_refs(
        spark, store, column_fingerprints(vals3)) \
        == {"spark://t/c"}
    # SCOPED merge keeps out-of-scope refs (r11 ADVICE fix)...
    only_b = vals.where("column_ref = 'spark://t/b'")
    write_column_fingerprints(column_fingerprints(only_b), store)
    assert {r.column_ref for r in
            read_column_fingerprints(spark, store).collect()} \
        == {"spark://t/a", "spark://t/b"}
    # ...but a FULL-scope compaction evicts refs the catalog no longer
    # carries (r12 ADVICE: the default retention keeps dropped/renamed
    # columns' rows forever, and a recreated same-ref column with
    # matching content would be pruned by its stale row)
    write_column_fingerprints(column_fingerprints(only_b), store,
                              evict_missing=True)
    assert {r.column_ref for r in
            read_column_fingerprints(spark, store).collect()} \
        == {"spark://t/b"}


def test_cli_scan_incremental_prunes_unchanged_columns(
        spark, tmp_path_factory, capsys, monkeypatch):
    """End-to-end content-based incremental flow: the first
    --incremental scan fingerprints everything and scans in full; an
    immediate rerun on unchanged data prunes EVERY column (the --since
    path can only prune columns that produced findings; the
    fingerprint path proves absence-of-change for the finding-less
    ones too) and refreshes the sidecar."""
    import os

    import catalog_pii_scanner_spark.cli as cli
    from catalog_pii_scanner_spark.sinks.findings_store import FP_SUBDIR
    store = str(tmp_path_factory.mktemp("inc3") / "findings")
    monkeypatch.setattr(cli, "_spark", lambda app: spark)
    args = ["scan", "--sf-dir", "/root/testdata/sf0.001",
            "--tables", "orders", "--merge-store", store,
            "--incremental"]
    assert cli.main(args) == 0
    captured = capsys.readouterr()
    first = json.loads(captured.out)
    assert [f["column_ref"] for f in first] \
        == ["spark://orders/o_orderdate"]
    assert '"first_run": true' in captured.err
    assert os.path.isdir(os.path.join(store, FP_SUBDIR))
    # unchanged data -> all 6 orders columns pruned, sidecar refreshed
    before = os.stat(os.path.join(store, FP_SUBDIR)).st_mtime
    assert cli.main(args) == 0
    captured = capsys.readouterr()
    assert json.loads(captured.out) == []
    assert '"skipped_columns": 6' in captured.err
    assert os.stat(os.path.join(store, FP_SUBDIR)).st_mtime >= before


def test_cli_incremental_column_glob_fingerprints_only_in_scope(
        spark, tmp_path_factory, capsys, monkeypatch):
    """Round-11 ADVICE (high): a --target COLUMN glob must gate the
    fingerprint basis, not just the scanned values — otherwise columns
    the glob excluded are persisted as freshly scanned without ever
    being scanned, and later --incremental runs prune their PII
    forever. After a scoped first run, the sidecar must hold ONLY the
    in-scope column, and a following full run must rescan (not carry)
    every out-of-scope column."""
    import catalog_pii_scanner_spark.cli as cli
    from catalog_pii_scanner_spark.sinks.findings_store import (
        read_column_fingerprints)
    store = str(tmp_path_factory.mktemp("inc4") / "findings")
    monkeypatch.setattr(cli, "_spark", lambda app: spark)
    # scoped run: one column of orders
    assert cli.main(["scan", "--sf-dir", "/root/testdata/sf0.001",
                     "--target", "spark://orders/o_orderdate",
                     "--merge-store", store, "--incremental"]) == 0
    capsys.readouterr()
    fps = read_column_fingerprints(spark, store)
    assert {r.column_ref for r in fps.collect()} \
        == {"spark://orders/o_orderdate"}
    # full run over orders: the 5 out-of-scope columns have NO stored
    # fingerprint, so they must enter the scan (only 1 column pruned)
    assert cli.main(["scan", "--sf-dir", "/root/testdata/sf0.001",
                     "--tables", "orders", "--merge-store", store,
                     "--incremental"]) == 0
    captured = capsys.readouterr()
    assert '"skipped_columns": 1' in captured.err
    fps = read_column_fingerprints(spark, store)
    assert fps.count() == 6  # now the whole table is fingerprinted


def test_cli_incremental_scoped_run_keeps_out_of_scope_fingerprints(
        spark, tmp_path_factory, capsys, monkeypatch):
    """Round-11 ADVICE (sidecar merge-upsert): a scoped --incremental
    run must not drop stored fingerprints for out-of-scope columns —
    alternating scoped runs would otherwise thrash each other into
    full rescans."""
    import catalog_pii_scanner_spark.cli as cli
    from catalog_pii_scanner_spark.sinks.findings_store import (
        read_column_fingerprints)
    store = str(tmp_path_factory.mktemp("inc5") / "findings")
    monkeypatch.setattr(cli, "_spark", lambda app: spark)
    full = ["scan", "--sf-dir", "/root/testdata/sf0.001",
            "--tables", "orders", "--merge-store", store,
            "--incremental"]
    assert cli.main(full) == 0
    capsys.readouterr()
    assert read_column_fingerprints(spark, store).count() == 6
    # scoped run on ONE column: unchanged -> pruned, and the sidecar
    # must still hold all 6 fingerprints afterwards
    assert cli.main(["scan", "--sf-dir", "/root/testdata/sf0.001",
                     "--target", "spark://orders/o_orderdate",
                     "--merge-store", store, "--incremental"]) == 0
    captured = capsys.readouterr()
    assert '"skipped_columns": 1' in captured.err
    assert read_column_fingerprints(spark, store).count() == 6
    # full rerun: every column still pruned (no thrash-induced rescan)
    assert cli.main(full) == 0
    captured = capsys.readouterr()
    assert '"skipped_columns": 6' in captured.err


def test_diff_plan_oracle_mirrors_ref_parts():
    """r13 review: the Spark plan parses refs arity-aware via
    ref_parts, so the DuckDB oracle's decomposition must be arity-aware
    too or the dual dialects drift on 3-segment enumeration refs. Pin
    the oracle's CASE against both arities."""
    import duckdb
    from catalog_pii_scanner_spark.operators.incremental import \
        writeback_diff_plan_oracle_sql
    sql = writeback_diff_plan_oracle_sql(("orders",))
    # lift the decomposition expressions straight out of the template
    assert "len(parts) >= 3" in sql
    rows = duckdb.sql("""
        SELECT CASE WHEN len(parts) >= 3 THEN parts[2] ELSE parts[1] END
                 AS table_name,
               CASE WHEN len(parts) >= 3 THEN parts[3] ELSE parts[2] END
                 AS column_name
        FROM (SELECT str_split(regexp_replace(ref, '^[a-z]+://', ''),
                               '/') AS parts
              FROM (VALUES ('spark://orders/o_comment'),
                           ('parquet://testdata/users/email_addr'))
                   t(ref))
        ORDER BY table_name""").fetchall()
    assert rows == [("orders", "o_comment"), ("users", "email_addr")]


def test_basis_values_df_exactly_one(spark):
    """r13 review: neither param crashed opaquely inside
    _distinct_basis; both silently discarded values_df."""
    from catalog_pii_scanner_spark.operators.incremental import (
        distinct_basis, findings_merge_upsert, incremental_findings,
        writeback_diff_plan)
    vals = spark.createDataFrame(
        [("spark://orders/o_comment", "reach me at a@b.io")],
        "column_ref string, value string")
    basis = distinct_basis(vals)
    for fn in (incremental_findings, findings_merge_upsert,
               writeback_diff_plan):
        with pytest.raises(ValueError, match="exactly one"):
            fn()
        with pytest.raises(ValueError, match="exactly one"):
            fn(vals, basis=basis)
        assert fn(basis=basis).count() >= 1
