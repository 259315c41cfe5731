"""One-off sub-stage decomposition for the keep-list family.

Times each internal stage of the expensive CC-consuming queries with the
noop sink (guide 1.4) so the wall-clock can be attributed to drain /
pair-build / connected-components / verdict-join rather than guessed.

    python tools/stage_probe.py [phash|semdedup|streamdedup]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def probe_phash(spark) -> None:
    from pyspark.sql import functions as F

    from catalog_pii_scanner_spark.operators.dedup import \
        connected_components
    from catalog_pii_scanner_spark.operators.multimodal import (
        PHASH_HAM_MAX, PHASH_MAX_BUCKET, ahash_bands, phash_band_rows,
        synthetic_pgm_neardup_assets)
    from catalog_pii_scanner_spark.plans.cache import fan_out

    sc = spark.sparkContext
    sc.setJobDescription("phash: decode+aHash")
    t0 = time.time()
    hashes = ahash_bands(fan_out(
        synthetic_pgm_neardup_assets(spark, SF_DIR))) \
        .localCheckpoint(eager=True)
    t_hash = time.time() - t0
    bands = phash_band_rows(hashes).localCheckpoint(eager=True)

    sc.setJobDescription("phash: bucket-capped banded pairs")
    bcnt = bands.groupBy("band", "val").agg(F.count("*").alias("_bn"))
    bands_ok = bcnt.where(F.col("_bn") <= PHASH_MAX_BUCKET) \
        .select("band", "val")
    capped = bands.join(bands_ok, ["band", "val"])
    a, b_ = capped.alias("a"), capped.alias("b")
    pairs = (a.join(b_, (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.val") == F.col("b.val"))
                    & (F.col("a.asset_id") < F.col("b.asset_id")))
             .select(F.col("a.asset_id").alias("doc_a"),
                     F.col("b.asset_id").alias("doc_b"))
             .distinct())
    ha = hashes.select(F.col("asset_id").alias("doc_a"),
                       *[F.col(f"b{b}").alias(f"a{b}") for b in range(4)])
    hb = hashes.select(F.col("asset_id").alias("doc_b"),
                       *[F.col(f"b{b}").alias(f"c{b}") for b in range(4)])
    ham = sum(F.bit_count(F.expr(f"a{b} ^ c{b}")) for b in range(4))
    t0 = time.time()
    verified = (pairs.join(ha, "doc_a").join(hb, "doc_b")
                .where(ham.cast("bigint") <= PHASH_HAM_MAX)
                .select("doc_a", "doc_b")
                .localCheckpoint(eager=True))
    t_pairs = time.time() - t0
    n_edges = verified.count()

    sc.setJobDescription("phash: connected components")
    t0 = time.time()
    clusters = connected_components(verified)
    t_cc = time.time() - t0
    sc.setJobDescription("phash: verdict join")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id")
    out = docs.join(
        clusters.select(F.col("doc_id"), "cluster_rep"), "doc_id", "left")
    t_out = noop(out)
    print(f"phash: hash={t_hash:.2f}s pairs={t_pairs:.2f}s "
          f"(edges={n_edges}) cc={t_cc:.2f}s verdict={t_out:.2f}s")


def probe_semdedup(spark) -> None:
    from pyspark.sql import functions as F

    from catalog_pii_scanner_spark.operators.simsearch import (
        SEMDEDUP_CELLS, SEMDEDUP_MAX_CELL, SEMDEDUP_T, _semdedup_cells_cte)
    from catalog_pii_scanner_spark.operators.dedup import \
        connected_components

    sc = spark.sparkContext
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    emb.createOrReplaceTempView("cpss_embeddings")
    sc.setJobDescription("semdedup: cell assignment (exploded CTE)")
    t0 = time.time()
    assign = spark.sql(
        f"WITH {_semdedup_cells_cte('spark', 'cpss_embeddings', SEMDEDUP_CELLS).lstrip()} "
        f"SELECT vec_id, cid FROM assign").localCheckpoint(eager=True)
    t_assign = time.time() - t0
    cell_n = assign.groupBy("cid").agg(F.count("*").alias("cn"))
    assign_ok = (assign.join(cell_n.where(F.col("cn") <= SEMDEDUP_MAX_CELL)
                             .select("cid"), "cid"))
    pairs = (assign_ok.alias("a")
             .join(assign_ok.alias("b"),
                   (F.col("a.cid") == F.col("b.cid"))
                   & (F.col("a.vec_id") < F.col("b.vec_id")))
             .select(F.col("a.vec_id").alias("vec_a"),
                     F.col("b.vec_id").alias("vec_b")))
    dot = F.aggregate(
        F.zip_with("ea", "eb",
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)
    n2 = lambda c: F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)
    va = emb.select(F.col("vec_id").alias("vec_a"),
                    F.col("embedding").alias("ea"))
    vb = emb.select(F.col("vec_id").alias("vec_b"),
                    F.col("embedding").alias("eb"))
    sc.setJobDescription("semdedup: pair cosines")
    t0 = time.time()
    near = (pairs.join(va, "vec_a").join(vb, "vec_b")
            .withColumn("_na", F.sqrt(n2(F.col("ea"))))
            .withColumn("_nb", F.sqrt(n2(F.col("eb"))))
            .where((F.col("_na") > 0) & (F.col("_nb") > 0))
            .where(F.round(dot / (F.col("_na") * F.col("_nb")), 6)
                   >= SEMDEDUP_T)
            .select(F.col("vec_a").alias("doc_a"),
                    F.col("vec_b").alias("doc_b"))
            .localCheckpoint(eager=True))
    t_near = time.time() - t0
    n_edges = near.count()
    sc.setJobDescription("semdedup: connected components")
    t0 = time.time()
    clusters = connected_components(near)
    t_cc = time.time() - t0
    sc.setJobDescription("semdedup: verdict join")
    out = (emb.select("vec_id").distinct()
           .join(clusters.select(F.col("doc_id").alias("vec_id"),
                                 "cluster_rep"), "vec_id", "left"))
    t_out = noop(out)
    print(f"semdedup: assign={t_assign:.2f}s near={t_near:.2f}s "
          f"(edges={n_edges}) cc={t_cc:.2f}s verdict={t_out:.2f}s")


def probe_streamdedup(spark) -> None:
    # decompose: drain vs resolution, then resolution sub-stages
    from pyspark.sql import functions as F

    from catalog_pii_scanner_spark.operators.dedup import (
        MAX_BAND_BUCKET, _jaccard_verify, _signatures_from_shingles,
        band_keys, capped_band_pairs, doc_shingles_df, shingles_from_docs)

    sc = spark.sparkContext
    import tempfile

    import shutil
    path = f"{SF_DIR}/documents.parquet"
    schema = spark.read.parquet(path).schema
    band_dir = tempfile.mkdtemp(prefix="cpss_probe_bands_")
    ckpt = tempfile.mkdtemp(prefix="cpss_probe_ckpt_")
    from catalog_pii_scanner_spark.streaming.watcher import \
        _single_file_glob
    src = _single_file_glob(path) if os.path.isfile(path) else path
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 4).parquet(src))

    def _sink(bdf, batch_id: int) -> None:
        sigs = _signatures_from_shingles(shingles_from_docs(bdf))
        band_keys(sigs).write.mode("append").parquet(band_dir)

    sc.setJobDescription("streamdedup: drain")
    t0 = time.time()
    try:
        q = (stream.writeStream.foreachBatch(_sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        bands = spark.read.parquet(band_dir).localCheckpoint(eager=True)
        t_drain = time.time() - t0
    finally:
        shutil.rmtree(band_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)

    sc.setJobDescription("streamdedup: pairs + verify")
    t0 = time.time()
    pairs = capped_band_pairs(bands, MAX_BAND_BUCKET)
    cand_ids = (pairs.select(F.col("doc_a").alias("doc_id"))
                .union(pairs.select("doc_b")).distinct())
    shingles = (doc_shingles_df(spark, SF_DIR)
                .join(cand_ids, "doc_id", "left_semi")
                .localCheckpoint(eager=True))
    verified = _jaccard_verify(pairs, shingles, 0.5) \
        .localCheckpoint(eager=True)
    t_verify = time.time() - t0
    n_edges = verified.count()
    from catalog_pii_scanner_spark.operators.dedup import \
        connected_components
    sc.setJobDescription("streamdedup: connected components")
    t0 = time.time()
    clusters = connected_components(verified)
    t_cc = time.time() - t0
    docs = spark.read.parquet(path).select("doc_id")
    out = docs.join(clusters, "doc_id", "left")
    t_out = noop(out)
    print(f"streamdedup: drain={t_drain:.2f}s verify={t_verify:.2f}s "
          f"(edges={n_edges}) cc={t_cc:.2f}s verdict={t_out:.2f}s")


def main() -> int:
    from catalog_pii_scanner_spark.session import get_spark
    spark = get_spark("stage-probe")
    which = sys.argv[1:] or ["phash", "semdedup", "streamdedup"]
    for w in which:
        {"phash": probe_phash, "semdedup": probe_semdedup,
         "streamdedup": probe_streamdedup}[w](spark)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
