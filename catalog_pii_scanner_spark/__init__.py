"""catalog_pii_scanner_spark — a PySpark-native PII discovery & tagging engine.

A from-scratch re-expression of the capabilities of the reference engine
``vivek-pr/catalog-pii-scanner`` (batch PII discovery over metadata catalogs:
connectors -> samplers -> regex/NER/embedding detection ensemble -> findings
store / tag write-back), designed Spark-first:

- catalog enumeration        -> a ``columns`` DataFrame        (sources/catalog.py)
- value sampling             -> distinct/limit DataFrame ops   (sources/sampler.py)
- regex rules + checksums    -> JVM-side column expressions    (operators/rules.py)
- redaction / contexts       -> column exprs + pandas UDFs     (operators/redaction.py)
- NER / embeddings           -> Arrow-batched pandas UDFs      (operators/ner.py, embeddings.py)
- ensemble fusion + Platt    -> pure column math               (operators/ensemble.py)
- eval (greedy span match)   -> range join + window dedup      (operators/evaluate.py)
- findings rollup & sinks    -> groupBy + parquet/JDBC         (operators/findings.py, sinks/)
- watcher mode               -> Structured Streaming           (streaming/watcher.py)

Plus the large-scale training-data-pipeline operators the reference lacks:
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity search
(brute-force + LSH-bucketed ANN), text analysis (lang-id, quality, tokens,
fingerprints), and multimodal binary-column plumbing.

Everything is DataFrame-expressible; no custom Catalyst rules are needed.
"""

__version__ = "0.1.0"
