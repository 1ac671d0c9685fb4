"""chomper_spark — a PySpark-native CDC / incremental-ingest engine.

A brand-new, idiomatic-Spark engine with the capabilities of the
reference ETL micro-framework (anilktechie/chomper): ingest a feed of
records, transform/filter/reshape them declaratively, and idempotently
upsert them into a table keyed on identifier columns, firing
change-audit hooks (reference: chomper/importers.py:25-89,
chomper/contrib/postgres.py:295-393) — rebuilt as set-oriented,
partition-parallel Spark:

- ``sources``    — change-feed + file feeders (reference feeders S1-S12)
- ``operators``  — transforms (P1-P14), dedup, MERGE apply (E1-E11),
                   schema evolution, lineage metrics
- ``functions``  — text analysis, dedup (minhash/simhash), similarity,
                   multimodal plumbing for training-data pipelines
- ``streaming``  — Structured Streaming foreachBatch driver
- ``plans``      — declarative pipeline composition (Importer analogue)
- ``oracle``     — single-threaded pandas reference applier
"""

__version__ = "0.1.0"
