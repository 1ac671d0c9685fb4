"""Incremental corpus dedup — the continuously-ingesting shape.

A 100 TB corpus cannot re-hash itself for every arriving batch; the
index of seen content must persist and the arriving batch must be
classified against it in O(batch).  This example keeps the hash index
in the CDC engine itself (SnapshotMergeSink keyed on text_hash), so
index maintenance inherits the exactly-once ledger, replay safety,
snapshots/GC, and bucket-pruned reads for free.

Run:  python examples/incremental_dedup.py [index_dir]
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from chomper_spark.functions import docdedup as dd  # noqa: E402
from chomper_spark.operators.merge import SnapshotMergeSink  # noqa: E402
from chomper_spark.session import get_spark  # noqa: E402


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="dedup_idx_")
    spark = get_spark("incremental-dedup-example", master="local[8]",
                      shuffle_partitions=16)

    # the persistent hash index: a MERGE table keyed on text_hash.
    # update_only_nulls ⇒ a hash's canonical_doc_id is set by its FIRST
    # batch and never migrates to a later duplicate.
    index = SnapshotMergeSink(spark, root, n_buckets=64, key_cols=["text_hash"])

    def ingest(batch_id: int, rows: list[tuple[int, str]]) -> None:
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        # 1. classify the arriving batch against the index, reading only
        #    the index buckets the batch's hashes land in
        known = index.read_prune_for(docs.select(F.md5("text").alias("text_hash")))
        if known is None:
            # very first batch: the index table does not exist yet — an
            # empty index still classifies INTRA-batch repeats
            known = spark.createDataFrame(
                [], "text_hash string, canonical_doc_id long"
            )
        out = dd.incremental_exact_dedup(known, docs)
        n_dup = out.filter("is_duplicate").count()
        print(f"batch {batch_id}: {docs.count()} docs, {n_dup} duplicates")
        # 2. fold the batch's new hashes into the index (exactly-once:
        #    replaying this batch_id is a ledger-skipped no-op)
        index.apply_batch(
            dd.hash_index_events(docs, batch_seq=batch_id),
            batch_id=batch_id,
            update_only_nulls=True,
            collect_metrics=False,
        )

    ingest(0, [(1, "the quick brown fox"), (2, "hello world"), (3, "hello world")])
    ingest(1, [(10, "hello world"), (11, "something new entirely")])
    ingest(1, [(10, "hello world"), (11, "something new entirely")])  # replay: no-op

    print("index:", sorted(
        (r["text_hash"][:8], r["canonical_doc_id"])
        for r in index.read().collect()
    ))
    # periodic maintenance (see jobs/maintain_job.py for the scheduled form)
    print("gc:", index.expire_snapshots(keep_manifests=3))

    # ---- NEAR-dup variant (round 5): same engine shape, but the
    # persistent index holds MinHash LSH bands, keyed on
    # (band_idx, band_val, doc_id) and BUCKETED on the band prefix so a
    # batch probes only its own buckets.  Classification = batch
    # signatures → band-join → exact-Jaccard verify on candidates only.
    nroot = tempfile.mkdtemp(prefix="dedup_bidx_")
    bidx = SnapshotMergeSink(
        spark, nroot, n_buckets=64,
        key_cols=["band_idx", "band_val", "doc_id"],
        bucket_cols=["band_idx", "band_val"],
    )
    corpus = spark.createDataFrame(
        [(100, " ".join(f"tok{i}" for i in range(30)))], "doc_id long, text string"
    )
    bidx.apply_batch(dd.band_index_events(corpus, 0), 0, collect_metrics=False)
    batch = spark.createDataFrame(
        [(200, " ".join(f"tok{i}" for i in range(30)) + " extra"),
         (201, "unrelated words only here")],
        "doc_id long, text string",
    )
    probe = dd.minhash_bands(batch).select("band_idx", "band_val")
    idx_rows = bidx.read_prune_for(probe).select("band_idx", "band_val", "doc_id")
    links = dd.incremental_neardup(idx_rows, batch, corpus).collect()
    print("near-dup links:", [(r["doc_id"], r["dup_of"], round(r["jaccard"], 3))
                              for r in links])
    # fold the batch's bands into the index for the next arrival
    bidx.apply_batch(dd.band_index_events(batch, 1), 1, collect_metrics=False)
    spark.stop()


if __name__ == "__main__":
    main()
