"""spark-submit entry point: continuous incremental near-dup dedup.

Tails a document feed and maintains the persistent MinHash band index,
corpus table and links table (X40b/X41 — see
chomper_spark/streaming/dedup_stream.py for semantics and crash-point
determinism):

    cd /root/repo && zip -r /tmp/chomper_spark.zip chomper_spark
    spark-submit --py-files /tmp/chomper_spark.zip \
        --master <cluster> --num-executors <N> \
        jobs/dedup_stream_job.py \
        --feed-dir /data/doc_feed --index-root /data/band_index \
        --corpus-root /data/corpus --links-root /data/dup_links \
        --checkpoint /data/ckpt --lineage /data/dedup_lineage \
        --mode stream --n-buckets 4096

Modes:
  batch   — drain the feed dir once (availableNow) and exit
  stream  — continuous micro-batch tail (processingTime trigger)

Pair with jobs/maintain_job.py on a schedule against --index-root and
--corpus-root for compaction/GC — safe concurrently with this writer
under the round-5 commit CAS.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--feed-dir", required=True)
    ap.add_argument("--index-root", required=True)
    ap.add_argument("--corpus-root", required=True)
    ap.add_argument("--links-root", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--lineage", default=None)
    ap.add_argument("--mode", choices=["batch", "stream"], default="batch")
    ap.add_argument("--trigger", default="10 seconds")
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument("--n-buckets", type=int, default=256)
    ap.add_argument("--max-files-per-trigger", type=int, default=8)
    ap.add_argument("--index-bucket-cap", type=int, default=None)
    args = ap.parse_args(argv)

    from chomper_spark.functions import docdedup as dd
    from chomper_spark.session import get_spark
    from chomper_spark.streaming import StreamingNearDup

    spark = get_spark("dedup-stream-job")
    job = StreamingNearDup(
        spark,
        args.feed_dir,
        args.index_root,
        args.corpus_root,
        args.links_root,
        args.checkpoint,
        lineage_root=args.lineage,
        threshold=args.threshold,
        n_buckets=args.n_buckets,
        max_files_per_trigger=args.max_files_per_trigger,
        index_bucket_cap=(
            args.index_bucket_cap
            if args.index_bucket_cap is not None
            else dd.INDEX_BUCKET_CAP
        ),
    )
    if args.mode == "batch":
        job.run_available()
        links = job.read_links()
        print(json.dumps({"links": links.count() if links is not None else 0}))
    else:
        q = job.start(available_now=False, processing_time=args.trigger)
        q.awaitTermination()


if __name__ == "__main__":
    main()
