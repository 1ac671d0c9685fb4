"""Nested-field + audit example — the reference's examples/fields.py
pattern (per-path Filter transforms over nested items,
/root/reference/examples/fields.py:30-41) plus the E9/E6 sink options
(.timestamps() audit columns, change-row listeners,
/root/reference/chomper/contrib/sql/exporters.py:110-145,304-333)
rebuilt Spark-first.

Run:  python examples/fields_pipeline.py
"""

from __future__ import annotations

import datetime as dt
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from chomper_spark.operators import fields as fp  # noqa: E402
from chomper_spark.operators import transforms as tx  # noqa: E402
from chomper_spark.operators.merge import SnapshotMergeSink  # noqa: E402
from chomper_spark.session import get_spark  # noqa: E402
from chomper_spark.sources.feeders import list_feeder  # noqa: E402


def main() -> None:
    spark = get_spark("fields-example", master="local[4]", shuffle_partitions=4)

    # the reference's nested people items (examples/fields.py data)
    people = list_feeder(
        spark,
        [
            {
                "name": "Frank",
                "age": 37,
                "job": {"title": "dev", "company": {"name": "Good Corp"}},
                "friends": [{"name": "Steve"}, {"name": "Kate"}],
            },
            {
                "name": "Ada",
                "age": 41,
                "job": {"title": None, "company": {"name": "Typey"}},
                "friends": [{"name": "Grace"}],
            },
        ],
        schema=(
            "name string, age int, "
            "job struct<title:string, company:struct<name:string>>, "
            "friends array<struct<name:string>>"
        ),
    )

    # per-path transforms: Item.job.company.name.filter(...),
    # Item.friends[0].name.filter(...) — as one Catalyst plan
    shaped = tx.pipe(
        people,
        fp.scalar_map_path("name", lambda c: F.concat(c, F.lit(" Winger"))),
        fp.scalar_map_path("age", lambda c: c * 2),
        fp.scalar_map_path(
            "job.company.name", lambda c: F.replace(c, F.lit("Good "), F.lit(""))
        ),
        fp.scalar_map_path("friends[0].name", lambda c: F.concat(c, F.lit(" Edison"))),
        fp.nested_defaults("job", {"title": "unknown"}),
        fp.rename_keys("job.company", {"name": "company_name"}),
    )
    shaped.show(truncate=False)

    # upsert into an audited table: created_at/updated_at from batch
    # time, per-field change rows for downstream consumers
    sink = SnapshotMergeSink(
        spark,
        tempfile.mkdtemp(prefix="fields_demo_"),
        n_buckets=4,
        key_cols=["name"],
        audit_timestamps=True,
    )
    feed = shaped.select(
        F.lit("I").alias("op"),
        F.to_timestamp(F.lit("2026-02-01 00:00:00")).alias("op_ts"),
        F.monotonically_increasing_id().alias("batch_seq"),
        "name",
        "age",
        F.col("job.title").alias("title"),
        F.col("job.company.company_name").alias("company"),
    )
    sink.apply_batch(feed, batch_id=0, batch_time=dt.datetime(2026, 2, 1),
                     listen_fields=("age",), emit_change_rows=True)
    upd = feed.withColumn("op", F.lit("U")).withColumn(
        "age", F.col("age") + 1
    ).withColumn("op_ts", F.to_timestamp(F.lit("2026-02-02 00:00:00")))
    sink.apply_batch(upd, batch_id=1, batch_time=dt.datetime(2026, 2, 2),
                     listen_fields=("age",), emit_change_rows=True)

    print("table (with audit columns):")
    sink.read().orderBy("name").show(truncate=False)
    print("change-audit rows:")
    sink.read_changes().orderBy("name", "batch_id").show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
