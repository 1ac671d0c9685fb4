"""File / table feeders — Spark-native analogues of the reference feeders.

Reference inventory (SURVEY.md §2.1):
  S2 ListFeeder   (chomper/feeders.py:47-60)   → list_feeder
  S3 CsvFeeder    (chomper/feeders.py:63-88)   → csv_feeder
  S4 JsonFeeder   (chomper/feeders.py:91-115)  → json_feeder
  S5 JsonLines    (chomper/feeders.py:118-134) → jsonlines_feeder
  S6 TableFeeder  (chomper/contrib/sql/feeders.py:17-41) → table_feeder
  S7 QueryFeeder  (chomper/contrib/sql/feeders.py:44-57) → query_feeder

Scheme dispatch (S1/S12, chomper/readers.py:16-49) is Spark's Hadoop FS
layer (file:// s3a:// hdfs:// work in any path).  The reference's
per-row arity check raising ItemNotImportable (chomper/feeders.py:82-88)
maps to Spark's PERMISSIVE/DROPMALFORMED corrupt-record policy — bad
rows are quarantined, not fatal, matching importers.py:103-105.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def list_feeder(
    spark: SparkSession, items: Iterable[dict], schema: T.StructType | str | None = None
) -> DataFrame:
    """In-memory rows → DataFrame (S2)."""
    items = list(items)
    if schema is None:
        return spark.createDataFrame(items)
    return spark.createDataFrame(items, schema=schema)


def csv_feeder(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    schema: T.StructType | str | None = None,
    skip: int = 0,
    delimiter: str = ",",
    quotechar: str = '"',
    drop_malformed: bool = True,
    header: bool = False,
) -> DataFrame:
    """CSV with user-supplied columns, skip-N header, delimiter/quote opts (S3).

    The reference zips user ``columns`` with values and raises on arity
    mismatch (chomper/feeders.py:63-88); here malformed rows are dropped
    (DROPMALFORMED) or kept with nulls (PERMISSIVE).

    Limitation of the ``skip>0`` path: lines come from a raw newline
    split, so quoted embedded newlines are NOT supported there (use
    skip=0, which goes through the real CSV scan, when fields may
    contain newlines).
    """
    if skip:
        # Spark's CSV scan has no skip-N-lines option; do it per FILE:
        # wholetext (one row per file) → slice off the first N lines →
        # from_csv.  Right for header-junk ingest files (the reference's
        # use case); for huge splittable CSVs use skip=0.
        declared_order: list[str] | None = None
        from pyspark.sql import functions as F

        if header:
            # from_csv never sees a header option — fold the header line
            # into the skipped prefix instead of parsing it as data.
            # Values then map POSITIONALLY, so first validate the file's
            # actual header against the declared field order and reorder
            # to the file's order when the names merely differ in order —
            # silent positional mis-assignment is the failure mode this
            # guards.  The reorder must hit whatever actually feeds the
            # DDL below: the SCHEMA when one is given (string DDL is
            # normalized to a StructType first), else ``columns``.
            # (Naive split: quoted delimiters inside header names aren't
            # supported on this path.)
            if isinstance(schema, str):
                schema = T.StructType.fromDDL(schema)
            expected = (
                [f_.name for f_ in schema.fields]
                if isinstance(schema, T.StructType)
                else list(columns)
                if columns
                else None
            )
            if expected is not None:
                # the header sits AFTER the skipped junk lines
                head = spark.read.text(path).take(skip + 1)
                names = (
                    [h.strip().strip(quotechar) for h in head[-1][0].split(delimiter)]
                    if len(head) > skip
                    else []
                )
                if names and names != expected:
                    if sorted(names) != sorted(expected):
                        raise ValueError(
                            f"csv header {names} does not match the declared "
                            f"columns {expected}"
                        )
                    # parse in FILE order (values map positionally) but
                    # remember the caller's order: the returned frame
                    # must present columns as DECLARED, or positional
                    # consumers (toPandas().values, fixed-schema writes)
                    # silently read reordered columns
                    declared_order = list(expected)
                    if isinstance(schema, T.StructType):
                        by_name = {f_.name: f_ for f_ in schema.fields}
                        schema = T.StructType([by_name[n] for n in names])
                    else:
                        columns = names
            skip += 1
            header = False
        if schema is None and columns:
            ddl = ", ".join(f"`{c}` string" for c in columns)
        elif isinstance(schema, T.StructType):
            # per-field DDL: a global ':'→' ' replace would mangle
            # nested types like array<struct<a:int>>
            ddl = ", ".join(
                f"`{f_.name}` {f_.dataType.simpleString()}" for f_ in schema.fields
            )
        else:
            ddl = schema
        lines = (
            spark.read.text(path, wholetext=True)
            .select(
                F.explode(
                    F.expr(
                        f"slice(split(value, '\\n'), {skip + 1}, "
                        f"greatest(size(split(value, '\\n')) - {skip}, 0))"
                    )
                ).alias("line")
            )
            .filter(F.col("line") != "")
        )
        parsed = lines.select(
            F.from_csv(
                "line", ddl, {"sep": delimiter, "quote": quotechar}
            ).alias("r")
        ).select("r.*")
        if drop_malformed:
            parsed = parsed.dropna(how="all")
        if declared_order is not None:
            # value-to-name mapping followed the file; output column
            # ORDER follows the caller's declaration
            parsed = parsed.select(*declared_order)
        return parsed

    reader = (
        spark.read.option("sep", delimiter)
        .option("quote", quotechar)
        .option("header", str(header).lower())
        .option("mode", "DROPMALFORMED" if drop_malformed else "PERMISSIVE")
    )
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.csv(path)
    if columns and not header and schema is None:
        df = df.toDF(*columns)
    return df


def json_feeder(spark: SparkSession, path: str, schema: T.StructType | str | None = None) -> DataFrame:
    """Whole-document JSON: object or array of objects (S4)."""
    reader = spark.read.option("multiLine", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def jsonlines_feeder(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    corrupt_col: str | None = None,
) -> DataFrame:
    """NDJSON, one item per line; bad lines quarantined (S5).

    ``corrupt_col`` names a column that captures unparseable lines
    (reference: bad line → ItemNotImportable, chomper/feeders.py:128-134).
    """
    reader = spark.read
    if corrupt_col:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
        if schema is not None and isinstance(schema, T.StructType):
            schema = T.StructType(schema.fields + [T.StructField(corrupt_col, T.StringType())])
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def jdbc_scan_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
    **properties: str,
) -> dict[str, str]:
    """Option set for a partitioned JDBC scan — the Spark equivalent of
    the reference TableFeeder's chunked live-DB read
    (chomper/contrib/sql/feeders.py:17-41, chunk(100) :22): Spark splits
    the scan into ``num_partitions`` parallel range queries on
    ``partition_column`` instead of one cursor chunking rows.

    Separated from the reader so the exact options are unit-testable
    without a live database/driver (none in this sandbox)."""
    opts: dict[str, str] = {"url": url, "dbtable": table, "fetchsize": str(fetch_size)}
    partition_args = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(a is not None for a in partition_args):
        if any(a is None for a in partition_args):
            raise ValueError(
                "partitioned JDBC scans need ALL of partition_column/"
                "lower_bound/upper_bound/num_partitions"
            )
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    opts.update({k: str(v) for k, v in properties.items()})
    return opts


def table_feeder(spark: SparkSession, table_or_path: str, jdbc_url: str | None = None, **jdbc_opts) -> DataFrame:
    """Full-table scan (S6).  The reference chunks 100 rows at a time to
    bound memory (chomper/contrib/sql/feeders.py:22); Spark's partitioned
    scan is the set-oriented equivalent — chunking is the task split.
    With ``jdbc_url``, scans a live database table through the JDBC
    source; pass partition_column/lower_bound/upper_bound/num_partitions
    (see ``jdbc_scan_options``) for a parallel range-partitioned read."""
    if jdbc_url is not None:
        opts = jdbc_scan_options(jdbc_url, table_or_path, **jdbc_opts)
        return spark.read.format("jdbc").options(**opts).load()
    if "/" in table_or_path or table_or_path.endswith(".parquet"):
        return spark.read.parquet(table_or_path)
    return spark.table(table_or_path)


def query_feeder(spark: SparkSession, sql: str) -> DataFrame:
    """Run a recorded query (S7).  The reference records a deferred
    Signature list and replays it (chomper/support/replay.py:48-71);
    Spark SQL text → unresolved logical plan is the same split."""
    return spark.sql(sql)


def http_feeder(
    spark: SparkSession,
    url: str,
    format: str = "jsonlines",
    schema: T.StructType | str | None = None,
    timeout: int = 30,
    method: str = "GET",
    data: bytes | str | None = None,
    headers: dict[str, str] | None = None,
    lines: bool = True,
    max_bytes: int | None = None,
):
    """HTTP source (S10, chomper/readers.py:72-99: HttpReader supports
    any ``method`` + request args and line-streamed or whole-body
    reads; parity here is ``method``/``data``/``headers`` plus the
    ``lines`` toggle with INCREMENTAL line iteration — the body is
    never buffered whole in line mode, matching ``iter_lines``).

    Spark has no native HTTP DataSource; like the reference (which
    streams on the DRIVER), the fetch is driver-side and the parsed
    rows are parallelized.  Right for small config/seed feeds only —
    bulk data belongs on s3a://-style storage where the executors scan
    it in parallel (S11).  ``max_bytes`` guards the driver against an
    unexpectedly huge body (raises instead of OOM).  The sandbox has
    no network, so tests exercise method/body/line handling with
    file:// URLs and a local HTTP server on loopback.
    """
    import io
    import json as _json
    import urllib.request

    if data is not None and isinstance(data, str):
        data = data.encode()
    req = urllib.request.Request(
        url, data=data, headers=dict(headers or {}), method=method.upper()
    )

    def _iter_lines(resp):
        # iterate the raw BYTE stream (body never buffered whole) and
        # count bytes — not decoded characters — against max_bytes
        read = 0
        for bline in resp:
            read += len(bline)
            if max_bytes is not None and read > max_bytes:
                raise ValueError(f"http body exceeded max_bytes={max_bytes}")
            line = bline.decode("utf-8", errors="replace").strip()
            if line:
                yield line

    def _read_body(resp) -> str:
        body = resp.read() if max_bytes is None else resp.read(max_bytes + 1)
        if max_bytes is not None and len(body) > max_bytes:
            raise ValueError(f"http body exceeded max_bytes={max_bytes}")
        return body.decode("utf-8", errors="replace")

    with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
        if format == "jsonlines":
            if lines:
                rows = [_json.loads(line) for line in _iter_lines(resp)]
            else:
                rows = [
                    _json.loads(line)
                    for line in io.StringIO(_read_body(resp))
                    if line.strip()
                ]
        elif format == "json":
            doc = _json.loads(_read_body(resp))
            rows = doc if isinstance(doc, list) else [doc]
        elif format == "text":
            # the reference's raw-line mode: one row per non-blank line
            # (lines=True) or one whole-body row (lines=False)
            if lines:
                rows = [{"line": line} for line in _iter_lines(resp)]
            else:
                rows = [{"line": _read_body(resp)}]
        else:
            raise ValueError(f"unsupported http format: {format}")
    return list_feeder(spark, rows, schema=schema)
