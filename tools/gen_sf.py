"""Generate a larger same-schema synthetic dataset for scale-boundary
selfchecks (round-4 verdict "Next round" #7).

The driver ships sf0.001/0.01/0.1; the 51-query selfcheck compares
Spark vs DuckDB on the SAME input, so catching scale-boundary bugs
(cap saturations, AQE plan flips, Arrow batch memory pressure) only
needs a bigger input of the same SHAPE — this generator produces the
five tables the queries actually read (events, documents, embeddings,
orders, customer) at a requested multiple of sf0.1, deterministic
(hash-based, seeded), with distributions mirroring the driver's:

  * documents: ~60-word vocab word-salad, 5 langs (en-heavy), plus
    planted exact-dup and near-dup groups so the dedup families have
    real signal (and the DF/chunk caps actually saturate at scale);
  * embeddings: dim-64 float32 around 8 centroids (labels 0..3) so
    ANN/IVF queries have cluster structure;
  * events: 5 event types, ts ramp, zipf-ish user ids, JSON props;
  * orders/customer: the TPC-H-ish columns the asof/lookup queries use.

The remaining TPC-H tables (region nation supplier part lineitem) are
copied from the base sf dir purely so selfcheck's view registration
binds — no query reads them.

Usage: python tools/gen_sf.py OUT_DIR [multiplier] [base_sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

VOCAB = (
    "key agg row scan slow fast table value part hash merge batch window "
    "spark order data column join small line customer query big the a filter "
    "shuffle bucket index state stream delta commit snapshot plan codegen "
    "broadcast skew salt probe build read write cache spill sort exchange"
).split()
LANGS = ["en", "en", "en", "de", "zh", "fr", "es"]  # en-weighted
EVENT_TYPES = ["click", "signup", "error", "view", "purchase"]


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


def gen_documents(n: int, seed: int = 42):
    rng = _rng(seed)
    lens = rng.integers(8, 90, size=n)
    texts = []
    for i in range(n):
        words = rng.choice(VOCAB, size=int(lens[i]))
        texts.append(" ".join(words))
    # planted duplicate structure: every 40th doc pairs with its
    # predecessor — half exact copies, half one-word mutations
    for i in range(1, n, 40):
        if i + 1 < n:
            if (i // 40) % 2 == 0:
                texts[i + 1] = texts[i]
            else:
                w = texts[i].split()
                w[-1] = "mutated"
                texts[i + 1] = " ".join(w)
    import pandas as pd

    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": [LANGS[int(x)] for x in rng.integers(0, len(LANGS), size=n)],
            "source": [f"src{int(x)}" for x in rng.integers(0, 10, size=n)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


def gen_embeddings(n: int, dim: int = 64, seed: int = 43):
    rng = _rng(seed)
    centroids = rng.normal(0, 1, size=(8, dim))
    cluster = rng.integers(0, 8, size=n)
    vecs = (centroids[cluster] + rng.normal(0, 0.15, size=(n, dim))).astype(np.float32)
    import pandas as pd

    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(vecs),
            "label": (cluster % 4).astype(np.int32),
        }
    )


def gen_events(n: int, seed: int = 44):
    rng = _rng(seed)
    import pandas as pd

    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        np.cumsum(rng.integers(1, 400_000, size=n)), unit="us"
    )
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": (rng.pareto(1.5, size=n) * 10).astype(np.int64) % (n // 20 + 1),
            "event_type": [EVENT_TYPES[int(x)] for x in rng.integers(0, 5, size=n)],
            "value": np.round(rng.exponential(8.0, size=n), 2),
            "props": [f'{{"k": {int(x)}}}' for x in rng.integers(0, 100, size=n)],
        }
    )


def gen_orders(n: int, n_cust: int, seed: int = 45):
    rng = _rng(seed)
    import pandas as pd

    return pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_custkey": rng.integers(0, n_cust, size=n).astype(np.int64),
            "o_orderstatus": [
                "OFP"[int(x)] for x in rng.integers(0, 3, size=n)
            ],
            "o_totalprice": np.round(rng.exponential(40_000, size=n), 2),
            "o_orderdate": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 365 * 24 * 3600, size=n), unit="s"),
            "o_orderpriority": [
                f"{int(x) + 1}-P" for x in rng.integers(0, 5, size=n)
            ],
        }
    )


def gen_customer(n: int, seed: int = 46):
    rng = _rng(seed)
    import pandas as pd

    return pd.DataFrame(
        {
            "c_custkey": np.arange(n, dtype=np.int64),
            "c_name": [f"Customer#{i:09d}" for i in range(n)],
            "c_nationkey": rng.integers(0, 25, size=n).astype(np.int32),
            "c_acctbal": np.round(rng.normal(4500, 3000, size=n), 2),
            "c_mktsegment": [
                ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"][int(x)]
                for x in rng.integers(0, 5, size=n)
            ],
        }
    )


def main() -> int:
    out = sys.argv[1]
    mult = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    base = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def write(name, df):
        con.register("t", df)
        con.sql(f"COPY (SELECT * FROM t) TO '{out}/{name}.parquet' (FORMAT parquet)")
        con.unregister("t")
        print(f"wrote {name}: {len(df)} rows")

    n_cust = int(15_000 * mult)
    write("documents", gen_documents(int(5_000 * mult)))
    write("embeddings", gen_embeddings(int(2_000 * mult)))
    write("events", gen_events(int(100_000 * mult)))
    write("orders", gen_orders(int(150_000 * mult), n_cust))
    write("customer", gen_customer(n_cust))
    # registration-only stubs: copied from the base dir, never queried
    for t in ["region", "nation", "supplier", "part", "lineitem"]:
        con.sql(
            f"COPY (SELECT * FROM '{base}/{t}.parquet') "
            f"TO '{out}/{t}.parquet' (FORMAT parquet)"
        )
        print(f"copied stub {t}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
