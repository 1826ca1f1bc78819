#!/usr/bin/env python3
"""Distribution-matched scale-factor generator (VERDICT r12 #6).

The driver's generator is not available in this environment, so a
TRUE sf1 benchmark needs a reconstruction.  This script regenerates
the testdata family (same schemas, same value distributions — fitted
against /root/testdata/sf*, see the constants below) at an arbitrary
sf, writing one parquet per table.  It is NOT bitwise-identical to
the driver's data (different RNG); it is *statistically* matched:

- row counts per table follow the observed sf scaling exactly
  (lineitem 6M/sf, orders 1.5M/sf, events 1M/sf, documents 50k/sf,
  embeddings 20k/sf floored at 500, customer 150k/sf, part 200k/sf,
  supplier 10k/sf; region/nation fixed);
- every column's marginal distribution is fitted from the real data
  (uniform ranges, Poisson(4.08) lines-per-order with natural zero
  dropping, Exp(mean 50) event values, monotone event timestamps over
  a 30-day window, the 31-word document vocabulary with uniform draws
  and 10-100 word lengths, en=41%/others~14.75% languages, unit-norm
  64-d gaussian embeddings with UNIFORM RANDOM labels — the audit
  showed labels carry no cluster structure);
- join relationships match (custkey/partkey/suppkey uniform over the
  dimension domains, event user_ids over the first 10% of the
  customer keyspace, shipdate independent of orderdate — fitted lag
  quantiles are +/- the full date range, i.e. independence).

Validation contract: BENCH_SF1.json (written by bench.py with
SPARK_GRAFT_SF_DIR pointing here) is only meaningful if this
generator's sf0.1 output benches within noise of the real sf0.1 —
`--validate` emits that comparison table and MUST be run (and
recorded) before trusting any sf1 numbers.

Usage:
    python scripts/gen_sf.py SF OUTDIR [SEED]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUSES = ["F", "O"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
P_ADJ = ["cold", "hot", "blue", "red", "small", "old", "new", "large"]
P_NOUN = ["plate", "gear", "rod", "ring", "anvil", "bolt", "widget", "gizmo"]
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]

EPOCH_DAY = 86_400
ORDER_D0 = np.datetime64("1995-01-01").astype("datetime64[s]").astype(np.int64)
ORDER_D1 = np.datetime64("2001-08-01").astype("datetime64[s]").astype(np.int64)
SHIP_D1 = np.datetime64("2001-11-04").astype("datetime64[s]").astype(np.int64)
EVENTS_T0 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
EVENTS_SPAN_US = 30 * EPOCH_DAY * 1_000_000

#: Poisson(4.0): total lineitem mean is exactly 4 rows/order (real
#: sf0.1: 600000/150000), zero-line orders e^-4 = 1.83% (real 1.84%),
#: nonzero-conditional mean 4/(1-e^-4) = 4.075 (real 4.075).
LINES_PER_ORDER = 4.0
EMB_DIM = 64


def _ts_days(rng, n, lo, hi):
    days = rng.integers(lo // EPOCH_DAY, hi // EPOCH_DAY + 1, size=n)
    return (days * EPOCH_DAY * 1_000_000).astype("datetime64[us]")


def _write(outdir: Path, name: str, table: pa.Table) -> None:
    pq.write_table(table, outdir / f"{name}.parquet")
    print(f"{name}: {table.num_rows} rows")


def generate(sf: float, outdir: Path, seed: int = 42) -> None:
    outdir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_cust = round(150_000 * sf)
    n_supp = round(10_000 * sf)
    n_part = round(200_000 * sf)
    n_ord = round(1_500_000 * sf)
    n_evt = round(1_000_000 * sf)
    n_doc = round(50_000 * sf)
    n_emb = max(500, round(20_000 * sf))
    n_users = max(1, round(n_cust * 0.1))

    _write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    _write(outdir, "customer", pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    }))
    _write(outdir, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))
    names = np.char.add(
        np.char.add(np.array(P_ADJ)[rng.integers(0, len(P_ADJ), n_part)], " "),
        np.array(P_NOUN)[rng.integers(0, len(P_NOUN), n_part)],
    )
    _write(outdir, "part", pa.table({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": names,
        "p_brand": np.array([f"Brand#{b}" for b in range(1, 26)])[
            rng.integers(0, 25, n_part)
        ],
        "p_type": np.array(PTYPES)[rng.integers(0, len(PTYPES), n_part)],
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
    }))
    _write(outdir, "orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord).astype(np.int64),
        "o_orderstatus": np.array(STATUSES)[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": _ts_days(rng, n_ord, ORDER_D0, ORDER_D1),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    }))
    lines = rng.poisson(LINES_PER_ORDER, n_ord)
    l_orderkey = np.repeat(np.arange(n_ord, dtype=np.int64), lines)
    n_li = l_orderkey.shape[0]
    linenumber = (
        np.arange(n_li, dtype=np.int64)
        - np.repeat(np.cumsum(lines) - lines, lines)
        + 1
    ).astype(np.int32)
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": l_orderkey,
        "l_partkey": rng.integers(0, n_part, n_li).astype(np.int64),
        "l_suppkey": rng.integers(0, n_supp, n_li).astype(np.int64),
        "l_linenumber": linenumber,
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array(RETURNFLAGS)[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(LINESTATUSES)[rng.integers(0, 2, n_li)],
        "l_shipdate": _ts_days(rng, n_li, ORDER_D0, SHIP_D1),
    }))
    gaps = rng.exponential(EVENTS_SPAN_US / max(n_evt, 1), n_evt)
    ts = EVENTS_T0 + np.cumsum(gaps * (EVENTS_SPAN_US / max(gaps.sum(), 1)))
    _write(outdir, "events", pa.table({
        "event_id": np.arange(n_evt, dtype=np.int64),
        "ts": ts.astype(np.int64).astype("datetime64[us]"),
        "user_id": rng.integers(0, n_users, n_evt).astype(np.int64),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_evt)],
        "value": np.round(rng.exponential(50.0, n_evt), 2),
        "props": np.char.add(
            np.char.add('{"k": ', rng.integers(0, 100, n_evt).astype(str)), "}"
        ),
    }))
    n_words = rng.integers(10, 101, n_doc)
    flat = np.array(VOCAB)[rng.integers(0, len(VOCAB), int(n_words.sum()))]
    bounds = np.cumsum(n_words)[:-1]
    texts = [" ".join(chunk) for chunk in np.split(flat, bounds)]
    _write(outdir, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": np.array(LANGS)[rng.choice(len(LANGS), n_doc, p=LANG_P)],
        "source": np.char.add("src", rng.integers(0, 20, n_doc).astype(str)),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))
    vecs = rng.normal(size=(n_emb, EMB_DIM))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(outdir, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(
            vecs.astype(np.float32).tolist(), pa.list_(pa.float32())
        ),
        "label": rng.integers(0, 10, n_emb).astype(np.int32),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1])
    outdir = Path(sys.argv[2])
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    generate(sf, outdir, seed)
