"""Generate a larger-scale synthetic corpus matching the driver testdata
schemas (TESTDATA.md) for the scale rehearsal (SCALE.md).

The driver's own generator is not in the repo, so this reproduces the
same star schema + events + documents + embeddings with matching column
types, category domains, and value ranges, at an arbitrary multiple of
sf0.1's row counts. It does NOT try to be byte-identical to the driver
data — the rehearsal compares Spark vs DuckDB on the SAME generated
files, so only shape fidelity matters: skewless uniform keys, ~4
lineitems/order, 20 doc sources, 5 langs, ~5% near-duplicate documents
(shared prefix, mutated tail, 'dup' marker token), 10 Gaussian embedding
clusters in 64-d.

Text modes (third CLI arg, default ``fixed``):

- ``fixed`` — the original 30-word vocabulary. Fine for text-CPU and
  retrieval shapes, but structurally WRONG for the dedup pair joins at
  large SF: with |vocab| constant, every shingle's document frequency
  grows linearly with the corpus, so candidate pair counts grow
  quadratically — a blowup real corpora don't exhibit (r9 verdict: the
  first sf10 dedup attempt filled the disk; the family was excluded
  from the sf10 decade).
- ``heaps`` — Heaps-law vocabulary: |vocab| = 2·n_doc^0.7 hash-suffixed
  tokens drawn from a Zipf(1.07) rank distribution. Shingle DF then
  scales like a real corpus (a few stopword-like shingles capped by the
  df valve, a long unique tail), which is the regime the dedup
  prefix-filter/LSH claims must be measured in. The original 30 words
  occupy the top Zipf ranks so the retrieval/marker terms ('dup',
  QUERY_TERMS) stay present and frequent.

Usage: python tools/gen_scale.py <out_dir> [multiplier] [fixed|heaps]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "batch small scan agg data customer big hash slow join row filter "
    "merge table stream sort a window order query group spark part column "
    "value the vector line fast key"
).split()

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["MACHINERY", "HOUSEHOLD", "AUTOMOBILE", "FURNITURE", "BUILDING"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["click", "signup", "purchase", "error", "view"]
LANGS = ["en", "de", "zh", "fr", "es"]


#: when set (CLI ``only=t1,t2``), tables NOT named are built but not
#: written — the dedup decade needs only documents(+embeddings), and
#: skipping the 60M-row lineitem/orders parquet writes at mult=100
#: saves most of the generation wall-clock and disk.
ONLY: set | None = None


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    if ONLY is not None and name not in ONLY:
        print(f"  {name}: skipped (only={sorted(ONLY)})")
        return
    # 64k-row row groups, NOT pyarrow's ~1M default: Spark cannot split
    # a row group, so a 1M-row group scans as one partition regardless
    # of spark.sql.files.maxPartitionBytes (measured in round 8: the
    # driver's sf0.1 corpus scans every table single-threaded, and the
    # earlier sf1 run here landed 6M lineitem rows in 6 of 28 splits).
    # io.warm_cache re-spreads cached relations as a runtime stand-in;
    # this writes any FUTURE corpus with a splittable layout at the
    # source. (Existing scale_data is NOT regenerated — its timings are
    # the committed rehearsal baselines.)
    pq.write_table(
        table, os.path.join(out_dir, f"{name}.parquet"), row_group_size=65536
    )
    print(f"  {name}: {table.num_rows} rows")


def generate(
    out_dir: str, mult: float = 10.0, seed: int = 7, text_mode: str = "fixed"
) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    n_cust = int(15_000 * mult)
    n_supp = int(1_000 * mult)
    n_part = int(20_000 * mult)
    n_ord = int(150_000 * mult)
    n_line = int(600_000 * mult)
    n_ev = int(100_000 * mult)
    n_users = int(1_500 * mult)
    n_doc = int(5_000 * mult)
    n_vec = int(2_000 * (mult ** 0.6))  # sub-linear like the driver data

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    }))
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
    }))
    # p_name / p_type draw from the SAME pools as the driver testdata
    # (TESTDATA.md tables) so the name-pattern and type-slice predicates
    # (product_profit_by_nation '%widget%', nation_market_share
    # 'STANDARD', cheapest_supplier 'ECONOMY', promo/disjunctive 'PROMO')
    # stay non-trivially selective at sf1 instead of matching nothing.
    adjs = ["small", "red", "blue", "hot", "cold", "large", "new", "old"]
    nouns = ["ring", "widget", "bolt", "gear", "gizmo", "anvil", "plate", "rod"]
    p_types = ["MEDIUM", "STANDARD", "LARGE", "PROMO", "SMALL", "ECONOMY"]
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [
            f"{adjs[a]} {nouns[b]}"
            for a, b in zip(
                rng.integers(0, len(adjs), n_part),
                rng.integers(0, len(nouns), n_part),
            )
        ],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": [p_types[i] for i in rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900.0, 999.9, n_part), 2),
    }))

    day_us = 86_400_000_000
    o_date = (
        np.datetime64("1995-01-01", "us").astype(np.int64)
        + rng.integers(0, 2405, n_ord) * day_us
    )
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": np.array(["O", "F", "P"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000.0, 400000.0, n_ord), 2),
        "o_orderdate": pa.array(o_date, pa.timestamp("us")),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    }))

    l_order = rng.integers(0, n_ord, n_line)
    l_order.sort()
    # linenumber = running index within each order
    ln = np.ones(n_line, np.int32)
    same = np.concatenate(([False], l_order[1:] == l_order[:-1]))
    run = np.zeros(n_line, np.int64)
    idx = np.arange(n_line)
    start = np.where(~same, idx, 0)
    np.maximum.accumulate(start, out=start)
    ln = (idx - start + 1).astype(np.int32)
    ship = o_date[l_order] + rng.integers(1, 122, n_line) * day_us
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_order, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_line), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_line), pa.int64()),
        "l_linenumber": pa.array(ln, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_line).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900.0, 105000.0, n_line), 2),
        "l_discount": np.round(rng.integers(0, 11, n_line) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_line) / 100.0, 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_line)],
        "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_line)],
        "l_shipdate": pa.array(ship, pa.timestamp("us")),
    }))

    ts = np.sort(
        np.datetime64("2024-01-01", "us").astype(np.int64)
        + rng.integers(0, 30 * day_us, n_ev)
    )
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.uniform(0.01, 500.0, n_ev), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: random word sequences; ~5% near-dups = copy of an
    # earlier doc's prefix + mutated tail + 'dup' marker
    lens = rng.integers(10, 110, n_doc)
    texts: list[str] = []
    if text_mode == "heaps":
        n_voc = max(len(VOCAB), int(2.0 * n_doc**0.7))
        vocab = np.array(
            [
                VOCAB[j]
                if j < len(VOCAB)
                else f"{VOCAB[j % len(VOCAB)]}{j // len(VOCAB):x}"
                for j in range(n_voc)
            ]
        )
        zipf_p = np.arange(1, n_voc + 1, dtype=np.float64) ** -1.07
        zipf_p /= zipf_p.sum()
        # one vectorized draw for every token of every doc (a per-doc
        # choice(p=...) call rebuilds the CDF each time — O(n_doc·|V|))
        flat = vocab[rng.choice(n_voc, int(lens.sum()), p=zipf_p)]
    else:
        vocab = np.array(VOCAB)
        flat = vocab[rng.integers(0, len(vocab), int(lens.sum()))]
    offs = np.concatenate(([0], np.cumsum(lens)))
    for i in range(n_doc):
        words = flat[offs[i] : offs[i + 1]]
        if i > 0 and rng.random() < 0.05:
            base = texts[int(rng.integers(0, i))].split()
            keep = max(3, int(len(base) * 0.8))
            words = np.array(
                base[:keep]
                + list(vocab[rng.integers(0, len(vocab), 2)])
                + ["dup"]
            )
        texts.append(" ".join(words))
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": np.array(LANGS)[
            rng.choice(5, n_doc, p=[0.6, 0.1, 0.1, 0.1, 0.1])
        ],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    labels = rng.integers(0, 10, n_vec).astype(np.int32)
    cents = rng.normal(0, 0.25, (10, 64))
    vecs = (cents[labels] + rng.normal(0, 0.08, (n_vec, 64))).astype(np.float32)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(range(n_vec), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    argv = list(sys.argv[1:])
    for a in list(argv):
        if a.startswith("only="):
            ONLY = set(a[len("only="):].split(","))
            argv.remove(a)
    out = argv[0] if len(argv) > 0 else "scale_data/sf1"
    mult = float(argv[1]) if len(argv) > 1 else 10.0
    mode = argv[2] if len(argv) > 2 else "fixed"
    generate(out, mult, text_mode=mode)
