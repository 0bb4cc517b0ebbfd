"""Property-based tests for the round-2 pipeline operators: connected
components vs a reference union-find, as-of join vs brute force, and
chunk-coverage invariants. Spark-backed properties keep max_examples
small (each example is a Spark job)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

import trialstreamer_spark.operators.dedup as dedup
import trialstreamer_spark.operators.temporal as temporal


# ---------------------------------------------------------------------------
# Connected components ≡ union-find fixpoint on random graphs
# ---------------------------------------------------------------------------

EDGE_LISTS = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(lambda e: e[0] != e[1]),
    min_size=0,
    max_size=20,
)


def _reference_components(n_nodes: int, edges: list[tuple[int, int]]) -> dict:
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # resolve every node to its root, then normalize root -> min member
    comp: dict = {}
    for v in range(n_nodes):
        comp.setdefault(find(v), []).append(v)
    return {v: min(members) for members in comp.values() for v in members}


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(EDGE_LISTS)
def test_connected_components_matches_union_find(spark, edges):
    n = 15
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    if edges:
        edges_df = spark.createDataFrame(
            [(min(a, b), max(a, b)) for a, b in edges], "doc_a long, doc_b long"
        )
    else:
        edges_df = spark.createDataFrame([], "doc_a long, doc_b long")
    got = {
        r.doc_id: r.component
        for r in dedup.connected_components(nodes, edges_df).collect()
    }
    assert got == _reference_components(n, edges)


# ---------------------------------------------------------------------------
# As-of join ≡ brute-force max-over-prefix
# ---------------------------------------------------------------------------

EVENTS = st.lists(
    st.tuples(
        st.integers(0, 2),  # user
        st.integers(0, 50),  # time offset (seconds)
        st.booleans(),  # is right-side row
    ),
    min_size=1,
    max_size=16,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(EVENTS)
def test_asof_join_matches_bruteforce(spark, events):
    import datetime as dt

    rows = [
        (
            i,
            user,
            dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec),
            "right" if is_right else "left",
        )
        for i, (user, sec, is_right) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = temporal.asof_join(
        df.select("*", F.unix_micros("ts").alias("ts_us")),
        key="user_id",
        order=["ts", "event_id"],
        right_flag=F.col("event_type") == "right",
        right_value=F.col("ts_us"),
    )
    got = {r.event_id: r.asof_value for r in out.collect()}

    # brute force: for each row, max right-row ts among same-user rows
    # at-or-before it in (ts, event_id) order
    def us(t):
        return int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)

    for i, (user, sec, _) in enumerate(events):
        mine = rows[i]
        eligible = [
            us(r[2])
            for r in rows
            if r[1] == user
            and r[3] == "right"
            and (r[2], r[0]) <= (mine[2], mine[0])
        ]
        expect = max(eligible) if eligible else None
        assert got[i] == expect, f"row {i}: {got[i]} != {expect}"


# ---------------------------------------------------------------------------
# Chunking invariants: full coverage, bounded size, correct overlap
# ---------------------------------------------------------------------------

TOKEN_COUNTS = st.integers(min_value=1, max_value=120)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(TOKEN_COUNTS)
def test_doc_chunks_cover_every_token(spark, n_tokens):
    from trialstreamer_spark.operators import quality as q

    text = " ".join(f"t{i}" for i in range(1, n_tokens + 1))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    toks = docs.select(
        "doc_id", F.filter(F.split("text", r"\s+"), lambda t: t != "").alias("t")
    )
    n_chunks_m1 = F.floor((F.size("t") - 1) / q.CHUNK_STRIDE).cast("long")
    chunk = F.slice(F.col("t"), F.col("chunk_idx") * q.CHUNK_STRIDE + 1, q.CHUNK_SIZE)
    got = (
        toks.select(
            "doc_id",
            "t",
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks_m1)).alias(
                "chunk_idx"
            ),
        )
        .select("chunk_idx", chunk.alias("c"))
        .orderBy("chunk_idx")
        .collect()
    )
    covered = [tok for r in got for tok in r.c]
    # every token appears; chunk size bounded; consecutive chunks overlap
    # by exactly size-stride while both are full-width
    assert set(covered) == {f"t{i}" for i in range(1, n_tokens + 1)}
    assert all(1 <= len(r.c) <= q.CHUNK_SIZE for r in got)
    for a, b in zip(got, got[1:]):
        overlap = set(a.c) & set(b.c)
        if len(a.c) == q.CHUNK_SIZE:
            assert len(overlap) == q.CHUNK_SIZE - q.CHUNK_STRIDE
