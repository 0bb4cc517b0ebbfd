"""Property-based tests (hypothesis) for the driver-side numeric
kernels: the vectorized fixed-point implementations are checked against
straightforward scalar specs. Pure numpy — no Spark jobs — so these run
at full hypothesis volume."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from trialstreamer_spark.operators.clustering import (
    PQ_DIM,
    PQ_K,
    PQ_M,
    _adc_lut,
)
from trialstreamer_spark.operators.multimodal import (
    fake_frame_decoder,
    fake_resizer,
)
from trialstreamer_spark.operators.similarity import SCALE, fp_dot_vec

FLOATS = st.floats(
    min_value=-10.0, max_value=10.0, allow_nan=False, allow_infinity=False
)


def vec(dim):
    return st.lists(FLOATS, min_size=dim, max_size=dim).map(
        lambda xs: np.asarray(xs, dtype=np.float32)
    )


def scalar_fp_dot(a, b) -> int:
    """The spec: per-element float64 product, ×SCALE, floor, exact sum."""
    total = 0
    for x, y in zip(a, b):
        total += math.floor(float(x) * float(y) * float(SCALE))
    return total


@given(vec(16), vec(16))
def test_fp_dot_matches_scalar_spec(a, b):
    assert fp_dot_vec(a, b) == scalar_fp_dot(a, b)


@given(vec(16), vec(16), st.permutations(list(range(16))))
def test_fp_dot_is_symmetric_and_order_independent(a, b, perm):
    assert fp_dot_vec(a, b) == fp_dot_vec(b, a)
    p = np.asarray(perm)
    # permuting the DIMENSIONS permutes the summands only — exact int
    # arithmetic means the sum cannot change (the reason the kernel is
    # partitioning-stable on a cluster)
    assert fp_dot_vec(a[p], b[p]) == fp_dot_vec(a, b)


@given(
    st.lists(vec(PQ_M * PQ_DIM), min_size=PQ_K, max_size=PQ_K),
    vec(PQ_M * PQ_DIM),
)
@settings(
    max_examples=30,
    # no wall-clock deadline: the numpy kernel is fast, but a loaded
    # machine (full-suite parallel Spark stages) can push one example
    # past hypothesis's default 200 ms and flake the run
    deadline=None,
    suppress_health_check=[HealthCheck.large_base_example],
)
def test_adc_lut_matches_scalar_subspace_distances(seeds, q):
    lut = _adc_lut(q, np.stack(seeds))
    assert lut.shape == (PQ_M, PQ_K)
    for s in range(PQ_M):
        lo, hi = s * PQ_DIM, (s + 1) * PQ_DIM
        qs = q[lo:hi]
        for j in range(PQ_K):
            cs = seeds[j][lo:hi]
            want = (
                scalar_fp_dot(qs, qs)
                - 2 * scalar_fp_dot(qs, cs)
                + scalar_fp_dot(cs, cs)
            )
            assert lut[s][j] == want


@given(st.binary(max_size=200), st.integers(1, 64), st.integers(1, 64))
def test_fake_resizer_byte_geometry(content, w, h):
    out = fake_resizer(content, w, h)
    assert len(out) == w * h
    # deterministic
    assert out == fake_resizer(content, w, h)
    if content:
        # tiling: output is the source repeated, truncated
        reps = -(-(w * h) // len(content))
        assert out == (content * reps)[: w * h]


@given(st.binary(max_size=100), st.integers(0, 10**7))
def test_fake_frame_decoder_bounded_and_deterministic(content, ts):
    f = fake_frame_decoder(content, ts)
    assert 0.0 <= f <= 1.0
    assert f == fake_frame_decoder(content, ts)


@given(
    st.integers(min_value=0, max_value=(1 << 16) - 1),
    st.integers(min_value=0, max_value=(1 << 16) - 1),
)
@settings(max_examples=200, deadline=None)
def test_morton_interleave_is_bijective_and_ordered(a, b):
    """Driver-side mirror of io.zvalue_col's bit arithmetic: interleave
    is a bijection (de-interleave recovers both inputs) and z-value high
    bits come from the keys' high bits (the locality property Z-order
    clustering relies on)."""
    z = 0
    for i in range(16):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    # de-interleave
    ra = sum(((z >> (2 * i)) & 1) << i for i in range(16))
    rb = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
    assert (ra, rb) == (a, b)
    # quadrant ordering: halving both domains halves the z-domain twice
    assert (z >> 30) == (((b >> 15) & 1) << 1 | ((a >> 15) & 1))


def test_zvalue_col_matches_python_mirror(spark):
    from trialstreamer_spark.io import zvalue_col
    import pyspark.sql.functions as F

    rows = (
        spark.range(0, 512)
        .select(
            F.col("id").alias("a"),
            ((F.col("id") * 7919) % 65536).alias("b"),
            zvalue_col(F.col("id"), (F.col("id") * 7919) % 65536).alias("z"),
        )
        .collect()
    )
    for r in rows:
        z = 0
        for i in range(16):
            z |= ((r.a >> i) & 1) << (2 * i)
            z |= ((r.b >> i) & 1) << (2 * i + 1)
        assert r.z == z
