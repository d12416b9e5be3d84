"""Property-based tests (hypothesis) for the ray-casting kernel: checked
against an INDEPENDENT half-plane formulation on random convex polygons."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geoglue_spark.pip import coverage_fractions, points_in_geom


def _random_convex(seed: int, n: int) -> np.ndarray:
    """Convex polygon: random angles on a circle of random radius (points in
    convex position by construction), then a random affine stretch."""
    rng = np.random.Generator(np.random.PCG64(seed))
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(1.0, 3.0)  # single radius: convexity guaranteed
    sx, sy = rng.uniform(0.5, 2.0, 2)  # affine stretch preserves convexity
    ring = np.stack([np.cos(ang) * rad * sx, np.sin(ang) * rad * sy], axis=1)
    return np.vstack([ring, ring[:1]])


def _halfplane_inside(px, py, ring):
    """Independent oracle for CONVEX polygons: point is inside iff it is on
    the same side of every edge (CCW ordering)."""
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    cross = (x2 - x1)[None, :] * (py[:, None] - y1[None, :]) - (y2 - y1)[None, :] * (
        px[:, None] - x1[None, :]
    )
    return (cross > 0).all(axis=1) | (cross < 0).all(axis=1)


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 10_000), n=st.integers(4, 40))
def test_raycast_matches_halfplane_on_convex(seed, n):
    ring = _random_convex(seed, n)
    rng = np.random.Generator(np.random.PCG64(seed + 1))
    px = rng.uniform(-4, 4, 200)
    py = rng.uniform(-4, 4, 200)
    got = points_in_geom(px, py, [[ring]])
    want = _halfplane_inside(px, py, ring)
    # exclude points numerically on an edge (measure-zero disagreement zone)
    x1, y1, x2, y2 = ring[:-1, 0], ring[:-1, 1], ring[1:, 0], ring[1:, 1]
    cross = (x2 - x1)[None, :] * (py[:, None] - y1[None, :]) - (y2 - y1)[None, :] * (
        px[:, None] - x1[None, :]
    )
    seg_len = np.hypot(x2 - x1, y2 - y1)[None, :]
    near_edge = (np.abs(cross) / seg_len < 1e-9).any(axis=1)
    ok = got == want
    assert ok[~near_edge].all()


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    dx=st.floats(-50, 50, allow_nan=False),
    dy=st.floats(-50, 50, allow_nan=False),
)
def test_translation_invariance(seed, dx, dy):
    ring = _random_convex(seed, 12)
    rng = np.random.Generator(np.random.PCG64(seed + 2))
    px = rng.uniform(-4, 4, 100)
    py = rng.uniform(-4, 4, 100)
    a = points_in_geom(px, py, [[ring]])
    b = points_in_geom(px + dx, py + dy, [[ring + np.array([dx, dy])]])
    np.testing.assert_array_equal(a, b)


def _random_convex_around_origin(seed: int, n: int) -> np.ndarray:
    """Convex polygon guaranteed to CONTAIN the origin: stratified angles
    (one per 2π/n sector) keep every angular gap < 2·(2π/n) < π for n ≥ 5,
    so the hull surrounds the center. The plain `_random_convex` does NOT
    guarantee this — uniform angles can all land in one half-plane
    (hypothesis found seed 8073 doing exactly that), making the old
    'cell at origin is inside' assumption falsifiable by the GENERATOR,
    not the kernel."""
    rng = np.random.Generator(np.random.PCG64(seed))
    ang = 2 * np.pi * (np.arange(n) + rng.uniform(0.0, 0.9, n)) / n
    rad = rng.uniform(1.0, 3.0)
    sx, sy = rng.uniform(0.5, 2.0, 2)
    ring = np.stack([np.cos(ang) * rad * sx, np.sin(ang) * rad * sy], axis=1)
    return np.vstack([ring, ring[:1]])


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_coverage_of_contained_cell_is_one(seed):
    ring = _random_convex_around_origin(seed, 16) * 10.0  # radius 10..30
    cov = coverage_fractions(
        np.array([-0.5]), np.array([-0.5]), np.array([0.5]), np.array([0.5]),
        [[ring]], supersample=4,
    )
    assert cov[0] == 1.0  # unit cell at origin is deep inside


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 10_000), k=st.integers(1, 5))
def test_coverage_monotone_in_supersample_error(seed, k):
    """Coverage estimates at different supersample levels agree within the
    theoretical error bound for a convex region."""
    ring = _random_convex(seed, 10)
    args = (np.array([0.0]), np.array([0.0]), np.array([2.0]), np.array([2.0]), [[ring]])
    lo = coverage_fractions(*args, supersample=4 * k)
    hi = coverage_fractions(*args, supersample=32)
    assert abs(lo[0] - hi[0]) <= 0.5 / k  # O(perimeter/n) bound, loose


# ---- pigeonhole banding property (pure Python, no Spark) ---------------------
from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _sig_pair(draw):
    sig_bits = draw(st.sampled_from([60, 64]))
    h = draw(st.integers(0, 12))
    base = draw(st.integers(0, (1 << sig_bits) - 1))
    n_flips = draw(st.integers(0, h))
    flip_bits = draw(
        st.lists(st.integers(0, sig_bits - 1), min_size=n_flips, max_size=n_flips, unique=True)
    )
    other = base
    for b in flip_bits:
        other ^= 1 << b
    return sig_bits, h, base, other


@given(_sig_pair())
@settings(max_examples=300, deadline=None)
def test_band_layout_pigeonhole_guarantee(case):
    """Any pair within Hamming distance h MUST share at least one exact
    band when n_bands = h + 1 — the property phash_near_dupes' candidate
    generation relies on for 100% recall."""
    from geoglue_spark.operators.dedup import _band_layout

    sig_bits, h, a, b = case
    layout = _band_layout(sig_bits, h + 1)
    assert sum(w for _, w in layout) == sig_bits  # bands tile the signature
    shared = any(
        ((a >> start) & ((1 << width) - 1)) == ((b >> start) & ((1 << width) - 1))
        for start, width in layout
    )
    assert shared
