"""Exhaustive-ish differential fuzz of ops/softfloat against CPython doubles.

CPython float arithmetic IS IEEE-754 binary64 with correct rounding, i.e.
exactly what the reference's C computes (graph.c:141,170-172, branch.c:72,
overlap.c:134-136), so ``int(S / n + 0.499)`` etc. are the ground truth.
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pangene_tpu.ops import softfloat as sf


def _truth_plus499(S, n):
    return int(S / n + 0.499)


def test_plus499_boundaries():
    """Systematic sweep of the dangerous region: S/n + .499 within ~1e-3 of
    an integer, where double rounding decides the carry."""
    Ss, ns = [], []
    for n in list(range(1, 50)) + [100, 125, 1000, 1024, 999, 2000, 10**6]:
        for k in (0, 1, 2, 7, 1000, 123456):
            base = k * n + n // 2
            for d in range(-3, 4):
                s = base + d
                if s >= 0:
                    Ss.append(s)
                    ns.append(n)
            # near the .501 boundary: S/n ~ k + 0.501
            s501 = k * n + (501 * n) // 1000
            for d in range(-3, 4):
                s = s501 + d
                if s >= 0:
                    Ss.append(s)
                    ns.append(n)
    S = np.asarray(Ss, np.int64)
    n = np.asarray(ns, np.int64)
    got = np.asarray(jax.jit(sf.plus499_trunc)(jnp.asarray(S), jnp.asarray(n)))
    want = np.asarray([_truth_plus499(int(a), int(b)) for a, b in zip(S, n)],
                      np.int64)
    bad = np.flatnonzero(got != want)
    assert len(bad) == 0, [(int(S[i]), int(n[i]), int(got[i]), int(want[i]))
                           for i in bad[:10]]


def test_plus499_random():
    rng = np.random.default_rng(0)
    fn = jax.jit(sf.plus499_trunc)
    for mag in (10, 20, 31, 40, 45, 52):
        S = rng.integers(0, 1 << mag, 20000).astype(np.int64)
        n = rng.integers(1, min(1 << mag, 1 << 31) + 1, 20000).astype(np.int64)
        got = np.asarray(fn(jnp.asarray(S), jnp.asarray(n)))
        want = np.asarray([_truth_plus499(int(a), int(b))
                           for a, b in zip(S, n)], np.int64)
        assert np.array_equal(got, want), mag


def test_div_rn_matches_python():
    rng = np.random.default_rng(1)
    fn = jax.jit(sf.div_rn)
    for mag in (5, 16, 31, 45, 61):
        S = rng.integers(0, 1 << mag, 20000).astype(np.int64)
        n = rng.integers(1, 1 << min(mag, 31), 20000).astype(np.int64)
        m, k = (np.asarray(a) for a in fn(jnp.asarray(S), jnp.asarray(n)))
        # reconstruct and compare to the correctly-rounded python division
        got = m.astype(np.float64) * np.ldexp(1.0, -k.astype(np.int64))
        want = np.asarray([int(a) / int(b) for a, b in zip(S, n)])
        assert np.array_equal(got, want)


def test_branch_deficit_predicate():
    """fl(1 - fl(s1/mx)) <cmp> const, exactly as branch.c:72-78."""
    rng = np.random.default_rng(2)
    consts = [0.02, 0.05, 0.5, 0.25, 1e-9, 0.999, 0.1 + 0.2]  # incl. non-exact
    N = 30000
    s1 = rng.integers(0, 1 << 31, N).astype(np.int64)
    mx = np.maximum(s1, rng.integers(1, 1 << 31, N).astype(np.int64))
    # heavy tie mass: s1 == mx, s1 = mx-1, and ratios near the constants
    s1[:2000] = mx[:2000]
    s1[2000:4000] = np.maximum(mx[2000:4000] - 1, 0)
    for i, c in enumerate(consts):
        lo = 4000 + 3000 * i
        hi = lo + 3000
        if hi <= N:
            mxs = mx[lo:hi]
            tgt = np.round((1.0 - c) * mxs).astype(np.int64)
            s1[lo:hi] = np.clip(tgt + rng.integers(-1, 2, hi - lo), 0, mxs)
    m, k = jax.jit(sf.one_minus_div)(jnp.asarray(s1), jnp.asarray(mx))
    for c in consts + [-0.5, 0.0]:
        got = np.asarray(jax.jit(lambda m, k: sf.gt_const(m, k, c))(m, k))
        want = np.asarray([(1.0 - int(a) / int(b)) > c
                           for a, b in zip(s1, mx)])
        bad = np.flatnonzero(got != want)
        assert len(bad) == 0, (c, [(int(s1[i]), int(mx[i])) for i in bad[:5]])


def test_cov_lt_predicate():
    """(double)ov / l < ratio, exactly as overlap.c:134-136."""
    rng = np.random.default_rng(3)
    N = 20000
    l = rng.integers(1, 1 << 31, N).astype(np.int64)
    ov = rng.integers(0, 1 << 31, N).astype(np.int64) % (l + 1)
    # boundary mass at ov ~ ratio*l
    for i, c in enumerate([0.5, 0.05, 0.3]):
        lo = 1000 + 4000 * i
        hi = lo + 4000
        tgt = np.round(c * l[lo:hi]).astype(np.int64)
        ov[lo:hi] = np.clip(tgt + rng.integers(-1, 2, hi - lo), 0, l[lo:hi])
    m, k = jax.jit(sf.div_rn)(jnp.asarray(ov), jnp.asarray(l))
    for c in (0.5, 0.05, 0.3, 0.9999999, 1e-12, 0.0, -1.0):
        got = np.asarray(jax.jit(lambda m, k: sf.lt_const(m, k, c))(m, k))
        want = np.asarray([(int(a) / int(b)) < c for a, b in zip(ov, l)])
        assert np.array_equal(got, want), c


def test_decompose_roundtrip():
    for x in (0.499, 0.02, 0.05, 0.5, 1.0 - 2**-53, 2**-1022, 1e300, 0.0):
        m, k = sf.decompose(x)
        assert math.ldexp(m, -k) == x
