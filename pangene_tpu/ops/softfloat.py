"""Exact software emulation of the reference's IEEE-double predicates.

TPU f64 is emulated and its division is NOT correctly rounded (measured), so
any output-visible computation that rounds through a double must either run
on the host or be reproduced bit-exactly in integer arithmetic.  This module
does the latter for the three double expressions that live INSIDE the
pruning-round loop (and therefore inside the device-resident schedule,
parallel/device_loop.py):

  1. ``(int)((double)S / n + .499)``      - per-genome arc dist average
     (reference graph.c:141) and the merged-arc s1/s2/dist averages
     (graph.c:170-172): :func:`plus499_trunc`.
  2. ``1.0 - (double)s1 / max_s1  <cmp>  branch_diff``  - the branch-arc
     deficit predicate (reference branch.c:72-78): :func:`one_minus_div`
     + :func:`gt_const` / decomposed compares.
  3. ``(double)ov / min(li, lj) < min_ov_ratio``  - the shadow-sweep
     coverage gate (reference overlap.c:134-136): :func:`div_rn` +
     :func:`lt_const`.

All helpers are elementwise jnp int64 programs (no f64 anywhere), so they
are exact on any backend.  Doubles are represented as (m, k) with
value = m * 2^-k and m in [2^52, 2^53) (m == 0 encodes 0.0); the host-side
:func:`decompose` turns a Python float into that form.

The core primitive is :func:`div_rn`: correctly-rounded (round-to-nearest,
ties-to-even) division of two non-negative integers to a 53-bit significand,
done with a chunked long division entirely in int64.  Domain: 0 <= S < 2^62,
1 <= n < 2^31 (asserted by callers' data ranges, not at runtime).
"""
from __future__ import annotations

import math
from typing import Tuple

import jax

jax.config.update("jax_enable_x64", True)  # int64 throughout, as ops/device

import jax.numpy as jnp

I64 = jnp.int64
# plain Python ints: module-level jnp constants would become TRACERS if the
# module is first imported inside a jit trace (device.shadow_kernel imports
# lazily), leaking out of the transformation
_TWO52 = 1 << 52
_TWO53 = 1 << 53
_TWO54 = 1 << 54


def decompose(x: float) -> Tuple[int, int]:
    """Host-side: positive double x -> (m, k) with x = m * 2^-k,
    m in [2^52, 2^53); (0, 0) for 0.0."""
    if x == 0.0:
        return 0, 0
    assert x > 0.0 and math.isfinite(x)
    f, e = math.frexp(x)           # x = f * 2^e, f in [0.5, 1)
    m = int(f * (1 << 53))         # in [2^52, 2^53)
    return m, 53 - e


# significand of double(0.499), scaled so that 0.499... = C499_M54 * 2^-54
C499_M54 = decompose(0.499)[0]
assert decompose(0.499)[1] == 54


def bitlen(x: jnp.ndarray) -> jnp.ndarray:
    """Bit length of non-negative int64 (0 for 0), branch-free."""
    x = x.astype(I64)
    n = jnp.zeros_like(x)
    for s in (32, 16, 8, 4, 2, 1):
        big = x >= (jnp.int64(1) << jnp.int64(s))
        n = n + jnp.where(big, jnp.int64(s), jnp.int64(0))
        x = jnp.where(big, x >> jnp.int64(s), x)
    return n + jnp.where(x > 0, jnp.int64(1), jnp.int64(0))


def div_rn(S: jnp.ndarray, n: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(m, k) = round-to-nearest-even of S/n: RN(S/n) = m * 2^-k with
    m in [2^52, 2^53); S == 0 -> (0, 0).  Exact for 0 <= S < 2^62,
    1 <= n < 2^31 (the reference's (double)S / n is correctly rounded
    because both convert exactly: S < 2^53 in all call sites)."""
    S = S.astype(I64)
    n = n.astype(I64)
    bS = bitlen(S)
    bn = bitlen(n)
    k0 = jnp.int64(52) - bS + bn
    # fold negative shifts into the divisor: Q = floor(S*2^s / n'), s >= 0
    neg = jnp.maximum(-k0, 0)
    npr = n << neg                 # n' < 2^31 * 2^10 (k0 >= -10 for S < 2^62)
    s = jnp.maximum(k0, 0)
    Q = S // npr
    R = S % npr
    # chunked left shift of the remainder: R < n' <= 2^41, chunk <= 20 bits
    for i in range(5):             # 5*20 = 100 >= max shift (83)
        c = jnp.clip(s - 20 * i, 0, 20)
        Q = (Q << c) + ((R << c) // npr)
        R = (R << c) % npr
    # normalize to [2^52, 2^53): the estimate can be one bit low
    low = (Q < _TWO52) & (S > 0)
    up = (2 * R >= npr)
    Q = jnp.where(low, 2 * Q + jnp.where(up, 1, 0), Q)
    R = jnp.where(low, 2 * R - jnp.where(up, npr, 0), R)
    k = jnp.where(low, k0 + 1, k0)
    # round to nearest, ties to even
    rup = (2 * R > npr) | ((2 * R == npr) & ((Q & 1) == 1))
    m = Q + jnp.where(rup, 1, 0)
    ovf = m == _TWO53
    m = jnp.where(ovf, _TWO52, m)
    k = jnp.where(ovf, k - 1, k)
    m = jnp.where(S == 0, 0, m)
    k = jnp.where(S == 0, 0, k)
    return m, k


def plus499_trunc(S: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Exact ``(int64)((double)S / n + .499)`` for S >= 0, n >= 1
    (reference graph.c:141,170-172; all casts there are value-preserving).

    trunc(RN(RN(S/n) + c)) with c = double(0.499): the result is floor(d)
    or floor(d)+1; the carry happens iff the exact sum d + c clears the
    round-up threshold of the integer above floor(d)."""
    m, k = div_rn(S, n)
    # k <= 0: d = m << -k is an integer >= 2^52; +0.499 can never carry
    # (spacing >= 1 and c < 0.5 keeps d+c strictly below the midpoint)
    big = m << jnp.clip(-k, 0, 10)
    # k >= 54: d < 0.5 so d + c < 1 -> 0
    kc = jnp.clip(k, 1, 53)
    F = m >> kc
    frac = m - (F << kc)
    # T = 2^54 * (d + c - (F+1)), exact in int64
    T = (frac << (jnp.int64(54) - kc)) + jnp.int64(C499_M54) - _TWO54
    P = F + 1
    blP = bitlen(P)
    thr = jnp.where(P & (P - 1) == 0, P, jnp.int64(1) << blP)
    carry = T >= -thr
    res = jnp.where(k <= 0, big,
                    jnp.where(k >= 54, 0, F + jnp.where(carry, 1, 0)))
    return jnp.where(S == 0, 0, res)


def one_minus_div(s1: jnp.ndarray, mx: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(m, k) of ``RN(1.0 - RN(s1/mx))`` for 0 <= s1 <= mx, mx >= 1
    (the reference branch deficit, branch.c:72).  Returns m == 0 for an
    exact zero (s1 == mx)."""
    mq, kq = div_rn(s1, mx)        # q in [0, 1]; s1==0 -> (0,0)
    # q == 1 (m=2^52, k=52): r = 0
    # k == 53 (q in [0.5, 1)): Sterbenz, 1 - q exact: num = 2^53 - m
    num53 = _TWO53 - mq
    b53 = bitlen(num53)
    m_a = num53 << (jnp.int64(53) - b53)
    k_a = jnp.int64(53) + (jnp.int64(53) - b53)
    # k >= 54 (q < 0.5): r in (0.5, 1): mantissa = 2^53 - RN_int(m * 2^(53-k))
    sh = jnp.clip(kq - 53, 0, 30)
    t_int = mq >> sh
    rem = mq - (t_int << sh)
    half = jnp.where(sh > 0, jnp.int64(1) << (sh - 1), jnp.int64(1))
    # round t = t_int + rem/2^sh half-to-even OF THE RESULT (2^53 - t):
    # result parity == t parity, so ties round t to even as well
    t_up = (rem > half) | ((rem == half) & ((t_int & 1) == 1))
    t_r = t_int + jnp.where(t_up & (sh > 0), 1, 0)
    m_b = _TWO53 - t_r
    k_b = jnp.int64(53)
    ovf = m_b == _TWO53            # rounds to exactly 1.0
    m_b = jnp.where(ovf, _TWO52, m_b)
    k_b = jnp.where(ovf, jnp.int64(52), k_b)
    m = jnp.where(kq >= 54, m_b, m_a)
    k = jnp.where(kq >= 54, k_b, k_a)
    # q == 0 -> r = 1.0 exactly
    m = jnp.where(mq == 0, _TWO52, m)
    k = jnp.where(mq == 0, jnp.int64(52), k)
    # q == 1 -> r = 0.0
    one = (mq == _TWO52) & (kq == 52)
    m = jnp.where(one, 0, m)
    k = jnp.where(one, 0, k)
    return m, k


def gt_const(m: jnp.ndarray, k: jnp.ndarray, c: float) -> jnp.ndarray:
    """value(m, k) > c for a non-negative normalized double value and a
    host-side double constant c (any sign)."""
    if c < 0.0:
        return jnp.ones(m.shape, bool)
    if c == 0.0:
        return m > 0
    cm, ck = decompose(c)
    return (m > 0) & ((k < ck) | ((k == ck) & (m > cm)))


def lt_const(m: jnp.ndarray, k: jnp.ndarray, c: float) -> jnp.ndarray:
    """value(m, k) < c for a non-negative normalized double value and a
    host-side double constant c (any sign)."""
    if c <= 0.0:
        return jnp.zeros(m.shape, bool)
    cm, ck = decompose(c)
    return (m == 0) | (k > ck) | ((k == ck) & (m < cm))
