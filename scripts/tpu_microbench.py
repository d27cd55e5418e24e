#!/usr/bin/env python3
"""Microbenchmarks of the candidate primitives for the device-resident
round schedule, at big-corpus shapes, on the real chip.

Answers (VERDICT r3 #2: measure BEFORE optimizing):
  * what one round's two big lax.sorts cost (walk_merge lean sort and the
    prop sort-join) vs the alternatives;
  * whether scatter-add/max into an arc-table-sized accumulator beats a
    global sort for the merge aggregates;
  * whether i32 keys / fewer operands / row-wise sorts matter on TPU.

Timing: on axon, block_until_ready does not block — every measurement
forces a 1-element np.asarray pull. Each case is best-of-3 after a warmup
(compile) rep.  Run: PYTHONPATH=/root/repo:$PYTHONPATH \
    python scripts/tpu_microbench.py [out.json]
"""
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_enable_x64", True)


def timed(fn, *args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)            # compile + warm
    _force(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        out = fn_j(*args)
        _force(out)
        best = min(best, time.monotonic() - t0)
    return best


def _force(out):
    leaves = jax.tree_util.tree_leaves(out)
    for x in leaves[:1]:
        np.asarray(x.ravel()[:1])


def main():
    # big-corpus shapes AFTER kept-row compaction (round 4): Gl=64
    # genomes, H=10240 kept hits, A=327680 arcs
    Gl, H, A = 64, 10240, 327680
    N = 2 * Gl * H
    rng = np.random.default_rng(0)
    S = 10000
    B = 15
    GB = 6
    vw = rng.integers(0, 2 * S, N).astype(np.int64)
    vw = (vw << B) | rng.integers(0, 2 * S, N).astype(np.int64)
    keys64 = (vw << GB) | rng.integers(0, Gl, N).astype(np.int64)
    s1 = rng.integers(0, 1 << 20, N).astype(np.int32)
    jo = np.arange(N, dtype=np.int32)
    kk64 = jnp.asarray(keys64)
    vw32 = jnp.asarray(vw.astype(np.int32))
    gen32 = jnp.asarray((keys64 & ((1 << GB) - 1)).astype(np.int32))
    s1j = jnp.asarray(s1)
    joj = jnp.asarray(jo)
    idxA = jnp.asarray(rng.integers(0, A, N).astype(np.int32))
    valsA = jnp.asarray(rng.integers(0, 3, A).astype(np.int32))
    rows2d = jnp.asarray(rng.integers(0, Gl, N).astype(np.int32))

    res = {"backend": jax.default_backend(),
           "device": str(jax.devices()[0].device_kind),
           "shape": {"Gl": Gl, "H": H, "A": A, "N": N}}

    cases = {}
    # 1. the current walk_merge lean sort: i64 key + 1 i32 operand
    cases["sort_i64_1op"] = timed(
        lambda k, v: lax.sort((k, v), num_keys=1), kk64, s1j)
    # 1b. + origin operand (the pair->arc-idx variant)
    cases["sort_i64_2op"] = timed(
        lambda k, v, o: lax.sort((k, v, o), num_keys=1), kk64, s1j, joj)
    # 2. the current prop sort-join: i64 key + tag key + 2 operands, N+A rows
    NJ = A + N
    jk = jnp.concatenate([kk64[:A], kk64])
    jt = jnp.concatenate([jnp.zeros(A, jnp.int32), jnp.ones(N, jnp.int32)])
    jp = jnp.concatenate([valsA, jnp.zeros(N, jnp.int32)])
    jo2 = jnp.arange(NJ, dtype=jnp.int32)
    cases["sort_prop_join_4op"] = timed(
        lambda a, b, c, d: lax.sort((a, b, c, d), num_keys=2), jk, jt, jp, jo2)
    # 3. two i32 keys instead of one i64
    cases["sort_2xi32_1op"] = timed(
        lambda a, b, v: lax.sort((a, b, v), num_keys=2), vw32, gen32, s1j)
    # 3b. single i32 key (vw only)
    cases["sort_i32_1op"] = timed(
        lambda a, v: lax.sort((a, v), num_keys=1), vw32, s1j)
    # 4. row-wise sort [Gl, 2H] i32 key + operand
    k2d = vw32.reshape(Gl, 2 * H)
    v2d = s1j.reshape(Gl, 2 * H)
    cases["rowsort_i32_1op"] = timed(
        lambda a, v: lax.sort((a, v), dimension=1, num_keys=1), k2d, v2d)
    # 4b. THE production per-round merge sort: ONE flat i64 array, no
    # payload (walk_merge lean path) — the 5.65 s/16-round block on chip
    cases["sort_lean_1d_i64"] = timed(lambda k: lax.sort(k), kk64)
    # 4c/4d. the same keys as a BATCHED lane sort (columnsort candidate:
    # Leighton's 8-pass columnsort over [c, N/c] lane sorts would replace
    # the 1D sort with ~4 of these + fixed permutations; worth building
    # only if a batched lane sort is >> 4x cheaper per element)
    for c in (8, 64):
        cases["sort_rows%d_i64" % c] = timed(
            lambda k, c=c: lax.sort(k.reshape(c, N // c), dimension=1),
            kk64)
    # 4e. i64 1D sort at half N (what kept-row compaction bought)
    cases["sort_lean_1d_i64_halfN"] = timed(
        lambda k: lax.sort(k[:N // 2]), kk64)
    # 4f. 1D i32 sort at N (dtype effect on the bitonic network)
    cases["sort_lean_1d_i32"] = timed(lambda k: lax.sort(k), vw32)
    # 5. scatter-add N updates into [A]
    cases["scatter_add_flat"] = timed(
        lambda i, v: jnp.zeros(A, jnp.int32).at[i].add(v, mode="drop"),
        idxA, s1j)
    # 5b. scatter-max into [Gl, A] plane (the dict-aggregate candidate)
    cases["scatter_max_plane"] = timed(
        lambda r, i, v: jnp.full((Gl, A), -1, jnp.int32)
        .at[r, i].max(v, mode="drop"), rows2d, idxA, s1j)
    # 5c. reduce the [Gl, A] plane (ng + s1s)
    plane = jnp.full((Gl, A), -1, jnp.int32).at[rows2d, idxA].max(
        s1j, mode="drop")
    plane = jax.block_until_ready(plane)
    cases["plane_reduce"] = timed(
        lambda p: ((p >= 0).sum(0, dtype=jnp.int32),
                   jnp.maximum(p, 0).sum(0, dtype=jnp.int64)), plane)
    # 6. gather N from [A]
    cases["gather_flat"] = timed(lambda v, i: v[i], valsA, idxA)
    # 6b. gather [Gl, H] from [A] (the prop replacement)
    idx2d = idxA[:Gl * H].reshape(Gl, H)
    cases["gather_GlH_from_A"] = timed(lambda v, i: v[i], valsA, idx2d)
    # 7. segment ops over sorted [N] (the existing merge aggregates)
    sk, ss = lax.sort((kk64, s1j), num_keys=1)
    sk, ss = jax.block_until_ready((sk, ss))

    def seg_aggr(sk, ss):
        va = sk < (1 << 62)
        pk = jnp.concatenate([jnp.array([-1], jnp.int64), sk[:-1]])
        new = va & (sk != pk)
        sid = jnp.clip(jnp.cumsum(new.astype(jnp.int32)) - 1, 0, N - 1)
        mx = jax.ops.segment_max(jnp.where(va, ss, 0), sid, num_segments=N)
        return mx

    cases["segment_aggr_N"] = timed(seg_aggr, sk, ss)
    # 8. associative_scan cummax over [Gl, H] (kept_pairs cost)
    km = jnp.asarray(rng.integers(-1, H, (Gl, H)).astype(np.int32))
    cases["assoc_scan_GlH"] = timed(
        lambda x: lax.associative_scan(jnp.maximum, x, axis=1), km)
    # 9. the shadow sweep at big shape (W=32, K=8) for one round
    from pangene_tpu.ops import device as dev
    K, W = 8, 8    # post-compaction big-shape band
    sc = dev.SweepCols(
        valid=jnp.ones((Gl, H), bool),
        cid=jnp.asarray(rng.integers(0, 40, (Gl, H)).astype(np.int32)),
        cs=jnp.asarray(np.sort(rng.integers(0, 1 << 27, (Gl, H))).astype(np.int64)),
        ce=jnp.asarray(rng.integers(0, 1 << 27, (Gl, H)).astype(np.int64)),
        flt=jnp.zeros((Gl, H), bool),
        rev=jnp.zeros((Gl, H), jnp.int32),
        rank=jnp.zeros((Gl, H), jnp.int32),
        gid=jnp.asarray(rng.integers(0, S, (Gl, H)).astype(np.int32)),
        pscore=jnp.asarray(rng.integers(0, 1 << 40, (Gl, H)).astype(np.uint64)),
        weak_br=jnp.zeros((Gl, H), jnp.int32),
        cds_len=jnp.asarray(rng.integers(1, 3000, (Gl, H)).astype(np.int32)),
        ex_os=jnp.asarray(rng.integers(0, 1 << 27, (Gl, H, K)).astype(np.int64)),
        ex_oe=jnp.asarray(rng.integers(0, 1 << 27, (Gl, H, K)).astype(np.int64)))
    cases["shadow_sweep_big"] = timed(
        lambda c: jax.vmap(lambda cc: dev.shadow_kernel(
            cc, 0.5, W=W, check_strand=False))(c), sc)
    res["cases_s"] = {k: round(v, 4) for k, v in cases.items()}
    print(json.dumps(res, indent=1))
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "TPU_MICROBENCH.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
