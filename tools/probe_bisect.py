"""Bisect the production stages' in-graph cost (real chip, dependent chains).

probe_marginal.py shows each stage costs 10-18 ms in-graph while its
constituent sorts/scans/reduces sum to <5 ms. This probe bisects each stage
into cumulative fragments (same dependent-chain + scalar-device_get method,
immune to relay async artifacts) plus in-graph scatter/gather primitives the
other probe skipped, so the mystery cost gets a name.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tpubz.block.encode import MTF_CHUNK, setup_jax_cache
from tpubz.kernels.mtf import _prev_next, ABSENT
from tpubz.kernels.rle2 import num_digits

setup_jax_cache()

N = 900096
CH = MTF_CHUNK
NC = N // CH


def timeit(fn, x, n, trials=5):
    jax.device_get(fn(x, n))
    ts = []
    for _ in range(trials):
        t0 = time.time()
        jax.device_get(fn(x, n))
        ts.append((time.time() - t0) * 1000)
    return statistics.median(ts)


_RNG = np.random.default_rng(0)
_DATA = None
_NV = None


def _inputs():
    global _DATA, _NV
    if _DATA is None:
        _DATA = jnp.asarray(_RNG.integers(0, 256, N, dtype=np.uint8))
        _NV = jnp.int32(N - 96)
        jax.block_until_ready(_DATA)
    return _DATA, _NV


def make(body, k):
    @jax.jit
    def f(d, n):
        acc = jnp.int32(0)
        for i in range(k):
            s, d = body(d, n, i)
            acc = acc + s.astype(jnp.int32)
        return acc
    return f


def warm_all(cases, ks=(1, 3)):
    """Compile every graph concurrently — the remote compile service
    parallelizes across requests, while serial jit calls pay each compile's
    minutes one after another."""
    from concurrent.futures import ThreadPoolExecutor

    data, nv = _inputs()
    fns = {}
    with ThreadPoolExecutor(max_workers=8) as pool:
        futs = {}
        for name, body in cases:
            for k in ks:
                f = make(body, k)
                fns[(name, k)] = f
                futs[(name, k)] = pool.submit(
                    lambda fn=f: jax.device_get(fn(data, nv))
                )
        for key, fut in futs.items():
            fut.result()
            print(f"warm {key[0]} k={key[1]}", flush=True)
    return fns


def marginal(name, fns, ks=(1, 3)):
    data, nv = _inputs()
    t = {k: timeit(fns[(name, k)], data, nv) for k in ks}
    k1, k2 = ks
    marg = (t[k2] - t[k1]) / (k2 - k1)
    print(f"{name:34s} marginal={marg:7.2f} ms/iter", flush=True)
    return marg


# ---- in-graph scatter/gather primitives -----------------------------------

def p_scatter_monotone(d, n, i):
    idx = jnp.arange(N, dtype=jnp.int32)
    tgt = idx  # monotone identity-ish targets
    out = jnp.full(N + 8, -1, jnp.int32).at[tgt].set(d.astype(jnp.int32) + i, mode="drop")
    return out[0], (out[:N] % 256).astype(jnp.uint8)


def p_scatter_random(d, n, i):
    x = d.astype(jnp.int32)
    tgt = (x * 7919 + jnp.arange(N, dtype=jnp.int32)) % N
    out = jnp.zeros(N, jnp.int32).at[tgt].set(x + i, mode="drop")
    return out[0], (out % 256).astype(jnp.uint8)


def p_scatter_max_small(d, n, i):
    x = d.astype(jnp.int32)
    idx = jnp.arange(N, dtype=jnp.int32)
    out = (
        jnp.full((NC, 257), -1, jnp.int32)
        .at[idx // CH, x % 257]
        .max(idx + i, mode="drop")
    )
    return out[0, 0], ((d.astype(jnp.int32) + out[0, 1]) % 256).astype(jnp.uint8)


def p_gather(d, n, i):
    x = d.astype(jnp.int32)
    src = x * 3 + jnp.arange(N, dtype=jnp.int32)
    g = src[(x * 7919 + i) % N]
    return g[0], (g % 256).astype(jnp.uint8)


def p_gather_small_table(d, n, i):
    table = jnp.arange(257, dtype=jnp.int32) * 3 + i
    g = table[d.astype(jnp.int32) % 257]
    return g[0], (g % 256).astype(jnp.uint8)


def p_assoc_scan(d, n, i):
    x = d.astype(jnp.int32) + i
    s = jax.lax.associative_scan(jnp.maximum, x)
    return s[-1], (s % 256).astype(jnp.uint8)


def p_concat_shift(d, n, i):
    x = d.astype(jnp.int32)
    y = jnp.concatenate((jnp.zeros(1, jnp.int32), x[:-1] + i))
    return y[-1], (y % 256).astype(jnp.uint8)


# ---- MTF fragments ---------------------------------------------------------

def m1_prevnext(d, n, i):
    idx = jnp.arange(N, dtype=jnp.int32)
    sym = jnp.where(idx < n, d.astype(jnp.int32), 256) + (i & 0)
    s_key, s_idx, prev_g, next_g = _prev_next(sym, idx, N)
    return prev_g[0] + next_g[0], ((prev_g + next_g + i) % 256).astype(jnp.uint8)


def m2_lastpos(d, n, i):
    idx = jnp.arange(N, dtype=jnp.int32)
    sym = jnp.where(idx < n, d.astype(jnp.int32), 256) + (i & 0)
    s_sym, s_idx, prev_g, next_g = _prev_next(sym, idx, N)
    s_cid = s_idx // CH
    nxt_diff = jnp.concatenate(
        ((s_sym[1:] != s_sym[:-1]) | (s_cid[1:] != s_cid[:-1]), jnp.ones(1, jnp.bool_))
    )
    tgt_c = jnp.where(nxt_diff, s_cid, NC)
    tgt_s = jnp.where(nxt_diff, s_sym, 0)
    last_pos = (
        jnp.full((NC, 257), -1, jnp.int32).at[tgt_c, tgt_s].max(s_idx, mode="drop")
    )
    run = jax.lax.associative_scan(jnp.maximum, last_pos, axis=0)
    used = run[-1, :256] >= 0
    init_rank = jnp.where(used, jnp.cumsum(used.astype(jnp.int32)) - 1, ABSENT)
    last_before = jnp.concatenate(
        (jnp.full((1, 256), -1, jnp.int32), run[:-1, :256]), axis=0
    )
    keyrow = jnp.where(last_before >= 0, N - last_before, 2 * N + init_rank[None, :])
    s = keyrow[0, 0] + prev_g[0]
    return s, ((prev_g + next_g + keyrow[0, 0] + i) % 256).astype(jnp.uint8)


def m3_parts(d, n, i):
    idx = jnp.arange(N, dtype=jnp.int32)
    sym = jnp.where(idx < n, d.astype(jnp.int32), 256) + (i & 0)
    s_sym, s_idx, prev_g, next_g = _prev_next(sym, idx, N)
    s_cid = s_idx // CH
    nxt_diff = jnp.concatenate(
        ((s_sym[1:] != s_sym[:-1]) | (s_cid[1:] != s_cid[:-1]), jnp.ones(1, jnp.bool_))
    )
    tgt_c = jnp.where(nxt_diff, s_cid, NC)
    tgt_s = jnp.where(nxt_diff, s_sym, 0)
    last_pos = (
        jnp.full((NC, 257), -1, jnp.int32).at[tgt_c, tgt_s].max(s_idx, mode="drop")
    )
    run = jax.lax.associative_scan(jnp.maximum, last_pos, axis=0)
    used = run[-1, :256] >= 0
    init_rank = jnp.where(used, jnp.cumsum(used.astype(jnp.int32)) - 1, ABSENT)
    last_before = jnp.concatenate(
        (jnp.full((1, 256), -1, jnp.int32), run[:-1, :256]), axis=0
    )
    keyrow = jnp.where(last_before >= 0, N - last_before, 2 * N + init_rank[None, :])
    cid = idx // CH
    cstart = cid * CH
    irank_ext = jnp.concatenate((init_rank, jnp.full(1, ABSENT, jnp.int32)))
    keyi = jnp.where(prev_g >= 0, N - prev_g, 2 * N + irank_ext[sym]).reshape(NC, CH)
    lprev = jnp.where(prev_g >= cstart, prev_g - cstart, -1).reshape(NC, CH)
    lnext = jnp.where(next_g < cstart + CH, next_g - cstart, CH).reshape(NC, CH)
    s = keyi[0, 0] + lprev[0, 0] + lnext[0, 0] + keyrow[0, 0]
    nxt = (keyi.reshape(N) + lprev.reshape(N) + lnext.reshape(N) + i) % 256
    return s, nxt.astype(jnp.uint8)


def m4_dominance_only(d, n, i):
    """Just _ranks_from_parts on synthetic (NC, CH)/(NC, 256) inputs."""
    from tpubz.kernels.mtf import _ranks_from_parts

    x = d.astype(jnp.int32)
    lprev = (x.reshape(NC, CH) % (CH + 7)) - 7 + (i & 0)
    lnext = (x.reshape(NC, CH) * 3) % (CH + 1)
    keyi = x.reshape(NC, CH) * 5 + 11
    keyrow = (x[: NC * 256].reshape(NC, 256) * 7) % (2 * N)
    r = _ranks_from_parts(lprev, lnext, keyi, keyrow, CH, False)
    return r[0, 0], ((r.reshape(N) + i) % 256).astype(jnp.uint8)


# ---- RLE2 fragments --------------------------------------------------------

def r1_scans(d, n, i):
    ranks = d.astype(jnp.int32)
    idx = jnp.arange(N, dtype=jnp.int32)
    valid = idx < n
    nonzero = valid & (ranks != 0)
    nz_idx = jnp.where(nonzero, idx, -1)
    last_nz = jax.lax.associative_scan(jnp.maximum, nz_idx)
    prev_nz = jnp.concatenate((jnp.full(1, -1, jnp.int32), last_nz[:-1]))
    run_before = jnp.where(nonzero, idx - prev_nz - 1, 0)
    dg = num_digits(run_before)
    emit = jnp.where(nonzero, dg + 1, 0)
    off = jnp.cumsum(emit) - emit
    total_body = jnp.sum(emit)
    s = off[0] + total_body
    return s, ((off + run_before + i) % 256).astype(jnp.uint8)


def r2_stamp(d, n, i):
    ranks = d.astype(jnp.int32)
    OUT = N + 8
    idx = jnp.arange(N, dtype=jnp.int32)
    valid = idx < n
    nonzero = valid & (ranks != 0)
    nz_idx = jnp.where(nonzero, idx, -1)
    last_nz = jax.lax.associative_scan(jnp.maximum, nz_idx)
    prev_nz = jnp.concatenate((jnp.full(1, -1, jnp.int32), last_nz[:-1]))
    run_before = jnp.where(nonzero, idx - prev_nz - 1, 0)
    dg = num_digits(run_before)
    emit = jnp.where(nonzero, dg + 1, 0)
    off = jnp.cumsum(emit) - emit
    total_body = jnp.sum(emit)
    tgt = jnp.where(nonzero, off, OUT)
    stamped = jnp.full(OUT, -1, jnp.int32).at[tgt].set(idx, mode="drop")
    e_pos = jax.lax.associative_scan(jnp.maximum, stamped)
    s = e_pos[0] + total_body
    return s, ((e_pos[:N] + i) % 256).astype(jnp.uint8)


def r3_gathers(d, n, i):
    ranks = d.astype(jnp.int32)
    OUT = N + 8
    idx = jnp.arange(N, dtype=jnp.int32)
    valid = idx < n
    nonzero = valid & (ranks != 0)
    nz_idx = jnp.where(nonzero, idx, -1)
    last_nz = jax.lax.associative_scan(jnp.maximum, nz_idx)
    prev_nz = jnp.concatenate((jnp.full(1, -1, jnp.int32), last_nz[:-1]))
    run_before = jnp.where(nonzero, idx - prev_nz - 1, 0)
    dg = num_digits(run_before)
    emit = jnp.where(nonzero, dg + 1, 0)
    off = jnp.cumsum(emit) - emit
    total_body = jnp.sum(emit)
    tgt = jnp.where(nonzero, off, OUT)
    run1 = run_before + 1
    stamped = jnp.full(OUT, -1, jnp.int32).at[tgt].set(idx, mode="drop")
    e_pos = jax.lax.associative_scan(jnp.maximum, stamped)
    ep = jnp.clip(e_pos, 0, N - 1)
    payload = (run1 << 9) | (ranks + 1)
    g_pay = payload[ep]
    e_off_f = jnp.where(e_pos >= 0, off[ep], -1)
    s = g_pay[0] + e_off_f[0] + total_body
    return s, ((g_pay[:N] + e_off_f[:N] + i) % 256).astype(jnp.uint8)


CASES = [
    ("scatter set monotone 900k", p_scatter_monotone),
    ("scatter set random 900k", p_scatter_random),
    ("scatter-max (nc,257)", p_scatter_max_small),
    ("gather 900k", p_gather),
    ("gather small-table 900k", p_gather_small_table),
    ("assoc_scan max 1D", p_assoc_scan),
    ("concat shift", p_concat_shift),
    ("m1 prev/next sorts", m1_prevnext),
    ("m2 + last_pos/scan/keyrow", m2_lastpos),
    ("m3 + keyi/lprev/lnext", m3_parts),
    ("m4 dominance only", m4_dominance_only),
    ("r1 scans", r1_scans),
    ("r2 + stamp scatter + fill", r2_stamp),
    ("r3 + gathers", r3_gathers),
]


def main():
    fns = warm_all(CASES)
    for name, _ in CASES:
        marginal(name, fns)


if __name__ == "__main__":
    main()
