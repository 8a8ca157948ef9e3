"""Probe: sortless MTF formulation vs the production two-sort one.

The production mtf_ranks pays two 900k variadic sorts (the (sym, idx) sort
and the 3-operand sort back to position space) to derive global prev/next
occurrences. But the consumers only ever need:
  - lprev/lnext IN CHUNK-LOCAL coordinates  -> a (nc, chunk, chunk) masked
    max/min over the symbol-equality matrix (same cost class as the
    dominance reduction the kernel already runs, which the chunk-size probe
    showed is NOT the bottleneck);
  - keyi at first-in-chunk positions only  -> exactly keyrow[cid, sym],
    one take_along_axis gather;
  - last_pos (per-chunk per-symbol last occurrence) -> positions with
    lnext == chunk are last-in-chunk for their symbol: unique scatter
    targets without the global sort.

If the sorts+scan/scatter are the MTF cost (per probe_mtf_chunk.py), this
drops both sorts for ~2 extra chunk^2 reduction passes.

Usage: python tools/probe_mtf_sortless.py [cpu]
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os

if "cpu" in sys.argv[1:]:
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax
import jax.numpy as jnp

from tpubz.kernels.mtf import ABSENT, _ranks_from_parts, mtf_ranks
from tpubz.block.encode import setup_jax_cache

setup_jax_cache()


def mtf_ranks_sortless(last, n, chunk=256, one_hot_lastpos=False):
    N = last.shape[0]
    assert N % chunk == 0
    nc = N // chunk
    idx = jnp.arange(N, dtype=jnp.int32)
    valid = idx < n
    sym = jnp.where(valid, last.astype(jnp.int32), 256)
    symc = sym.reshape(nc, chunk)
    idxc = idx.reshape(nc, chunk)

    li = jnp.arange(chunk, dtype=jnp.int32)
    ii = li[None, :, None]
    jj = li[None, None, :]
    eq = symc[:, :, None] == symc[:, None, :]
    lprev = jnp.max(jnp.where(eq & (jj < ii), jj, -1), axis=-1)
    lnext = jnp.min(jnp.where(eq & (jj > ii), jj, chunk), axis=-1)

    if one_hot_lastpos:
        onehot = symc[:, :, None] == jnp.arange(257, dtype=jnp.int32)[None, None, :]
        last_pos = jnp.max(
            jnp.where(onehot, idxc[:, :, None], -1), axis=1
        )
    else:
        cid_r = jnp.broadcast_to(jnp.arange(nc, dtype=jnp.int32)[:, None], (nc, chunk))
        is_last = lnext == chunk
        tgt_c = jnp.where(is_last, cid_r, nc)
        last_pos = (
            jnp.full((nc, 257), -1, jnp.int32)
            .at[tgt_c, symc]
            .max(idxc, mode="drop")
        )

    run = jax.lax.associative_scan(jnp.maximum, last_pos, axis=0)
    used = run[-1, :256] >= 0
    init_rank = jnp.where(used, jnp.cumsum(used.astype(jnp.int32)) - 1, ABSENT)
    last_before = jnp.concatenate(
        (jnp.full((1, 256), -1, jnp.int32), run[:-1, :256]), axis=0
    )
    keyrow = jnp.where(
        last_before >= 0, N - last_before, 2 * N + init_rank[None, :]
    )
    keyrow_ext = jnp.concatenate(
        (keyrow, jnp.full((nc, 1), 2 * N + ABSENT, jnp.int32)), axis=1
    )
    keyi = jnp.take_along_axis(keyrow_ext, symc, axis=1)
    ranks = _ranks_from_parts(lprev, lnext, keyi, keyrow, chunk, False)
    return ranks.reshape(N), used


@jax.jit
def sortless(last, n):
    return mtf_ranks_sortless(last, n)


@jax.jit
def sortless_oh(last, n):
    return mtf_ranks_sortless(last, n, one_hot_lastpos=True)


@jax.jit
def current(last, n):
    return mtf_ranks(last, n, chunk=256)


def cpu_exactness():
    rng = np.random.default_rng(0)
    for trial in range(6):
        N = 4096
        n = int(rng.integers(1, N + 1))
        if trial % 3 == 0:
            data = rng.integers(0, 256, N).astype(np.uint8)
        elif trial % 3 == 1:
            data = rng.integers(0, 4, N).astype(np.uint8)
        else:
            data = np.zeros(N, np.uint8)
            data[:: 7] = rng.integers(0, 256, data[::7].size)
        l = jnp.asarray(data)
        nn = jnp.int32(n)
        r0, u0 = current(l, nn)
        for f in (sortless, sortless_oh):
            r1, u1 = f(l, nn)
            assert bool(jnp.all(r0[:n] == r1[:n])), f"{f.__name__} trial {trial}"
            assert bool(jnp.all(u0 == u1)), f"{f.__name__} used trial {trial}"
    print("exactness OK (6 regimes x 3 variants)")


def chip_timing():
    from bench import build_corpus
    from tpubz.format.constants import block_budget
    from tpubz.hostref.rle1 import rle1_blocks
    from tpubz.block.encode import DeviceBlockEncoder, _stage_bwt

    enc = DeviceBlockEncoder(9)
    N = enc.N
    for f, nm in ((sortless, "sortless"), (sortless_oh, "sortless_oh"), (current, "current")):
        t0 = time.time()
        f.lower(
            jax.ShapeDtypeStruct((N,), jnp.uint8),
            jax.ShapeDtypeStruct((), jnp.int32),
        ).compile()
        print(f"{nm} compiled {time.time()-t0:.0f}s", flush=True)

    corpus = build_corpus(8)
    arr = np.frombuffer(corpus, np.uint8)
    out, blocks = rle1_blocks(arr, block_budget(9))
    lasts = []
    for (o0, o1, _, _) in blocks[:8]:
        pad = np.zeros(N, np.uint8)
        blk = out[o0:o1]
        pad[: blk.size] = blk
        key, last = _stage_bwt(jnp.asarray(pad), jnp.int32(blk.size))
        lasts.append((last, jnp.int32(blk.size)))
    for l, _ in lasts:
        l.block_until_ready()

    for f, nm in ((current, "current"), (sortless, "sortless"), (sortless_oh, "sortless_oh")):
        rs = [f(l, n) for l, n in lasts]
        for r in rs:
            jax.device_get(r[1])
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            rs = [f(l, n) for l, n in lasts]
            for r in rs:
                jax.device_get(r[1])
            best = min(best, (time.time() - t0) / len(lasts))
        print(f"{nm}: {best*1e3:.1f} ms/block pipelined", flush=True)

    for l, n in lasts[:3]:
        r0, u0 = current(l, n)
        r1, u1 = sortless(l, n)
        nn = int(n)
        assert bool(jnp.all(r0[:nn] == r1[:nn])) and bool(jnp.all(u0 == u1))
    print("sortless matches current on real blocks")


if __name__ == "__main__":
    cpu_exactness()
    if "cpu" not in sys.argv[1:]:
        chip_timing()
