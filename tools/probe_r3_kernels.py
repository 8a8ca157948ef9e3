"""Round-3 kernel probes, interleaved A/B on the real chip.

BWT variants vs production (tpubz/kernels/suffix_sort.py):
  pack64 — each doubling round sorts (r1<<31|r2, r3<<31|r4, idx) as TWO
           i64 keys instead of four i32 keys (5 operands -> 3), and the
           position-space write-back sorts ONE packed i64 (order<<21|rank)
           instead of two i32 operands.
  seed4  — initial rank packs FOUR bytes via the u32->i32 order-preserving
           top-bit flip (vs the 3-byte pack), k starts at 4: cover after
           round r is 4^(r+1) vs 3*4^r, worth ~1 convergence round.
  seed4_pack64 — both.

MTF: _stage_mtf with the Pallas dominance kernel (mtf_pallas.py) vs the jnp
dominance matrix, single-block shapes.

All variants are checked element-exact against production on every block
before timing. Timing = pipelined async dispatch over the 8MB bench corpus
blocks, medians of interleaved trials.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_corpus
from tpubz.format.constants import block_budget
from tpubz.hostref.rle1 import rle1_blocks
from tpubz.block.encode import (
    MTF_CHUNK,
    DeviceBlockEncoder,
    _stage_bwt,
    _stage_mtf,
    setup_jax_cache,
)
from tpubz.kernels.mtf import mtf_ranks
from tpubz.kernels.suffix_sort import PAD_RANK

setup_jax_cache()

TOPBIT = np.int32(np.uint32(0x80000000).view(np.int32))  # -2^31


def make_bwt(seed4: bool, pack64: bool):
    def bwt(data, n):
        N = data.shape[0]
        n = jnp.asarray(n, jnp.int32)
        idx = jnp.arange(N, dtype=jnp.int32)
        valid = idx < n
        nn = jnp.maximum(n, 1)

        def shifted(rank, k):
            kp = jnp.remainder(k, nn)
            a = jnp.roll(rank, -kp)
            b = jnp.roll(rank, nn - kp)
            return jnp.where(idx < nn - kp, a, b)

        def one_round(rank, k):
            r2 = jnp.where(valid, shifted(rank, k), PAD_RANK)
            r3 = jnp.where(valid, shifted(rank, 2 * k), PAD_RANK)
            r4 = jnp.where(valid, shifted(rank, 3 * k), PAD_RANK)
            if pack64:
                p12 = (rank.astype(jnp.int64) << 31) | r2.astype(jnp.int64)
                p34 = (r3.astype(jnp.int64) << 31) | r4.astype(jnp.int64)
                a, b, order = jax.lax.sort((p12, p34, idx), num_keys=2)
                flag = jnp.concatenate(
                    (
                        jnp.zeros(1, jnp.int32),
                        ((a[1:] != a[:-1]) | (b[1:] != b[:-1])).astype(
                            jnp.int32
                        ),
                    )
                )
                new_sorted = jnp.cumsum(flag)
                packed = (order.astype(jnp.int64) << 21) | new_sorted.astype(
                    jnp.int64
                )
                (ps,) = jax.lax.sort((packed,), num_keys=1)
                new_rank = (ps & ((1 << 21) - 1)).astype(jnp.int32)
            else:
                a, b, c, d, order = jax.lax.sort(
                    (rank, r2, r3, r4, idx), num_keys=4
                )
                flag = jnp.concatenate(
                    (
                        jnp.zeros(1, jnp.int32),
                        (
                            (a[1:] != a[:-1])
                            | (b[1:] != b[:-1])
                            | (c[1:] != c[:-1])
                            | (d[1:] != d[:-1])
                        ).astype(jnp.int32),
                    )
                )
                new_sorted = jnp.cumsum(flag)
                _, new_rank = jax.lax.sort((order, new_sorted), num_keys=1)
            return jnp.where(valid, new_rank, PAD_RANK), order

        d0 = data.astype(jnp.int32)
        if seed4:
            # 4-byte pack as UNSIGNED u32 (a signed i32 pack would need the
            # top-bit flip, and pack64's (r<<31)|r2 then sign-extends the
            # negative low field over the high one — the seed round gets its
            # own unsigned formulation instead); pad lanes use u32 max so
            # they sort last like PAD_RANK does for the dense rounds
            du = data.astype(jnp.uint32)
            p = (
                (du << 24)
                | (shifted(du, 1) << 16)
                | (shifted(du, 2) << 8)
                | shifted(du, 3)
            )
            U32MAX = jnp.uint32(0xFFFFFFFF)
            p = jnp.where(valid, p, U32MAX)
            # peel round 1 (cover 4 -> 16) on the unsigned keys
            p2 = jnp.where(valid, shifted(p, 4), U32MAX)
            p3 = jnp.where(valid, shifted(p, 8), U32MAX)
            p4 = jnp.where(valid, shifted(p, 12), U32MAX)
            if pack64:
                q12 = (p.astype(jnp.uint64) << 32) | p2.astype(jnp.uint64)
                q34 = (p3.astype(jnp.uint64) << 32) | p4.astype(jnp.uint64)
                a, b, sa = jax.lax.sort((q12, q34, idx), num_keys=2)
            else:
                a, b, c_, d_, sa = jax.lax.sort(
                    (p, p2, p3, p4, idx), num_keys=4
                )
            if pack64:
                neq = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
            else:
                neq = (
                    (a[1:] != a[:-1])
                    | (b[1:] != b[:-1])
                    | (c_[1:] != c_[:-1])
                    | (d_[1:] != d_[:-1])
                )
            flag = jnp.concatenate(
                (jnp.zeros(1, jnp.int32), neq.astype(jnp.int32))
            )
            new_sorted = jnp.cumsum(flag)
            if pack64:
                packed = (sa.astype(jnp.int64) << 21) | new_sorted.astype(
                    jnp.int64
                )
                (ps,) = jax.lax.sort((packed,), num_keys=1)
                rank = (ps & ((1 << 21) - 1)).astype(jnp.int32)
            else:
                _, rank = jax.lax.sort((sa, new_sorted), num_keys=1)
            rank = jnp.where(valid, rank, PAD_RANK)
            start, rounds = 1, 9
            init = (rank, jnp.int32(16), n < 0, sa)
        else:
            rank0 = (d0 << 16) | (shifted(d0, 1) << 8) | shifted(d0, 2)
            rank = jnp.where(valid, rank0, PAD_RANK)
            start, rounds = 0, 10
            init = (rank, jnp.int32(3), n < 0, idx + (rank & 0))

        def body(i, carry):
            rank, k, done, sa = carry
            new_rank, new_sa = jax.lax.cond(
                done,
                lambda r, s: (r, s),
                lambda r, s: one_round(r, k),
                rank,
                sa,
            )
            done2 = done | jnp.all(new_rank == rank)
            return new_rank, k * 4, done2, new_sa

        rank, _, _, sa = jax.lax.fori_loop(start, rounds, body, init)
        key = jnp.argmax((sa == 0) & valid).astype(jnp.int32)
        prev = jnp.where(sa == 0, n - 1, sa - 1)
        last = jnp.where(valid, data[prev], 0).astype(jnp.uint8)
        return key, last

    return bwt


@jax.jit
def g_mtf_pallas(last, n):
    return mtf_ranks(last, n, chunk=MTF_CHUNK, use_pallas=True)


def main():
    enc = DeviceBlockEncoder(9)
    N = enc.N
    du8 = jax.ShapeDtypeStruct((N,), jnp.uint8)
    sn = jax.ShapeDtypeStruct((), jnp.int32)

    enable_x64 = jax.enable_x64

    variants = {}
    for name, (s4, p64) in {
        "r2style": (False, False),  # round-2 production: position-space
        # fixpoint check (confirm round + write-back every round)
        "seed4": (True, False),
        "pack64": (False, True),
        "seed4_pack64": (True, True),
    }.items():
        t0 = time.time()
        fn = make_bwt(s4, p64)
        if p64:
            with enable_x64():
                variants[name] = jax.jit(fn).lower(du8, sn).compile()
        else:
            variants[name] = jax.jit(fn).lower(du8, sn).compile()
        print(f"{name} compiled {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    base = _stage_bwt.lower(du8, sn).compile()
    print(f"base (cache) {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    mtf_base = _stage_mtf.lower(du8, sn).compile()
    g_pal = g_mtf_pallas.lower(du8, sn).compile()
    print(f"mtf pair {time.time()-t0:.0f}s", flush=True)

    corpus = build_corpus(8)
    arr = np.frombuffer(corpus, np.uint8)
    out, blocks = rle1_blocks(arr, block_budget(9))
    ds = []
    for (o0, o1, _, _) in blocks[:8]:
        pad = np.zeros(N, np.uint8)
        blk = out[o0:o1]
        pad[: blk.size] = blk
        ds.append((jnp.asarray(pad), np.int32(blk.size)))
    for d, _ in ds:
        d.block_until_ready()

    # correctness: every variant element-exact vs production on every block
    lasts = []
    for d, nn in ds:
        k0, l0 = jax.device_get(base(d, nn))
        lasts.append((np.asarray(l0), np.int32(nn)))
        for name, g in variants.items():
            k1, l1 = jax.device_get(g(d, nn))
            assert int(k0) == int(k1), (name, int(k0), int(k1))
            np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1)), name
    print("bwt variants element-exact", flush=True)
    r0, u0 = jax.device_get(mtf_base(*[jnp.asarray(lasts[0][0]), lasts[0][1]]))
    r1, u1 = jax.device_get(g_pal(jnp.asarray(lasts[0][0]), lasts[0][1]))
    nn = int(lasts[0][1])
    np.testing.assert_array_equal(np.asarray(r0)[:nn], np.asarray(r1)[:nn])
    np.testing.assert_array_equal(np.asarray(u0), np.asarray(u1))
    print("pallas mtf element-exact", flush=True)

    def pipelined_bwt(g):
        t0 = time.time()
        rs = [g(d, nn) for d, nn in ds]
        for k, l in rs:
            jax.device_get(k)
        jax.block_until_ready([l for _, l in rs])
        return (time.time() - t0) / len(ds) * 1000

    def pipelined_mtf(g):
        t0 = time.time()
        rs = [g(jnp.asarray(l), nn) for l, nn in lasts]
        jax.block_until_ready(rs)
        return (time.time() - t0) / len(lasts) * 1000

    names = ["base"] + list(variants)
    gs = {"base": base, **variants}
    results = {k: [] for k in names}
    mtf_res = {"mtf_base": [], "mtf_pallas": []}
    for trial in range(5):
        for name in names:
            results[name].append(pipelined_bwt(gs[name]))
        mtf_res["mtf_base"].append(pipelined_mtf(mtf_base))
        mtf_res["mtf_pallas"].append(pipelined_mtf(g_pal))
        print(
            f"trial {trial}: "
            + " ".join(f"{k}={results[k][-1]:.1f}" for k in names)
            + " | "
            + " ".join(f"{k}={mtf_res[k][-1]:.1f}" for k in mtf_res),
            flush=True,
        )
    print("--- medians (ms/block, pipelined x8) ---")
    for k in names:
        print(f"{k}: {sorted(results[k])[2]:.1f}")
    for k in mtf_res:
        print(f"{k}: {sorted(mtf_res[k])[2]:.1f}")


if __name__ == "__main__":
    main()
