"""Per-kernel chip accounting at the 900k production shape (VERDICT r2 #1).

For each production device stage (bwt / mtf / rle2c) this reports, on the
real chip over the bench corpus blocks:

  - serialized exec ms/block (dispatch+sync per call) and the trivial-launch
    floor measured the same way, so launch overhead is separable,
  - pipelined ms/block (8 async calls in flight — the production regime),
  - active doubling rounds per block (the BWT's work is data-dependent),
  - analytic MINIMUM HBM traffic (each sort/scan operand read+written once)
    and the implied bandwidth as % of the chip's peak — i.e. how far the
    stage runs from a single-pass speed-of-light over its own operands.

The MXU is irrelevant to this codec's hot path (no matmuls in production;
the device-refine route's cost matmuls are opt-in), so "MFU" here is HBM
utilization — the resource the kernels are actually bound by.

Peak HBM bandwidth: v5e = 819 GB/s (public spec). Override with
TPUBZ_HBM_GBPS for other chips.
"""
import json
import os
import statistics
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
    _stage_rle2c,
    setup_jax_cache,
)
from tpubz.kernels.suffix_sort import PAD_RANK, ROUNDS

setup_jax_cache()

HBM_GBPS = float(os.environ.get("TPUBZ_HBM_GBPS", "819"))
MB = 1024 * 1024


@jax.jit
def _trivial(x):
    return x + jnp.uint8(1)


@jax.jit
def _active_rounds(data, n):
    """How many doubling rounds the convergence logic actually executes for
    this block (mirrors kernels/suffix_sort.py's loop; the write-back runs
    every round here — only the count matters)."""
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

    d0 = data.astype(jnp.int32)
    rank0 = (d0 << 16) | (shifted(d0, 1) << 8) | shifted(d0, 2)
    rank = jnp.where(valid, rank0, PAD_RANK)

    def body(i, carry):
        rank, k, done, prevd, cnt = carry
        r2 = jnp.where(valid, shifted(rank, k), PAD_RANK)
        r3 = jnp.where(valid, shifted(rank, 2 * k), PAD_RANK)
        r4 = jnp.where(valid, shifted(rank, 3 * k), PAD_RANK)
        a, b, c, d, order = jax.lax.sort((rank, r2, r3, r4, idx), num_keys=4)
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
        distinct = new_sorted[nn - 1] + 1
        done_now = (distinct == nn) | (distinct == prevd)
        _, nr = jax.lax.sort((order, new_sorted), num_keys=1)
        new_rank = jnp.where(done | done_now, rank, jnp.where(valid, nr, PAD_RANK))
        cnt = cnt + jnp.where(done, 0, 1)
        return (
            new_rank,
            k * 4,
            done | done_now,
            jnp.where(done, prevd, distinct),
            cnt,
        )

    _, _, _, _, cnt = jax.lax.fori_loop(
        0, ROUNDS, body, (rank, jnp.int32(3), n < 0, jnp.int32(-1), jnp.int32(0))
    )
    return cnt


def timed_serial(fn, argsets, trials=5):
    ts = []
    for _ in range(trials):
        t0 = time.time()
        for a in argsets:
            jax.block_until_ready(fn(*a))
        ts.append((time.time() - t0) / len(argsets) * 1000)
    return statistics.median(ts)


def timed_pipelined(fn, argsets, trials=5):
    ts = []
    for _ in range(trials):
        t0 = time.time()
        jax.block_until_ready([fn(*a) for a in argsets])
        ts.append((time.time() - t0) / len(argsets) * 1000)
    return statistics.median(ts)


def main():
    enc = DeviceBlockEncoder(9)
    N = enc.N
    corpus = build_corpus(8)
    arr = np.frombuffer(corpus, np.uint8)
    out, blocks = rle1_blocks(arr, block_budget(9))

    bwt_args, mtf_args, rle_args = [], [], []
    for (o0, o1, _, _) in blocks[:8]:
        pad = np.zeros(N, np.uint8)
        blk = out[o0:o1]
        pad[: blk.size] = blk
        d = jnp.asarray(pad)
        nn = np.int32(blk.size)
        key, last = _stage_bwt(d, nn)
        ranks, used = _stage_mtf(last, nn)
        bwt_args.append((d, nn))
        mtf_args.append((jnp.asarray(last), nn))
        rle_args.append((jnp.asarray(ranks), nn, jnp.asarray(used)))
    jax.block_until_ready([a for t in (bwt_args + mtf_args) for a in t])
    triv_args = [(a[0],) for a in bwt_args]

    rounds = [int(_active_rounds(*a)) for a in bwt_args]

    # warm every jit once before timing
    for fn, args in (
        (_trivial, triv_args),
        (_stage_bwt, bwt_args),
        (_stage_mtf, mtf_args),
        (_stage_rle2c, rle_args),
    ):
        jax.block_until_ready(fn(*args[0]))

    floor_s = timed_serial(_trivial, triv_args)
    floor_p = timed_pipelined(_trivial, triv_args)

    i32 = 4 * N / MB  # one 900k int32 operand in MB
    r_med = statistics.median(rounds)
    # minimum traffic models: every sort operand in+out once, every
    # scan/elementwise pass in+out once
    bwt_mb = r_med * (2 * 5 * i32 + 2 * 2 * i32 + 6 * i32) - 2 * 2 * i32
    # ^ per round: 5-operand doubling sort + 2-operand write-back sort +
    #   ~6 operand passes (rolls/where/flags/cumsum); last round skips the
    #   write-back under the early-stop
    mtf_mb = (2 + 2) * i32 + (3 + 3) * i32 + 3 * i32 + 2 * i32
    # ^ (sym,idx) sort + 3-operand sort back + dominance operand reads +
    #   ranks out (the (chunk x chunk) dominance products live in VMEM)
    rle_mb = 8 * 2 * i32

    rows = []
    for name, fn, args, mb_min in (
        ("bwt", _stage_bwt, bwt_args, bwt_mb),
        ("mtf", _stage_mtf, mtf_args, mtf_mb),
        ("rle2c", _stage_rle2c, rle_args, rle_mb),
    ):
        ser = timed_serial(fn, args)
        pipe = timed_pipelined(fn, args)
        exec_ms = max(ser - floor_s, 1e-3)
        gbps = mb_min / 1024 / (exec_ms / 1000)
        rows.append(
            {
                "stage": name,
                "serial_ms": round(ser, 1),
                "pipelined_ms": round(pipe, 1),
                "exec_ms_minus_floor": round(exec_ms, 1),
                "min_traffic_MB": round(mb_min, 1),
                "implied_GBps": round(gbps, 1),
                "pct_of_HBM_peak": round(100 * gbps / HBM_GBPS, 2),
            }
        )

    report = {
        "shape": N,
        "launch_floor_serial_ms": round(floor_s, 1),
        "launch_floor_pipelined_ms": round(floor_p, 1),
        "active_rounds_per_block": rounds,
        "active_rounds_median": r_med,
        "hbm_peak_GBps": HBM_GBPS,
        "stages": rows,
        "chain_pipelined_ms": round(sum(r["pipelined_ms"] for r in rows), 1),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
