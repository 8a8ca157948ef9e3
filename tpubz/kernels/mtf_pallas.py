"""Pallas kernel for the MTF within-chunk dominance count.

The jnp formulation of the (chunk x chunk) boolean dominance matrix
materializes ~half-GB of intermediates in HBM per 900k block; this kernel
streams G chunks per grid step through VMEM and reduces in-register, so HBM
traffic drops to the (nc, C) inputs/outputs. Semantics identical to the
matrix expression in tpubz/kernels/mtf.py:mtf_ranks:

  prev in-chunk:     count_i = #{j < i : j > prev_i, next_j >= i}
  prev out-of-chunk: count_i = #{j < i : first_j, srank_j >= srank_i}
  ranks = count + (first_i ? srank_i : 0)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(lprev_ref, lnext_ref, srank_ref, out_ref):
    lp = lprev_ref[:]  # (G, C)
    ln = lnext_ref[:]
    sr = srank_ref[:]
    G, C = lp.shape
    ii = jax.lax.broadcasted_iota(jnp.int32, (G, C, C), 1)  # row: position i
    jj = jax.lax.broadcasted_iota(jnp.int32, (G, C, C), 2)  # col: candidate j
    # Mosaic constraints: insert minor dims on int32 operands (not i1), and
    # select on int32 values (select_n on i1 vectors fails to lower) — so
    # masks are materialized as 0/1 int32 and combined by multiply.
    before = (jj < ii).astype(jnp.int32)
    case1 = ((jj > lp[:, :, None]) & (ln[:, None, :] >= ii)).astype(jnp.int32)
    case2 = (
        (lp[:, None, :] < 0) & (sr[:, None, :] >= sr[:, :, None])
    ).astype(jnp.int32)
    has_prev = lp[:, :, None] >= 0
    mat = before * jnp.where(has_prev, case1, case2)
    counts = jnp.sum(mat, axis=-1)
    lfirst = lp < 0
    out_ref[:] = counts + jnp.where(lfirst, sr, 0)


@functools.partial(jax.jit, static_argnames=("group",))
def dominance_ranks(lprev, lnext, srank, group: int = 8):
    """(nc, C) int32 inputs -> (nc, C) int32 MTF ranks.

    Mosaic requires the block sublane dim divisible by 8; chunk rows are
    padded up to the group multiple (pad rows compute garbage, sliced off).
    """
    nc, C = lprev.shape
    pad = (-nc) % group
    if pad:
        zrow = jnp.zeros((pad, C), jnp.int32)
        lprev = jnp.concatenate((lprev, zrow - 1))
        lnext = jnp.concatenate((lnext, zrow))
        srank = jnp.concatenate((srank, zrow))
    npad = nc + pad
    grid = (npad // group,)
    spec = pl.BlockSpec((group, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((npad, C), jnp.int32),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        # CPU (tests / virtual mesh): run the kernel in the interpreter —
        # semantics identical, Mosaic lowering is TPU-only
        interpret=(jax.default_backend() == "cpu"),
    )(lprev, lnext, srank)
    return out[:nc]
