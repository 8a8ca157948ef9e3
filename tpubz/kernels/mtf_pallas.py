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
    before = jj < ii
    case1 = (jj > lp[:, :, None]) & (ln[:, None, :] >= ii)
    case2 = (lp[:, None, :] < 0) & (sr[:, None, :] >= sr[:, :, None])
    has_prev = (lp >= 0)[:, :, None]
    mat = before & jnp.where(has_prev, case1, case2)
    counts = jnp.sum(mat.astype(jnp.int32), axis=-1)
    lfirst = lp < 0
    out_ref[:] = counts + jnp.where(lfirst, sr, 0)


@functools.partial(jax.jit, static_argnames=("group",))
def dominance_ranks(lprev, lnext, srank, group: int = 8):
    """(nc, C) int32 inputs -> (nc, C) int32 MTF ranks."""
    nc, C = lprev.shape
    assert nc % group == 0, "nc must be a multiple of the chunk group"
    grid = (nc // group,)
    spec = pl.BlockSpec((group, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((nc, C), jnp.int32),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
    )(lprev, lnext, srank)
