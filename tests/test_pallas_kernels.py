"""Pallas kernels validated in interpreter mode on the CPU mesh.

The interpreter checks semantics against the jnp formulations they replace.
The production MTF stage uses the jnp formulation by default (the Pallas
kernel compiles and matches on real TPU but measured no faster there --
see PERFORMANCE.md); enabling it via mtf_ranks(use_pallas=True) is covered
by these semantic tests plus the TPU measurement protocol in the bench.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from tpubz.kernels import mtf_pallas


def _jnp_dominance(lprev, lnext, srank):
    nc, C = lprev.shape
    li = jnp.arange(C, dtype=jnp.int32)
    ii = li[None, :, None]
    jj = li[None, None, :]
    before = jj < ii
    case1 = (jj > lprev[:, :, None]) & (lnext[:, None, :] >= ii)
    case2 = (lprev[:, None, :] < 0) & (srank[:, None, :] >= srank[:, :, None])
    has_prev = (lprev >= 0)[:, :, None]
    mat = before & jnp.where(has_prev, case1, case2)
    counts = jnp.sum(mat, axis=-1, dtype=jnp.int32)
    return counts + jnp.where(lprev < 0, srank, 0)


def test_mtf_dominance_kernel_interpret(rng):
    nc, C, group = 16, 128, 8
    lprev = rng.integers(-1, C, (nc, C)).astype(np.int32)
    lnext = rng.integers(0, C + 1, (nc, C)).astype(np.int32)
    srank = rng.integers(0, 256, (nc, C)).astype(np.int32)
    spec = pl.BlockSpec((group, C), lambda i: (i, 0))
    got = pl.pallas_call(
        mtf_pallas._kernel,
        out_shape=jax.ShapeDtypeStruct((nc, C), jnp.int32),
        grid=(nc // group,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=True,
    )(jnp.asarray(lprev), jnp.asarray(lnext), jnp.asarray(srank))
    exp = _jnp_dominance(jnp.asarray(lprev), jnp.asarray(lnext), jnp.asarray(srank))
    assert np.array_equal(np.asarray(got), np.asarray(exp))
