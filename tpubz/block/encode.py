"""Device block-encode pipeline.

Per block (reference pipeline src/compression/compress_block.rs:24-66, rebuilt
TPU-first): the O(n) transforms — BWT suffix sort, MTF, RLE2, chunk histogram
— run fused in one jitted device call on fixed padded shapes; the O(alpha)
Huffman refinement (matmul-shaped cost/argmin + six tiny tree builds) runs on
host (SURVEY.md §7 step 3: "host-side tree build — 6 tiny trees <= 258
symbols — not worth device"), and emission packs via the vectorized packer.

Because the device transforms are bit-exact against the host reference, the
full device-path stream is byte-identical to `tpubz.hostref.stream.compress`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..format.constants import BLOCK_MAGIC, GROUP_SIZE
from ..hostref.bitio import BitAccum
from ..hostref.huffman import huffman_emit, refine_from_hist
from ..kernels.mtf import mtf_ranks
from ..kernels.rle2 import rle2_encode
from ..kernels.suffix_sort import bwt_forward

MTF_CHUNK = 512


@functools.partial(jax.jit, static_argnames=("out_len", "max_nsel"))
def _transform(data, n, out_len, max_nsel):
    """data uint8[N] (first n valid) -> per-block symbols + statistics."""
    key, last = bwt_forward(data, n)
    ranks, used = mtf_ranks(last, n, chunk=MTF_CHUNK)
    eob = jnp.sum(used).astype(jnp.int32) + 1
    syms, rle2_len, freqs = rle2_encode(ranks, n, eob)
    # 50-symbol chunk histogram for the Huffman cost refinement
    out_idx = jnp.arange(out_len, dtype=jnp.int32)
    valid = out_idx < rle2_len
    cid = out_idx // GROUP_SIZE
    chunk_hist = (
        jnp.zeros((max_nsel, 258), jnp.int32)
        .at[jnp.where(valid, cid, max_nsel), syms.astype(jnp.int32)]
        .add(1, mode="drop")
    )
    return key, syms, rle2_len, freqs, chunk_hist, used


class DeviceBlockEncoder:
    """Encodes RLE1 blocks through the device transform pipeline."""

    def __init__(self, level: int):
        self.level = level
        # max RLE1 block size for this level, rounded up for the MTF chunking
        raw = level * 100_000
        self.N = ((raw + MTF_CHUNK - 1) // MTF_CHUNK) * MTF_CHUNK
        self.out_len = self.N + 8
        self.max_nsel = (self.out_len + GROUP_SIZE - 1) // GROUP_SIZE

    def transform(self, rle1_block: np.ndarray):
        pad = np.zeros(self.N, np.uint8)
        pad[: rle1_block.size] = rle1_block
        return _transform(
            jnp.asarray(pad),
            jnp.int32(rle1_block.size),
            out_len=self.out_len,
            max_nsel=self.max_nsel,
        )

    def encode_block(self, rle1_block: np.ndarray, crc: int) -> BitAccum:
        key, syms, rle2_len, freqs, chunk_hist, used = self.transform(rle1_block)
        rle2_len = int(rle2_len)
        nsel = (rle2_len + GROUP_SIZE - 1) // GROUP_SIZE
        used_np = np.asarray(used)
        alpha = int(used_np.sum()) + 2
        selectors, lengths, table_count = refine_from_hist(
            np.asarray(chunk_hist)[:nsel, :alpha].astype(np.int64),
            rle2_len,
            np.asarray(freqs).astype(np.int64),
            alpha,
        )
        acc = BitAccum()
        acc.put(BLOCK_MAGIC, 48)
        acc.put(crc, 32)
        acc.put(0, 1)
        acc.put(int(key), 24)
        rle2 = np.asarray(syms)[:rle2_len].astype(np.int64)
        huffman_emit(acc, rle2, used_np, selectors, lengths, table_count)
        return acc
