"""Multi-host block-data-parallel compression (the pod-scale analogue of the
reference's rayon pool + ordered writer channel, src/compression/compress.rs:
69-132).

SPMD contract: every process calls :func:`compress_multihost` with the same
input bytes (on a real deployment each host reads the input from shared
storage). Per batch of `global device count` blocks:

  1. every host builds the GLOBAL [G, N] block batch but materializes only
     its local devices' rows via ``jax.make_array_from_process_local_data``
     (per-host block feeding over a global 1-D "blocks" mesh),
  2. the sharded transform (dist/sharded.py, shard_map over the mesh) runs
     the BWT/MTF/RLE2 pipeline with no cross-block communication,
  3. each host fetches ITS OWN output shards (addressable, no DCN), runs
     Huffman refinement + emission for its blocks in the native engine —
     distributing the host-side work across hosts like the rayon pool,
  4. host 0 gathers only the per-block PACKED BITS (two-phase allgather:
     bit lengths first, then payloads padded to the batch max) and splices
     them in block order, folding the order-dependent stream CRC
     (src/tools/crc.rs:25-27) exactly as the single-host path does.

Runs unchanged single-process (allgather degenerates to identity), which is
how `__graft_entry__.dryrun_multichip` and the CPU-mesh tests exercise it;
`tests/test_multihost.py` additionally runs it as two real processes with
`jax.distributed.initialize` over a 4-device CPU mesh.
"""
from __future__ import annotations

import numpy as np

from ..format.constants import FOOTER_MAGIC, STREAM_MAGIC, block_budget
from ..format.crc import block_crc, stream_crc_fold
from ..hostref.bitio import BitAccum
from ..hostref.rle1 import rle1_blocks


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Bring up the JAX distributed runtime (idempotent passthrough)."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def compress_multihost(data: bytes | np.ndarray, level: int = 9):
    """Compress over all hosts/devices of the global mesh.

    Returns the .bz2 bytes on process 0 and None on other processes.
    """
    import jax
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..block.encode import DeviceBlockEncoder, setup_jax_cache
    from .sharded import block_mesh, make_sharded_transform

    if not 1 <= level <= 9:
        raise ValueError("level must be 1..9")
    setup_jax_cache()
    arr = (
        np.frombuffer(data, dtype=np.uint8)
        if isinstance(data, (bytes, bytearray, memoryview))
        else np.asarray(data, dtype=np.uint8)
    )
    pid = jax.process_index()
    nproc = jax.process_count()

    out, blocks = rle1_blocks(arr, block_budget(level))
    enc = DeviceBlockEncoder(level)
    N = enc.N
    mesh = block_mesh()
    devs = list(mesh.devices.flat)
    G = len(devs)
    my_rows = [i for i, d in enumerate(devs) if d.process_index == pid]
    sharding = NamedSharding(mesh, P("blocks"))
    fn, out_len = make_sharded_transform(mesh, N)

    nblocks = len(blocks)
    # fixed per-process row count per batch => allgather shapes are static
    local_payloads: dict[int, tuple[bytes, int]] = {}
    for base in range(0, nblocks, G):
        batch = blocks[base : base + G]
        local_data = np.zeros((len(my_rows), N), np.uint8)
        local_n = np.ones(len(my_rows), np.int32)  # pad rows: 1-byte dummy
        for r, g in enumerate(my_rows):
            if g < len(batch):
                o0, o1, _, _ = batch[g]
                local_data[r, : o1 - o0] = out[o0:o1]
                local_n[r] = o1 - o0
        data_g = jax.make_array_from_process_local_data(sharding, local_data, (G, N))
        n_g = jax.make_array_from_process_local_data(sharding, local_n, (G,))
        outs = fn(data_g, n_g)
        # fetch only the addressable (local) shards of each output
        local_outs = [
            np.concatenate([np.asarray(s.data) for s in o.addressable_shards])
            for o in outs
        ]
        key_l, syms_l, len_l, freq_l, used_l = local_outs
        for r, g in enumerate(my_rows):
            if g >= len(batch):
                continue
            bi = base + g
            _, _, i0, i1 = batch[g]
            crc = block_crc(arr[i0:i1])
            acc = DeviceBlockEncoder.emit_block(
                int(key_l[r]), syms_l[r], int(len_l[r]), freq_l[r], used_l[r], crc
            )
            payload, nbits = acc.pack()
            local_payloads[bi] = (payload, nbits)

    # host-0 ordered gather: per-process block manifests, static shapes.
    # Phase 1: bit lengths + block indices; phase 2: payloads padded to the
    # global max byte length.
    rows_per_proc = max(
        sum(1 for d in devs if d.process_index == p) for p in range(nproc)
    )
    cap_blocks = (nblocks + G - 1) // G * max(1, rows_per_proc)
    idx_arr = np.full(cap_blocks, -1, np.int64)
    bits_arr = np.zeros(cap_blocks, np.int64)
    for j, bi in enumerate(sorted(local_payloads)):
        idx_arr[j] = bi
        bits_arr[j] = local_payloads[bi][1]
    if nproc > 1:
        all_idx = np.asarray(multihost_utils.process_allgather(idx_arr))
        all_bits = np.asarray(multihost_utils.process_allgather(bits_arr))
        max_bytes = int(max((b + 7) // 8 for b in all_bits.reshape(-1) if b > 0))
        pay_arr = np.zeros((cap_blocks, max_bytes), np.uint8)
        for j, bi in enumerate(sorted(local_payloads)):
            p = np.frombuffer(local_payloads[bi][0], np.uint8)
            pay_arr[j, : p.size] = p
        all_pay = np.asarray(multihost_utils.process_allgather(pay_arr))
    else:
        all_idx = idx_arr[None]
        all_bits = bits_arr[None]
        all_pay = None  # single process: use local_payloads directly

    if pid != 0:
        return None

    # assemble in block order with the order-dependent stream CRC fold
    per_block: dict[int, tuple[np.ndarray, int]] = {}
    for p in range(all_idx.shape[0]):
        for j in range(cap_blocks):
            bi = int(all_idx[p, j])
            if bi < 0:
                continue
            nbits = int(all_bits[p, j])
            if all_pay is not None:
                per_block[bi] = (all_pay[p, j], nbits)
            else:
                per_block[bi] = (
                    np.frombuffer(local_payloads[bi][0], np.uint8),
                    nbits,
                )
    from ..hostref.bitio import splice_byte_chunks

    header = BitAccum()
    for b in STREAM_MAGIC:
        header.put(b, 8)
    header.put(0x30 + level, 8)
    chunks = [header.pack()]
    s_crc = 0
    for bi in range(nblocks):
        _, _, i0, i1 = blocks[bi]
        s_crc = stream_crc_fold(s_crc, block_crc(arr[i0:i1]))
        payload, nbits = per_block[bi]
        chunks.append((np.ascontiguousarray(payload).tobytes(), nbits))
    footer = BitAccum()
    footer.put(FOOTER_MAGIC, 48)
    footer.put(s_crc, 32)
    chunks.append(footer.pack())
    stream, _ = splice_byte_chunks(chunks)
    return stream
