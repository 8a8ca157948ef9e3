import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from bench import build_corpus
from tpubz.format.constants import block_budget
from tpubz.hostref.rle1 import rle1_blocks
from tpubz.block.encode import DeviceBlockEncoder, setup_jax_cache
from tpubz.kernels.suffix_sort import PAD_RANK, ROUNDS
setup_jax_cache()

def bwt_rounds(data, n):
    N = data.shape[0]
    n = jnp.asarray(n, jnp.int32)
    idx = jnp.arange(N, dtype=jnp.int32)
    valid = idx < n
    nn = jnp.maximum(n, 1)
    def shifted(rank, k):
        kp = jnp.remainder(k, nn)
        a = jnp.roll(rank, -kp); b = jnp.roll(rank, nn - kp)
        return jnp.where(idx < nn - kp, a, b)
    def one_round(rank, k):
        r2 = jnp.where(valid, shifted(rank, k), PAD_RANK)
        r3 = jnp.where(valid, shifted(rank, 2*k), PAD_RANK)
        r4 = jnp.where(valid, shifted(rank, 3*k), PAD_RANK)
        a,b,c,d,order = jax.lax.sort((rank, r2, r3, r4, idx), num_keys=4)
        flag = jnp.concatenate((jnp.zeros(1, jnp.int32),
            ((a[1:]!=a[:-1])|(b[1:]!=b[:-1])|(c[1:]!=c[:-1])|(d[1:]!=d[:-1])).astype(jnp.int32)))
        new_sorted = jnp.cumsum(flag)
        _, new_rank = jax.lax.sort((order, new_sorted), num_keys=1)
        return jnp.where(valid, new_rank, PAD_RANK)
    d0 = data.astype(jnp.int32)
    rank0 = (d0 << 16) | (shifted(d0, 1) << 8) | shifted(d0, 2)
    rank = jnp.where(valid, rank0, PAD_RANK)
    def body(i, carry):
        rank, k, done, active = carry
        new_rank = jax.lax.cond(done, lambda r: r, lambda r: one_round(r, k), rank)
        done2 = done | jnp.all(new_rank == rank)
        return new_rank, k*4, done2, active + jnp.where(done, 0, 1)
    _, _, _, active = jax.lax.fori_loop(0, ROUNDS, body, (rank, jnp.int32(3), n < 0, jnp.int32(0)))
    return active

g = jax.jit(bwt_rounds)
enc = DeviceBlockEncoder(9); N = enc.N
t0=time.time()
g.lower(jax.ShapeDtypeStruct((N,), jnp.uint8), jax.ShapeDtypeStruct((), jnp.int32)).compile()
print(f"compiled {time.time()-t0:.0f}s", flush=True)
corpus = build_corpus(8)
arr = np.frombuffer(corpus, np.uint8)
out, blocks = rle1_blocks(arr, block_budget(9))
for (o0, o1, _, _) in blocks:
    pad = np.zeros(N, np.uint8); blk = out[o0:o1]; pad[:blk.size] = blk
    a = int(jax.device_get(g(jnp.asarray(pad), jnp.int32(blk.size))))
    print(f"block n={blk.size}: {a} active rounds of {ROUNDS}", flush=True)
