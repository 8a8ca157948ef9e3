import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from bench import build_corpus
from tpubz.format.constants import block_budget
from tpubz.hostref.rle1 import rle1_blocks
from tpubz.block.encode import DeviceBlockEncoder, _stage_bwt, setup_jax_cache
from tpubz.kernels.mtf import mtf_ranks
setup_jax_cache()

@jax.jit
def mtf128(last, n):
    return mtf_ranks(last, n, chunk=128)

@jax.jit
def mtf256(last, n):
    return mtf_ranks(last, n, chunk=256)

enc = DeviceBlockEncoder(9); N = enc.N
for f, nm in ((mtf128, "mtf128"), (mtf256, "mtf256")):
    t0=time.time()
    f.lower(jax.ShapeDtypeStruct((N,), jnp.uint8), jax.ShapeDtypeStruct((), jnp.int32)).compile()
    print(f"{nm} compiled {time.time()-t0:.0f}s", flush=True)

corpus = build_corpus(8)
arr = np.frombuffer(corpus, np.uint8)
out, blocks = rle1_blocks(arr, block_budget(9))
lasts = []
for (o0, o1, _, _) in blocks[:8]:
    pad = np.zeros(N, np.uint8); blk = out[o0:o1]; pad[:blk.size] = blk
    key, last = _stage_bwt(jnp.asarray(pad), jnp.int32(blk.size))
    lasts.append((last, jnp.int32(blk.size)))
for l, _ in lasts: l.block_until_ready()

for f, nm in ((mtf256, "mtf256"), (mtf128, "mtf128")):
    rs = [f(l, n) for l, n in lasts]
    for r in rs: jax.device_get(r[1])
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        rs = [f(l, n) for l, n in lasts]
        for r in rs: jax.device_get(r[1])
        best = min(best, (time.time()-t0)/len(lasts))
    print(f"{nm}: {best*1e3:.1f} ms/block pipelined", flush=True)

# exactness
for l, n in lasts[:3]:
    r1, u1 = mtf256(l, n); r2, u2 = mtf128(l, n)
    nn = int(n)
    assert bool(jnp.all(r1[:nn] == r2[:nn])) and bool(jnp.all(u1 == u2))
print("chunk-128 matches chunk-256 on real blocks")
