from pose6d_tpu import runtime; runtime.configure()
import time, numpy as np, jax, jax.numpy as jnp, functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from pose6d_tpu.ops.masking import BIG
from pose6d_tpu.ops.pallas.cdist import masked_topk_cdist

v1, v2, k = 5120, 2048, 5
B = 16
rng = np.random.default_rng(0)
a = jnp.asarray(rng.normal(size=(B, v2, 32)).astype(np.float32))
b = jnp.asarray(rng.normal(size=(B, v1, 32)).astype(np.float32))
bv = jnp.ones((B, v1), bool)

def timeit(f, *ar, n=8):
    o = f(*ar); np.asarray(jax.tree_util.tree_leaves(o)[0][:1, :1])
    t0 = time.time()
    outs = [f(*ar) for _ in range(n)]
    np.asarray(jax.tree_util.tree_leaves(outs[-1])[0][:1, :1])
    return (time.time() - t0) / n * 1e3

# variant: value-threshold masking (no iota compare on the index)
def _topk_val_kernel(k):
    def kernel(a_ref, b_ref, bmask_ref, dk_ref, ik_ref):
        a = a_ref[:]; b = b_ref[:]
        a2 = jnp.sum(a*a, 1, keepdims=True); b2 = jnp.sum(b*b, 1, keepdims=True).T
        cross = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
        d2 = jnp.maximum(a2 - 2.0*cross + b2, 0.0) + bmask_ref[0, :].reshape(1, -1)
        cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        for kk in range(k):
            dmin = jnp.min(d2, axis=1)
            # index of the min via masked iota-min (one reduce, no argmin)
            imin = jnp.min(jnp.where(d2 <= dmin[:, None], cols, jnp.int32(2**30)), axis=1)
            dk_ref[:, kk] = dmin
            ik_ref[:, kk] = imin
            d2 = jnp.where(cols == imin[:, None], jnp.float32(2*BIG), d2)
    return kernel

@functools.partial(jax.jit, static_argnames=("k","block_n"))
def topk_val(a, b, b_valid, k=5, block_n=512):
    n, c = a.shape; m = b.shape[0]
    bmask = jnp.where(b_valid, 0.0, BIG).astype(jnp.float32)[None, :]
    return pl.pallas_call(
        _topk_val_kernel(k), grid=(n//block_n,),
        in_specs=[pl.BlockSpec((block_n, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((m, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((block_n, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
                   pl.BlockSpec((block_n, k), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((n, k), jnp.float32),
                   jax.ShapeDtypeStruct((n, k), jnp.int32)],
    )(a.astype(jnp.float32), b.astype(jnp.float32), bmask)

@jax.jit
def f_cur(a, b, bv):
    return jax.vmap(lambda x, y, v: masked_topk_cdist(x, y, v, k=5))(a, b, bv)

@jax.jit
def f_val(a, b, bv):
    return jax.vmap(lambda x, y, v: topk_val(x, y, v, k=5))(a, b, bv)

@jax.jit
def f_cur256(a, b, bv):
    return jax.vmap(lambda x, y, v: masked_topk_cdist(x, y, v, k=5, block_n=256))(a, b, bv)

t_cur = timeit(f_cur, a, b, bv)
t_val = timeit(f_val, a, b, bv)
t_256 = timeit(f_cur256, a, b, bv)
print(f"current 512: {t_cur:.1f} ms  val-mask: {t_val:.1f} ms  current 256: {t_256:.1f} ms")
# correctness
dk1, ik1 = f_cur(a, b, bv)
dk2, ik2 = f_val(a, b, bv)
print("idx equal:", bool((np.asarray(ik1) == np.asarray(ik2)).all()),
      "d2 close:", np.abs(np.asarray(dk1)-np.asarray(dk2)).max())
