from pose6d_tpu import runtime; runtime.configure()
import time, numpy as np, jax, jax.numpy as jnp, functools
from pose6d_tpu.ops.nn import topk_valid
from pose6d_tpu.ops.pallas import consistency_sum_rank_major
from pose6d_tpu.ops.geometry import pairwise_sqdist

v1, v2, K, k = 5120, 2048, 30, 5
B = 16
rng = np.random.default_rng(0)
evx = jnp.asarray(rng.normal(size=(B, v1, K)).astype(np.float32))
evy = jnp.asarray(rng.normal(size=(B, v2, K)).astype(np.float32))
xv = jnp.ones((B, v1), bool)
cad = jnp.asarray(rng.normal(size=(B, v1, 3)).astype(np.float32))
pc = jnp.asarray(rng.normal(size=(B, v2, 3)).astype(np.float32))
P = v2 * k
w = jnp.asarray((rng.random((B, P)) > 0.4).astype(np.float32))
tk = jnp.asarray(rng.integers(0, v1, size=(B, P)).astype(np.int32))

def timeit(f, *a, n=8):
    o = f(*a); np.asarray(jax.tree_util.tree_leaves(o)[0])[:1]
    t0 = time.time()
    outs = [f(*a) for _ in range(n)]
    np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])[:1]
    return (time.time() - t0) / n * 1e3

@jax.jit
def f_topk(evy, evx, xv):
    return jax.vmap(lambda a, b, v: topk_valid(a, b, v, k=k))(evy, evx, xv)

@jax.jit
def f_dpc(pc):
    hi = jax.lax.Precision.HIGH
    return jax.vmap(lambda p: jnp.sqrt(pairwise_sqdist(p, p, precision=hi)))(pc)

@jax.jit
def f_gather(cad, tk):
    return jax.vmap(lambda c, t: c[t])(cad, tk)

@jax.jit
def f_round(cad, tk, pc, w):
    def one(c, t, p, wv):
        ca = c[t]
        hi = jax.lax.Precision.HIGH
        dpc = jnp.sqrt(pairwise_sqdist(p, p, precision=hi))
        return consistency_sum_rank_major(ca, dpc, wv, v2=v2)
    return jax.vmap(one)(cad, tk, pc, w)

print("topk      ", timeit(f_topk, evy, evx, xv), "ms/batch")
print("dpc       ", timeit(f_dpc, pc), "ms/batch")
print("gatherP   ", timeit(f_gather, cad, tk), "ms/batch")
print("1 round(+dpc+gather)", timeit(f_round, cad, tk, pc, w), "ms/batch")
