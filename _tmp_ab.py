from pose6d_tpu import runtime; runtime.configure()
import time, numpy as np, jax, jax.numpy as jnp, functools
from pose6d_tpu.solvers.fmap2pointmap import spatial_filtering_fmap2pointmap
from pose6d_tpu.ops.pallas import masked_consistency_sum
from pose6d_tpu.ops.geometry import pairwise_sqdist
from pose6d_tpu.ops.nn import topk_valid

v1, v2, K, k = 5120, 2048, 30, 5
B = 16
rng = np.random.default_rng(0)
cad = (rng.normal(size=(B, v1, 3)) * 3).astype(np.float32)
perm = np.stack([rng.permutation(v1)[:v2] for _ in range(B)])
pc = np.take_along_axis(cad, perm[:, :, None], axis=1) + rng.normal(size=(B, v2, 3)).astype(np.float32) * 0.05
evx = np.stack([np.linalg.qr(rng.normal(size=(v1, K)))[0] for _ in range(B)]).astype(np.float32)
evy = np.take_along_axis(evx, perm[:, :, None], axis=1).copy()
bad = rng.random((B, v2)) < 0.5
evy[bad] = rng.normal(size=evy[bad].shape).astype(np.float32) * 0.3
diam = np.linalg.norm(cad.max(1) - cad.min(1), axis=1)
C = np.tile(np.eye(K, dtype=np.float32), (B, 1, 1))
xv = np.ones((B, v1), bool); yv = np.ones((B, v2), bool)
args = [jnp.asarray(a) for a in (C, evx, evy, cad, pc, xv, yv, diam)]

# old PC-major path, inlined (same as pre-change code)
@jax.jit
def old_filter(C, evx, evy, cad, pc, xv, yv, diam):
    def one(C, evx, evy, cad, pc, xv, yv, diam):
        _, topk = topk_valid(evy, evx @ C.T, xv, k=k)
        cad_idx = topk.astype(jnp.int32).reshape(-1)
        pc_idx = jnp.repeat(jnp.arange(v2, dtype=jnp.int32), k)
        valid = jnp.repeat(yv, k)
        ca = cad[cad_idx]; cb = pc[pc_idx]
        def cmean(v):
            w = v.astype(jnp.float32)
            return masked_consistency_sum(ca, cb, w) / jnp.maximum(w.sum(), 1.)
        for tau in (0.3,):
            valid = valid & (cmean(valid) < tau * diam)
        valid = valid & (cmean(valid) < 0.15 * diam)
        m = cmean(valid)
        kt = valid & (m < 0.055 * diam); kl = valid & (m < 0.065 * diam)
        valid = jnp.where(jnp.any(kt), kt, kl)
        return jnp.stack([cad_idx, pc_idx]), valid
    return jax.vmap(one)(C, evx, evy, cad, pc, xv, yv, diam)

@jax.jit
def new_filter(C, evx, evy, cad, pc, xv, yv, diam):
    return jax.vmap(functools.partial(spatial_filtering_fmap2pointmap))(C, evx, evy, cad, pc, xv, yv, diam)

def timeit(f, n=6):
    o = f(*args); np.asarray(o[1])
    t0 = time.time()
    outs = [f(*args) for _ in range(n)]
    np.asarray(outs[-1][1])
    return (time.time() - t0) / n, o

t_old, (p_old, v_old) = timeit(old_filter)
t_new, (p_new, v_new) = timeit(new_filter)
p_old, v_old, p_new, v_new = map(np.asarray, (p_old, v_old, p_new, v_new))
agree = (v_old == v_new).mean()
print(f"old {t_old*1e3:.1f} ms/batch  new {t_new*1e3:.1f} ms/batch  speedup {t_old/t_new:.2f}x")
print(f"pairs equal: {(p_old == p_new).all()}  valid agreement: {agree:.6f}  n_old {v_old.sum()} n_new {v_new.sum()}")
