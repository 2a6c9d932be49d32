import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

import sys

sys.path.insert(0, "/root/repo")
from patchaugnet_tpu.models.minkloc3dv2 import build_minkloc
from patchaugnet_tpu.models import minkloc_sparse as ms

SPARSE_PARAM = {
    "feature_size": 64,
    "output_dim": 64,
    "planes": [16, 32, 16, 8],
    "layers": [1, 1, 1, 1],
    "num_top_down": 2,
    "conv0_kernel_size": 5,
    "block": "ECABasicBlock",
    "pooling": "GeM",
    "coordinates": "cartesian",
    "quantization_step": 0.05,
    "normalize_embeddings": False,
}

rng = np.random.RandomState(0)


def surface(rng, b=2, n=256):
    out = []
    for _ in range(b):
        n_g = n // 2
        g = np.stack(
            [rng.rand(n_g) * 2 - 1, rng.rand(n_g) * 2 - 1, rng.randn(n_g) * 0.01],
            axis=-1,
        )
        w = np.stack(
            [rng.rand(n - n_g) * 2 - 1, np.full(n - n_g, 0.3), rng.rand(n - n_g) * 0.8],
            axis=-1,
        )
        out.append(np.concatenate([g, w], 0).astype(np.float32))
    return np.stack(out)


pts = jnp.asarray(surface(rng))
counts = ms.measure_level_occupancy(pts, num_levels=4, quantization_step=0.05)
caps = ms.suggest_level_capacities(counts, margin=1.1, align=8, full=pts.shape[1])
print("counts max:", counts.max(axis=0), "caps:", caps)

full = build_minkloc(dict(SPARSE_PARAM))
v = full.init(jax.random.PRNGKey(0), pts)
ref = np.asarray(full.apply(v, pts))

for which in range(5):
    c = [pts.shape[1]] * 5
    c[which] = caps[which]
    m = build_minkloc(dict(SPARSE_PARAM, level_capacity=c))
    out, diag = m.apply(v, pts, return_diagnostics=True)
    d = np.abs(np.asarray(out) - ref).max()
    print(f"compact level {which} only: cap={c[which]} overflow={int(diag['capacity_overflow'])} maxdiff={d:.3e}")

m = build_minkloc(dict(SPARSE_PARAM, level_capacity=caps))
out, diag = m.apply(v, pts, return_diagnostics=True)
d = np.abs(np.asarray(out) - ref)
print(f"all levels: overflow={int(diag['capacity_overflow'])} maxdiff={d.max():.3e} n_mismatch={(d>0).sum()}")
# pairwise
for a in range(5):
    for bb in range(a+1, 5):
        c = [pts.shape[1]] * 5
        c[a], c[bb] = caps[a], caps[bb]
        mm = build_minkloc(dict(SPARSE_PARAM, level_capacity=c))
        o2 = np.asarray(mm.apply(v, pts))
        print(f"levels {a}+{bb}: maxdiff={np.abs(o2-ref).max():.3e}")
