import time, numpy as np
import jax, jax.numpy as jnp
from patchaugnet_tpu import ops
from patchaugnet_tpu.models import get_model
from __graft_entry__ import FULL_PARAM

B, N = 32, 4096
xs = [jax.random.uniform(jax.random.PRNGKey(i), (B, N, 3)) for i in range(8)]

def timed_v(name, fn, inputs=xs, iters=8):
    g = jax.jit(lambda x: jnp.sum(jax.tree_util.tree_leaves(fn(x))[0].astype(jnp.float32)))
    np.asarray(g(inputs[0]))
    t0 = time.perf_counter()
    out=None
    for i in range(iters): out = g(inputs[i % len(inputs)])
    np.asarray(out)
    dt = (time.perf_counter()-t0)/iters
    print(f"{name:42s} {dt*1000:8.2f} ms", flush=True)

timed_v("fps 4096->1024", lambda x: ops.farthest_point_sample(x, 1024))
timed_v("fps 1024->128", lambda x: ops.farthest_point_sample(x[:, :1024], 128))
timed_v("knn k=40 (l1 dilated)", lambda x: ops.knn(x, x[:, :1024], 40)[0])
timed_v("knn k=20 (l1 no dilation)", lambda x: ops.knn(x, x[:, :1024], 20)[0])
timed_v("pairwise (1024x4096)", lambda x: ops.pairwise_sqdist(x[:, :1024], x))
timed_v("topk40 of precomputed dist", lambda x: jax.lax.top_k(-ops.pairwise_sqdist(x[:, :1024], x), 40)[1])
timed_v("three_nn 4096 vs 1024", lambda x: ops.three_nn(x, x[:, :1024])[1])
timed_v("group (B,1024,40,3)", lambda x: ops.group(x, jnp.zeros((B,1024,40),jnp.int32)))
timed_v("group feats (B,1024,20,256)", lambda x: ops.group(jnp.tile(x[:, :4096, :1], (1,1,256)), jnp.zeros((B,1024,20),jnp.int32)))

m = get_model("patch_aug_net", FULL_PARAM)
v = jax.jit(lambda k, a: m.init(k, a))(jax.random.PRNGKey(0), xs[0])
timed_v("FULL forward", lambda x: m.apply(v, x, train=False).global_desc)
# bf16 variant
v16 = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16) if a.dtype==jnp.float32 else a, v)
timed_v("FULL forward bf16 inputs", lambda x: m.apply(v, x.astype(jnp.bfloat16), train=False).global_desc)
