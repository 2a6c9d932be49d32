import time, numpy as np, functools
import jax, jax.numpy as jnp
from patchaugnet_tpu import ops

B, M, N = 32, 1024, 4096
xs = [jax.random.uniform(jax.random.PRNGKey(i), (B, N, 3)) for i in range(8)]

def timed_v(name, fn, iters=8):
    g = jax.jit(lambda x: jnp.sum(jax.tree_util.tree_leaves(fn(x))[0].astype(jnp.float32)))
    np.asarray(g(xs[0]))
    t0 = time.perf_counter()
    out=None
    for i in range(iters): out = g(xs[i % len(xs)])
    np.asarray(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms", flush=True)

def dist(x): return ops.pairwise_sqdist(x[:, :M], x)

timed_v("top_k k=40 (baseline)", lambda x: jax.lax.top_k(-dist(x), 40)[1])
timed_v("approx_max_k k=40 r=0.95", lambda x: jax.lax.approx_max_k(-dist(x), 40, recall_target=0.95)[1])
timed_v("approx_max_k k=40 r=1.0", lambda x: jax.lax.approx_max_k(-dist(x), 40, recall_target=1.0)[1])
def chunked_topk(x, k=40, c=16):
    d = -dist(x)                      # (B, M, N)
    d = d.reshape(B, M, c, N//c)
    vals, idx = jax.lax.top_k(d, k)   # per chunk
    base = (jnp.arange(c) * (N//c))[None, None, :, None]
    idx = (idx + base).reshape(B, M, c*k)
    vals = vals.reshape(B, M, c*k)
    v2, i2 = jax.lax.top_k(vals, k)
    return jnp.take_along_axis(idx, i2, -1)
timed_v("chunked top_k c=16", chunked_topk)
timed_v("chunked top_k c=32", lambda x: chunked_topk(x, 40, 32))
def argmin3(x):
    d = ops.pairwise_sqdist(x, x[:, :M])   # (B, N, M) three_nn shape
    idxs = []
    for _ in range(3):
        i = jnp.argmin(d, -1)
        idxs.append(i)
        d = d + jax.nn.one_hot(i, M) * 1e10
    return jnp.stack(idxs, -1)
timed_v("three_nn argmin x3", argmin3)
timed_v("three_nn top_k baseline", lambda x: ops.three_nn(x, x[:, :M])[1])
