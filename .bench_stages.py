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
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms", flush=True)

m = get_model("patch_aug_net", FULL_PARAM)
v = jax.jit(lambda k, a: m.init(k, a))(jax.random.PRNGKey(0), xs[0])
timed_v("FULL forward", lambda x: m.apply(v, x, train=False).global_desc)
timed_v("fps l1 (pallas)", lambda x: ops.farthest_point_sample(x, 1024))
timed_v("knn l1 k=40 (pallas)", lambda x: ops.knn(x, x[:, :1024], 40)[0])
timed_v("knn l2 k=40 over 1024", lambda x: ops.knn(x[:, :1024], x[:, :128], 40)[0])
timed_v("three_nn l0 (argmin)", lambda x: ops.three_nn(x, x[:, :1024])[1])
timed_v("three_nn l1", lambda x: ops.three_nn(x[:, :1024], x[:, :128])[1])
timed_v("group xyz l1 (B,1024,40,3)", lambda x: ops.group(x, jnp.zeros((B,1024,40),jnp.int32)))
big = jnp.tile(xs[0][:, :, :1], (1, 1, 256))
timed_v("group feats l0->l1 (B,1024,20,256+interp)", lambda x: ops.interpolate_features(x, x[:, :1024], jnp.tile(x[:, :1024, :1], (1,1,256))))
# aggregation head alone
from patchaugnet_tpu.nn import SpatialPyramidNetVLAD
agg = SpatialPyramidNetVLAD(feature_size=[256]*3, max_samples=[128,1024,4096],
                            cluster_size=[4,16,64], output_dim=[256]*3,
                            gating=False, aggregation_type=2)
feats = [jax.random.uniform(jax.random.PRNGKey(9+i), (B, s, 256)) for i, s in enumerate([128,1024,4096])]
av = jax.jit(lambda k: agg.init(k, feats))(jax.random.PRNGKey(1))
timed_v("SPVLAD head", lambda x: agg.apply(av, [feats[0], feats[1], x @ jnp.ones((3,256))*0 + feats[2]]))
