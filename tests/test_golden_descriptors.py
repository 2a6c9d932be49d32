"""Golden descriptor regression tests (SURVEY §4 test strategy item 3:
"tiny deterministic cloud + fixed weights -> descriptor bits").

Pins the first descriptor components of every model under fixed PRNG
init + fixed input, so accidental semantic drift in any layer of the
stack (ops -> nn -> models) fails loudly across refactors. Tolerance
1e-4 absorbs XLA-CPU (oneDNN) reassociation jitter; real changes move
these values by orders of magnitude more.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from patchaugnet_tpu.models import get_model

CONFIGS = {
    "pointnet_vlad": {"NUM_POINTS": 128, "FEATURE_OUTPUT_DIM": 64},
    "pptnet": {
        "AGGREGATION": "spvlad", "GROUP": 4, "NUM_POINTS": 128,
        "FEATURE_OUTPUT_DIM": 64, "FEATURE_SIZE": [32, 32, 32, 32],
        "MAX_SAMPLES": [4, 8, 16, 32], "CLUSTER_SIZE": [1, 2, 4, 8],
        "OUTPUT_DIM": [64, 64, 64, 64], "GATING": True,
        "SAMPLING": [32, 16, 8, 4], "KNN": [4, 4, 4, 4], "KNN_DILATION": 1,
    },
    "patch_aug_net": {
        "AGGREGATION": "spvlad", "AGGREGATION_TYPE": 2, "GROUP": 4,
        "NUM_POINTS": 128, "FEATURE_OUTPUT_DIM": 64,
        "FEATURE_SIZE": [64, 64, 64], "MAX_SAMPLES": [8, 32, 128],
        "CLUSTER_SIZE": [2, 4, 8], "OUTPUT_DIM": [64, 64, 64],
        "USE_ORIGIN_PC_IN_FP": True, "GATING": False,
        "SAMPLING": [32, 8, 4], "KNN": [8, 8, 4], "KNN_DILATION": 2,
    },
    "minkloc3dv2": {
        "feature_size": 32, "output_dim": 32, "planes": [8, 16, 8, 8],
        "layers": [1, 1, 1, 1], "num_top_down": 2, "grid_size": 16,
        "pooling": "GeM", "coordinates": "cartesian", "block": "ECABasicBlock",
    },
}

GOLDEN = {
    "pointnet_vlad": [-0.018586, 0.007149, -0.002686, 0.021059, -0.004339, 0.011396],
    "pptnet": [0.335302, 0.192603, -0.454724, -0.110264, 0.643042, -0.46059],
    "patch_aug_net": [0.11006, 0.146702, -0.159007, 0.029743, -0.116432, 0.179843],
    "minkloc3dv2": [0.009017, 1e-06, 0.027899, 0.0099, 0.085575, 0.018738],
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_golden_descriptor(name):
    model = get_model(name, CONFIGS[name])
    x = jax.random.uniform(jax.random.PRNGKey(42), (2, 128, 3), jnp.float32)
    v = jax.jit(lambda k, a: model.init(k, a))(jax.random.PRNGKey(7), x)
    out = model.apply(v, x, train=False)
    d = out if isinstance(out, jax.Array) else out.global_desc
    got = np.asarray(d)[0, :6]
    np.testing.assert_allclose(got, GOLDEN[name], atol=1e-4, err_msg=name)
