"""Input contracts on the public ops (SURVEY §5.2: the CHECK_INPUT
macros of libs/pointops/src/cuda_utils.h:8-10 become trace-time shape /
dtype asserts with argument names)."""
import numpy as np
import pytest
import jax.numpy as jnp

from patchaugnet_tpu import ops


def test_knn_rejects_bad_rank():
    with pytest.raises(AssertionError, match="xyz"):
        ops.knn(jnp.zeros((8, 3)), None, 4)


def test_knn_rejects_k_out_of_range():
    with pytest.raises(AssertionError, match="k=100"):
        ops.knn(jnp.zeros((1, 8, 3)), None, 100)


def test_knn_rejects_batch_mismatch():
    with pytest.raises(AssertionError, match="batch mismatch"):
        ops.knn(jnp.zeros((2, 8, 3)), jnp.zeros((3, 4, 3)), 2)


def test_fps_rejects_int_cloud():
    with pytest.raises(AssertionError, match="floating"):
        ops.farthest_point_sample(jnp.zeros((1, 8, 3), jnp.int32), 4)


def test_fps_rejects_wrong_coord_dim():
    with pytest.raises(AssertionError, match=r"\(B, N, 3\)"):
        ops.farthest_point_sample(jnp.zeros((1, 8, 4)), 4)


def test_gather_rejects_float_indices():
    with pytest.raises(AssertionError, match="integer"):
        ops.gather(jnp.zeros((1, 8, 4)), jnp.zeros((1, 3)))


def test_group_rejects_rank_2_indices():
    with pytest.raises(AssertionError, match="rank 3"):
        ops.group(jnp.zeros((1, 8, 4)), jnp.zeros((1, 3), jnp.int32))


def test_chamfer_rejects_dim_mismatch():
    with pytest.raises(AssertionError, match="coordinate dims"):
        ops.chamfer_l2(jnp.zeros((1, 8, 3)), jnp.zeros((1, 8, 2)))


def test_emd_rejects_size_mismatch():
    with pytest.raises(AssertionError, match="matching"):
        ops.auction_emd(jnp.zeros((1, 8, 3)), jnp.zeros((1, 16, 3)))


def test_contracts_pass_valid_inputs():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 3), jnp.float32)
    idx, d = ops.knn(x, None, 4)
    assert idx.shape == (2, 16, 4)
    g = ops.gather(x, idx[:, :, 0])
    assert g.shape == (2, 16, 3)
