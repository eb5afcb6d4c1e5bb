"""CLUSTER_BINS > 1 and z_type 'clusters' decode path."""
import jax
import jax.numpy as jnp
import numpy as np

from weakcube_tpu.models.roi_heads import decode_cube_predictions


class _Head:
    CLUSTER_BINS = 3
    DIMS_PRIORS_ENABLED = False
    DIMS_PRIORS_FUNC = "exp"
    ALLOCENTRIC_POSE = False
    Z_TYPE = "clusters"
    VIRTUAL_DEPTH = False
    VIRTUAL_FOCAL = 512.0


def test_cluster_z_selection():
    B, S, C, bins = 1, 4, 2, 3
    rng = np.random.default_rng(0)
    deltas = jnp.zeros((B, S, C, 2))
    dims = jnp.zeros((B, S, C, 3))
    pose = jnp.tile(jnp.eye(3), (B, S, C, 1, 1))
    uncert = jnp.ones((B, S, C)) * 5
    # z head output: distinct per (bin, class) so selection is observable
    z_raw = jnp.asarray(
        np.arange(B * S * bins * C).reshape(B, S, bins, C).astype(np.float32))
    classes = jnp.zeros((B, S), jnp.int32)
    # boxes with very different scales -> different cluster assignments
    boxes = jnp.asarray(np.array(
        [[[0, 0, 30, 30], [0, 0, 100, 100], [0, 0, 300, 300], [0, 0, 30, 40]]],
        np.float32))
    K = jnp.tile(jnp.asarray(np.array(
        [[100.0, 0, 64], [0, 100, 64], [0, 0, 1]], np.float32)), (B, 1, 1))
    z_scales = np.array([[40.0, 150.0, 420.0]] * C, np.float32)
    z_stats = np.tile(np.array([[5.0, 1.0], [10.0, 2.0], [20.0, 3.0]],
                               np.float32), (C, 1, 1))

    dec = decode_cube_predictions(deltas, z_raw, dims, pose, uncert, classes,
                                  boxes, K, _Head(), None, z_scales, z_stats)
    z = np.asarray(dec.z)
    # each box's z must land in the +-3 sigma range of its assigned cluster:
    # box 0 (diag 42) -> bin 0: [2, 8]; box 1 (diag 141) -> bin 1: [4, 16];
    # box 2 (diag 424) -> bin 2: [11, 29]; box 3 (diag 50) -> bin 0: [2, 8]
    assert 2.0 <= z[0, 0] <= 8.0
    assert 4.0 <= z[0, 1] <= 16.0
    assert 11.0 <= z[0, 2] <= 29.0
    assert 2.0 <= z[0, 3] <= 8.0
    assert z[0, 2] > z[0, 0]
