"""Cached host-side ground normals (TPU.CACHE_GROUND_NORMALS) vs the
in-step RANSAC path (reference normal_vector_from_maps,
roi_heads.py:466-528): both must recover the same plane from a synthetic
ground scene, and the mapper must attach/flip the cached normal."""
import jax
import jax.numpy as jnp
import numpy as np

from weakcube_tpu.ops.plane import ground_normal_np


def _tilted_ground(H=240, W=320, f=200.0, tilt_deg=12.0):
    """Depth map of a ground plane tilted about camera x (pitch)."""
    t = np.deg2rad(tilt_deg)
    n = np.array([0.0, np.cos(t), -np.sin(t)], np.float32)  # plane normal
    d = 1.5  # camera height along the normal
    u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32))
    rx = (u - W / 2) / f
    ry = (v - H / 2) / f
    denom = n[0] * rx + n[1] * ry + n[2]
    with np.errstate(divide="ignore"):
        z = d / denom
    mask = (denom > 1e-3) & (z > 0.5) & (z < 50)
    z = np.where(mask, z, 0.0).astype(np.float32)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    return z, mask, K, n


class TestHostGroundNormal:
    def test_recovers_plane(self):
        z, mask, K, n_true = _tilted_ground()
        n, ok = ground_normal_np(z, K, mask)
        assert ok
        # orientation fixes make it an up-vector: n_y > 0
        assert n[1] > 0
        cos = abs(float(n @ n_true))
        assert cos > 0.999, (n, n_true)

    def test_matches_device_ransac(self):
        from weakcube_tpu.models.roi_heads import ground_normals_from_maps
        z, mask, K, _ = _tilted_ground()
        n_host, ok = ground_normal_np(z, K, mask)
        assert ok
        n_dev = np.asarray(ground_normals_from_maps(
            jax.random.PRNGKey(0), jnp.asarray(z[None]),
            jnp.asarray(mask[None]), jnp.ones((1,), bool),
            K=jnp.asarray(K[None])))[0]
        cos = abs(float(n_host @ n_dev / max(np.linalg.norm(n_dev), 1e-9)))
        assert cos > 0.995, (n_host, n_dev)

    def test_degenerate_returns_invalid(self):
        z = np.zeros((60, 80), np.float32)
        K = np.array([[50, 0, 40], [0, 50, 30], [0, 0, 1]], np.float32)
        n, ok = ground_normal_np(z, K, np.zeros((60, 80), bool))
        assert not ok


class TestMapperNormal:
    def _cfg(self):
        from weakcube_tpu.config import get_cfg
        cfg = get_cfg()
        cfg.TPU.IMAGE_SIZE = 128
        cfg.INPUT.RANDOM_FLIP = "horizontal"
        return cfg

    def test_attached_and_flip_mirrors_x(self):
        from weakcube_tpu.data.mapper import DatasetMapper3D
        z, mask, K, _ = _tilted_ground()
        # give the normal a nonzero x component: yaw the plane a little
        zz = z.copy()
        record = {"width": 320, "height": 240, "K": K.tolist(),
                  "image_id": 7, "annotations": []}
        cfg = self._cfg()
        mapper = DatasetMapper3D(cfg, is_train=True)
        img = np.zeros((240, 320, 3), np.uint8)

        flips = set()
        outs = {}
        for seed in range(20):
            ex = mapper(record, rng=np.random.default_rng(seed), image=img,
                        depth_map=zz, ground_map=mask)
            assert "ground_normal" in ex and ex["ground_normal_valid"]
            flips.add(ex["flip"])
            outs[ex["flip"]] = ex["ground_normal"]
            if len(flips) == 2:
                break
        assert flips == {True, False}, "both flip branches must occur"
        n0, n1 = outs[False], outs[True]
        np.testing.assert_allclose(n0 * np.array([-1, 1, 1], np.float32), n1,
                                   atol=1e-6)
        # cache: same image id -> one fit (cache populated once)
        assert len(mapper._normal_cache) == 1
