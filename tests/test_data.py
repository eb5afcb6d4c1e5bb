import json
import os

import numpy as np
import pytest

from weakcube_tpu.config import get_cfg
from weakcube_tpu.data import synthetic
from weakcube_tpu.data.build import pad_batch, repeat_factors_from_category_frequency
from weakcube_tpu.data.datasets import is_ignore, load_omni3d_json, get_filter_settings_from_cfg
from weakcube_tpu.data.mapper import DatasetMapper3D, _M1, _M2


def smoke_cfg():
    cfg = get_cfg()
    cfg.TPU.IMAGE_SIZE = 128
    cfg.TPU.MAX_GT_PER_IMAGE = 8
    cfg.INPUT.FORMAT = "RGB"
    return cfg


class TestSynthetic:
    def test_deterministic(self):
        a = synthetic.make_dataset(4, seed=1)
        b = synthetic.make_dataset(4, seed=1)
        assert json.dumps(a[0]["annotations"]) == json.dumps(b[0]["annotations"])

    def test_projected_boxes_consistent(self):
        recs = synthetic.make_dataset(8, seed=2)
        for r in recs:
            K = np.asarray(r["K"])
            for a in r["annotations"]:
                ctr = np.asarray(a["center_cam"])
                proj = K @ ctr
                u, v = proj[:2] / proj[2]
                b = a["bbox"]
                # projected centre must be inside (or at the clipped edge of)
                # the 2D box
                assert b[0] - 1 <= u <= b[2] + 1
                assert b[1] - 1 <= v <= b[3] + 1

    def test_depth_map_matches_objects(self):
        recs = synthetic.make_dataset(4, seed=3)
        r = recs[0]
        d = synthetic.render_depth(r["_scene"])
        for a in r["annotations"]:
            x1, y1, x2, y2 = [int(c) for c in a["bbox"]]
            cx, cy = (x1 + x2) // 2, (y1 + y2) // 2
            # centre pixel depth equals the object depth unless occluded by
            # a nearer object
            assert d[cy, cx] <= a["center_cam"][2] + 1e-3


class TestMapper:
    def test_shapes_and_k_scaling(self):
        cfg = smoke_cfg().freeze()
        m = DatasetMapper3D(cfg, is_train=False)
        rec = synthetic.make_dataset(1, seed=4)[0]
        out = m(rec)
        assert out["image"].shape == (128, 128, 3)
        s = 128 / 640
        np.testing.assert_allclose(out["K"][0, 0], np.asarray(rec["K"])[0, 0] * s,
                                   rtol=1e-6)
        assert out["image_wh"][0] == 128 and out["image_wh"][1] == 96

    def test_boxes_scaled(self):
        cfg = smoke_cfg().freeze()
        m = DatasetMapper3D(cfg, is_train=False)
        rec = synthetic.make_dataset(1, seed=5)[0]
        out = m(rec)
        n = len(rec["annotations"])
        s = 128 / 640
        np.testing.assert_allclose(out["gt_boxes"][:n],
                                   np.asarray([a["bbox"] for a in rec["annotations"]]) * s,
                                   rtol=1e-5)
        assert out["gt_valid"][:n].all() and not out["gt_valid"][n:].any()

    def test_flip_pose_mirror(self):
        cfg = smoke_cfg()
        cfg.INPUT.RANDOM_FLIP = "horizontal"
        cfg.freeze()
        m = DatasetMapper3D(cfg, is_train=True)
        rec = synthetic.make_dataset(1, seed=6)[0]
        # force flip by trying seeds until one flips
        for seed in range(20):
            out = m(rec, rng=np.random.default_rng(seed))
            if out["flip"]:
                break
        assert out["flip"]
        a = rec["annotations"][0]
        R = np.asarray(a["pose"])
        expect = _M1 @ R @ _M2
        np.testing.assert_allclose(out["gt_poses"][0], expect, atol=1e-5)
        # mirrored pose must still be a rotation
        np.testing.assert_allclose(expect @ expect.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(expect), 1.0, atol=1e-5)
        # flipped 3D centre x is negated
        np.testing.assert_allclose(out["gt_boxes3D"][0, 6],
                                   -a["center_cam"][0], atol=1e-5)

    def test_pad_batch(self):
        cfg = smoke_cfg().freeze()
        m = DatasetMapper3D(cfg, is_train=False)
        recs = synthetic.make_dataset(3, seed=7)
        batch = pad_batch([m(r) for r in recs])
        assert batch["image"].shape == (3, 128, 128, 3)
        assert batch["gt"].boxes.shape == (3, 8, 4)

    def test_transfer_diet_roundtrip(self):
        # cfg.TPU.TRANSFER_DEPTH_F16 / TRANSFER_MASK_BITS: the diet mapper's
        # outputs must decode back to the legacy mapper's depth/mask exactly
        # (mask) / within f16 rounding (depth)
        from weakcube_tpu.ops.bitpack import unpack_mask_bits
        rec = synthetic.make_dataset(1, seed=8)[0]
        depth = synthetic.render_depth(rec["_scene"])
        ground = depth > np.median(depth)
        cfg_diet = smoke_cfg().freeze()
        cfg_legacy = smoke_cfg()
        cfg_legacy.TPU.TRANSFER_DEPTH_F16 = False
        cfg_legacy.TPU.TRANSFER_MASK_BITS = False
        cfg_legacy = cfg_legacy.freeze()
        out_d = DatasetMapper3D(cfg_diet, is_train=False)(
            rec, depth_map=depth, ground_map=ground)
        out_l = DatasetMapper3D(cfg_legacy, is_train=False)(
            rec, depth_map=depth, ground_map=ground)
        assert out_d["depth_map"].dtype == np.float16
        assert "ground_mask" not in out_d and "ground_mask_bits" in out_d
        np.testing.assert_allclose(
            out_d["depth_map"].astype(np.float32), out_l["depth_map"],
            rtol=1e-3, atol=1e-3)
        gm = np.asarray(unpack_mask_bits(
            np.asarray(out_d["ground_mask_bits"]),
            out_l["ground_mask"].shape[-1]))
        np.testing.assert_array_equal(gm, out_l["ground_mask"])
        assert out_d["ground_valid"] == out_l["ground_valid"]

    def test_bitpack_roundtrip_odd_width(self):
        from weakcube_tpu.ops.bitpack import pack_mask_bits, unpack_mask_bits
        rng = np.random.default_rng(0)
        for w in (8, 13, 64, 100):
            m = rng.random((2, 5, w)) > 0.5
            bits = pack_mask_bits(m)
            assert bits.shape == (2, 5, -(-w // 8))
            np.testing.assert_array_equal(
                np.asarray(unpack_mask_bits(bits, w)), m)


class TestOmni3DJson:
    def _write_json(self, tmp_path):
        coco = {
            "images": [{"id": 1, "file_path": "img1.jpg", "width": 64,
                        "height": 48, "K": np.eye(3).tolist(), "dataset_id": 0}],
            "categories": [{"id": 10, "name": "chair"}, {"id": 11, "name": "void"}],
            "annotations": [
                {"image_id": 1, "category_id": 10, "bbox2D_tight": [5, 5, 30, 40],
                 "bbox2D_proj": [5, 5, 30, 40], "bbox2D_trunc": [5, 5, 30, 40],
                 "center_cam": [0, 0, 4], "dimensions": [1, 1, 1],
                 "R_cam": np.eye(3).tolist(), "behind_camera": False,
                 "valid3D": True, "visibility": 1.0, "truncation": 0.0,
                 "lidar_pts": -1, "segmentation_pts": -1, "depth_error": 0.0},
                # behind camera -> ignore
                {"image_id": 1, "category_id": 10, "bbox2D_tight": [1, 1, 10, 10],
                 "bbox2D_proj": [1, 1, 10, 10], "bbox2D_trunc": [1, 1, 10, 10],
                 "center_cam": [0, 0, -4], "dimensions": [1, 1, 1],
                 "R_cam": np.eye(3).tolist(), "behind_camera": True,
                 "valid3D": True, "visibility": 1.0, "truncation": 0.0,
                 "lidar_pts": -1, "segmentation_pts": -1, "depth_error": 0.0},
            ],
        }
        p = os.path.join(tmp_path, "mini.json")
        with open(p, "w") as f:
            json.dump(coco, f)
        return p

    def test_load_and_filter(self, tmp_path):
        p = self._write_json(str(tmp_path))
        fs = get_filter_settings_from_cfg(None)
        fs["category_names"] = ["chair"]
        recs = load_omni3d_json(p, str(tmp_path), "mini", fs)
        assert len(recs) == 1
        annos = recs[0]["annotations"]
        assert len(annos) == 2
        assert not annos[0]["ignore"]
        assert annos[1]["ignore"]  # behind camera

    def test_is_ignore_rules(self):
        fs = get_filter_settings_from_cfg(None)
        base = {"behind_camera": False, "valid3D": True,
                "dimensions": [1, 1, 1], "center_cam": [0, 0, 5],
                "lidar_pts": -1, "segmentation_pts": -1, "depth_error": 0.0,
                "bbox2D_proj": [0, 0, 20, 30], "truncation": 0.0,
                "visibility": 1.0}
        assert not is_ignore(dict(base), fs, 100)
        assert is_ignore(dict(base, behind_camera=True), fs, 100)
        assert is_ignore(dict(base, valid3D=False), fs, 100)
        assert is_ignore(dict(base, dimensions=[0.001, 1, 1]), fs, 100)
        assert is_ignore(dict(base, truncation=0.999), fs, 100)
        assert is_ignore(dict(base, visibility=0.005), fs, 100)
        assert is_ignore(dict(base, segmentation_pts=0), fs, 100)


class TestSampling:
    def test_repeat_factors(self):
        recs = [
            {"annotations": [{"category_id": 0, "ignore": False}]},
            {"annotations": [{"category_id": 0, "ignore": False}]},
            {"annotations": [{"category_id": 0, "ignore": False}]},
            {"annotations": [{"category_id": 1, "ignore": False}]},  # rare
        ]
        rf = repeat_factors_from_category_frequency(recs, repeat_thresh=0.5)
        assert rf[3] > rf[0]  # rare category oversampled
        np.testing.assert_allclose(rf[0], 1.0)


class TestKittiExport:
    def test_roundtrip_format(self, tmp_path):
        from weakcube_tpu.data.kitti_export import (
            export_predictions_to_kitti, rotation_y_from_pose)
        rec = {
            "image_id": 7,
            "boxes": np.array([[10.0, 20, 110, 120]]),
            "classes": np.array([0]),
            "scores": np.array([0.7]),
            "centers3D": np.array([[1.0, 0.5, 10.0]]),
            "dims3D": np.array([[1.5, 1.6, 3.9]]),
            "poses3D": np.eye(3)[None],
        }
        export_predictions_to_kitti([rec], str(tmp_path), ["car"])
        txt = open(os.path.join(str(tmp_path), "000007.txt")).read().strip()
        parts = txt.split()
        assert parts[0] == "Car"
        assert len(parts) == 16
        assert abs(float(parts[12]) - (0.5 + 1.6 / 2)) < 1e-3  # bottom-face y

    def test_rotation_y(self):
        from weakcube_tpu.data.kitti_export import rotation_y_from_pose
        assert abs(rotation_y_from_pose(np.eye(3))) < 1e-6
        yaw = 0.7
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        assert abs(rotation_y_from_pose(R) - yaw) < 1e-6


class TestMultiScale:
    def test_scale_jitter_within_canvas(self):
        cfg = smoke_cfg()
        cfg.INPUT.MIN_SIZE_TRAIN = (64, 96, 128)
        cfg.freeze()
        m = DatasetMapper3D(cfg, is_train=True)
        rec = synthetic.make_dataset(1, seed=9)[0]
        sizes = set()
        for seed in range(12):
            out = m(rec, rng=np.random.default_rng(seed))
            w, h = out["image_wh"]
            assert w <= 128 and h <= 128
            assert out["image"].shape == (128, 128, 3)  # static canvas
            sizes.add(int(h))
        assert len(sizes) > 1  # jitter actually varies the content scale


class TestAspectBuckets:
    """cfg.TPU.ASPECT_BUCKETS: static canvas set with per-bucket batch
    grouping (reference d2 AspectRatioGroupedDataset, data/build.py:76-155)."""

    def _cfg(self):
        cfg = smoke_cfg()
        cfg.TPU.ASPECT_BUCKETS = [[128, 128], [120, 160]]
        return cfg

    def test_landscape_picks_wide_bucket(self):
        m = DatasetMapper3D(self._cfg().freeze(), is_train=False)
        rec = synthetic.make_dataset(1, seed=11)[0]          # 640 x 480
        out = m(rec)
        # wide bucket: fit 0.25 (160x120 content) vs square fit 0.2
        assert out["image"].shape == (120, 160, 3)
        assert tuple(out["image_wh"]) == (160.0, 120.0)
        assert out["bucket"] == (120, 160)

    def test_portrait_picks_square_bucket(self):
        m = DatasetMapper3D(self._cfg().freeze(), is_train=False)
        rec = dict(synthetic.make_dataset(1, seed=12)[0])
        rec["width"], rec["height"] = 480, 640
        out = m(rec, image=np.zeros((640, 480, 3), np.uint8))
        # square fit 0.2 (96x128) beats wide fit 0.1875
        assert out["image"].shape == (128, 128, 3)
        assert out["bucket"] == (128, 128)

    def test_train_batches_homogeneous(self):
        from weakcube_tpu.data.build import build_train_batches
        cfg = self._cfg()
        cfg.SOLVER.IMS_PER_BATCH = 4
        cfg.DATALOADER.SAMPLER_TRAIN = "TrainingSampler"
        cfg.freeze()
        land = synthetic.make_dataset(4, seed=13)
        port = []
        for r in synthetic.make_dataset(4, seed=14):
            r = dict(r)
            r["width"], r["height"] = 480, 640
            port.append(r)
        records = land + port
        loaders = {"image": lambda r: np.zeros((r["height"], r["width"], 3),
                                               np.uint8)}
        shapes = set()
        it = build_train_batches(cfg, records, loaders=loaders, seed=3)
        for _ in range(6):
            batch = next(it)
            shapes.add(tuple(batch["image"].shape))
        assert shapes <= {(4, 120, 160, 3), (4, 128, 128, 3)}
        assert len(shapes) == 2  # both buckets actually emitted

    def test_test_batches_cover_all_images_once(self):
        from weakcube_tpu.data.build import build_test_batches
        cfg = self._cfg().freeze()
        land = synthetic.make_dataset(5, seed=15)
        port = []
        for j, r in enumerate(synthetic.make_dataset(3, seed=16)):
            r = dict(r)
            r["width"], r["height"] = 480, 640
            r["image_id"] = 1000 + j
            port.append(r)
        records = land + port
        loaders = {"image": lambda r: np.zeros((r["height"], r["width"], 3),
                                               np.uint8)}
        seen = []
        for batch in build_test_batches(cfg, records, batch_size=4,
                                        loaders=loaders):
            B, H, W, _ = batch["image"].shape
            assert B == 4 and (H, W) in {(120, 160), (128, 128)}
            seen.extend(int(i) for i in batch["image_id"])
        # every image appears; padding repeats only the bucket tail
        assert set(seen) == {r["image_id"] for r in records}
