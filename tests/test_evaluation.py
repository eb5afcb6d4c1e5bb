import numpy as np

from weakcube_tpu.evaluation import evaluate_detections
from weakcube_tpu.ops import cuboids as cub


def corners(center, whl):
    import jax.numpy as jnp
    return np.asarray(cub.get_cuboid_verts_3d(
        jnp.asarray(np.concatenate([center, whl]).astype(np.float32)), jnp.eye(3)))


def make_gt(image_id, boxes, classes, centers=None, dims=None):
    n = len(boxes)
    centers = centers if centers is not None else np.tile([0, 0, 5.0], (n, 1))
    dims = dims if dims is not None else np.ones((n, 3))
    return {
        "image_id": image_id,
        "boxes": np.asarray(boxes, np.float32),
        "classes": np.asarray(classes, np.int32),
        "ignore": np.zeros(n, bool),
        "centers3D": np.asarray(centers, np.float32),
        "corners3D": np.stack([corners(c, d) for c, d in zip(centers, dims)])
        if n else np.zeros((0, 8, 3), np.float32),
    }


def make_dt(image_id, boxes, scores, classes, centers=None, dims=None):
    rec = make_gt(image_id, boxes, classes, centers, dims)
    rec["scores"] = np.asarray(scores, np.float32)
    del rec["ignore"]
    return rec


class TestAP2D:
    def test_perfect_detections(self):
        gt = make_gt(0, [[10, 10, 50, 50], [60, 60, 100, 100]], [0, 1])
        dt = make_dt(0, [[10, 10, 50, 50], [60, 60, 100, 100]], [0.9, 0.8], [0, 1])
        res = evaluate_detections([dt], [gt], 2, mode="2D")
        np.testing.assert_allclose(res["AP"], 100.0, atol=0.5)

    def test_miss_halves_ap(self):
        gt = make_gt(0, [[10, 10, 50, 50], [60, 60, 100, 100]], [0, 0])
        dt = make_dt(0, [[10, 10, 50, 50]], [0.9], [0])
        res = evaluate_detections([dt], [gt], 1, mode="2D")
        # one of two GTs found at all thresholds -> AP ~ 50
        assert 45 < res["AP"] < 56

    def test_false_positive_reduces_ap(self):
        gt = make_gt(0, [[10, 10, 50, 50]], [0])
        dt = make_dt(0, [[10, 10, 50, 50], [200, 200, 240, 240]],
                     [0.8, 0.9], [0, 0])  # FP has HIGHER score
        res = evaluate_detections([dt], [gt], 1, mode="2D")
        assert res["AP"] < 60

    def test_localization_threshold_sensitivity(self):
        gt = make_gt(0, [[10, 10, 50, 50]], [0])
        # IoU ~ 0.68 vs gt: counts at 0.5-0.65, misses at 0.7+
        dt = make_dt(0, [[14, 14, 54, 54]], [0.9], [0])
        res = evaluate_detections([dt], [gt], 1, mode="2D")
        assert 30 < res["AP"] < 70

    def test_ignore_gt_not_counted(self):
        gt = make_gt(0, [[10, 10, 50, 50], [60, 60, 100, 100]], [0, 0])
        gt["ignore"] = np.array([False, True])
        dt = make_dt(0, [[10, 10, 50, 50]], [0.9], [0])
        res = evaluate_detections([dt], [gt], 1, mode="2D")
        np.testing.assert_allclose(res["AP"], 100.0, atol=0.5)

    def test_detection_on_ignored_gt_not_fp(self):
        gt = make_gt(0, [[10, 10, 50, 50], [60, 60, 100, 100]], [0, 0])
        gt["ignore"] = np.array([False, True])
        dt = make_dt(0, [[10, 10, 50, 50], [60, 60, 100, 100]],
                     [0.8, 0.9], [0, 0])
        res = evaluate_detections([dt], [gt], 1, mode="2D")
        np.testing.assert_allclose(res["AP"], 100.0, atol=0.5)


class TestAP3D:
    def test_perfect(self):
        ctr = np.array([[0, 0, 5.0], [2, 0, 8.0]])
        dims = np.array([[1, 1, 1.0], [1, 2, 1.0]])
        gt = make_gt(0, [[10, 10, 50, 50], [60, 60, 100, 100]], [0, 1], ctr, dims)
        dt = make_dt(0, [[10, 10, 50, 50], [60, 60, 100, 100]], [0.9, 0.8],
                     [0, 1], ctr, dims)
        res = evaluate_detections([dt], [gt], 2, mode="3D")
        np.testing.assert_allclose(res["AP"], 100.0, atol=0.5)
        np.testing.assert_allclose(res["AP50"], 100.0, atol=0.5)

    def test_offset_box_partial(self):
        ctr = np.array([[0, 0, 5.0]])
        dims = np.array([[2, 2, 2.0]])
        # offset by 1m along x: IoU3D = (1*2*2)/(8+8-4) = 1/3 -> hits thresholds <= 0.30
        dt_ctr = np.array([[1.0, 0, 5.0]])
        gt = make_gt(0, [[10, 10, 50, 50]], [0], ctr, dims)
        dt = make_dt(0, [[10, 10, 50, 50]], [0.9], [0], dt_ctr, dims)
        res = evaluate_detections([dt], [gt], 1, mode="3D")
        np.testing.assert_allclose(res["AP15"], 100.0, atol=0.5)
        np.testing.assert_allclose(res["AP25"], 100.0, atol=0.5)
        np.testing.assert_allclose(res["AP50"], 0.0, atol=0.5)
        # 6 of 10 thresholds (0.05..0.30) hit -> AP = 60
        np.testing.assert_allclose(res["AP"], 60.0, atol=1.0)

    def test_depth_bands(self):
        ctr_near = np.array([[0, 0, 5.0]])
        ctr_far = np.array([[0, 0, 40.0]])
        dims = np.array([[1, 1, 1.0]])
        gt1 = make_gt(0, [[10, 10, 50, 50]], [0], ctr_near, dims)
        gt2 = make_gt(1, [[10, 10, 50, 50]], [0], ctr_far, dims)
        dt1 = make_dt(0, [[10, 10, 50, 50]], [0.9], [0], ctr_near, dims)
        dt2 = make_dt(1, [[10, 10, 50, 50]], [0.9], [0],
                      np.array([[0, 0, 41.0]]), dims)  # far object missed
        res = evaluate_detections([dt1, dt2], [gt1, gt2], 1, mode="3D")
        np.testing.assert_allclose(res["AP_near"], 100.0, atol=0.5)
        assert res["AP_far"] < 30

    def test_proximity_ignores_unannotated_regions(self):
        ctr = np.array([[0, 0, 5.0]])
        dims = np.array([[1, 1, 1.0]])
        gt = make_gt(0, [[10, 10, 50, 50]], [0], ctr, dims)
        # second detection 20m away from any GT: proximity eval ignores it
        dt = make_dt(0, [[10, 10, 50, 50], [60, 60, 100, 100]], [0.8, 0.9],
                     [0, 0], np.array([[0, 0, 5.0], [0, 0, 25.0]]),
                     np.array([[1, 1, 1.0], [1, 1, 1.0]]))
        res_prox = evaluate_detections([dt], [gt], 1, mode="3D", proximity=True)
        res_plain = evaluate_detections([dt], [gt], 1, mode="3D", proximity=False)
        np.testing.assert_allclose(res_prox["AP"], 100.0, atol=0.5)
        assert res_plain["AP"] < 100.0


class TestSummarizeAll:
    """summarize_all's pooled-union aggregation vs the reference's
    re-accumulation of cached per-category evals across datasets
    (omni3d_evaluation.py:378-520): on a two-dataset fixture the pooled
    `overall` must equal a direct evaluation of the union of records, and
    per-dataset results must equal isolated evaluations."""

    def _two_datasets(self):
        rng = np.random.default_rng(3)
        data = {}
        for di, name in enumerate(["SUNRGBD_test", "KITTI_test"]):
            dts, gts = [], []
            for i in range(6):
                # image ids deliberately OVERLAP across datasets (both 0..5)
                n = 1 + int(rng.integers(0, 3))
                boxes = np.stack([
                    np.array([10 + 30 * j, 10, 40 + 30 * j, 60], np.float32)
                    for j in range(n)])
                classes = rng.integers(0, 3, n)
                ctrs = np.stack([np.array([j - 1, 0, 4.0 + 2 * j + di])
                                 for j in range(n)])
                dims = np.ones((n, 3)) + 0.1 * di
                gts.append(make_gt(i, boxes, classes, ctrs, dims))
                # detections: jitter half the boxes, drop one, add an FP
                dboxes = boxes + rng.normal(0, 2, boxes.shape).astype(np.float32)
                dctrs = ctrs + rng.normal(0, 0.1, ctrs.shape)
                scores = rng.uniform(0.3, 1.0, n).astype(np.float32)
                dts.append(make_dt(i, dboxes, scores, classes, dctrs, dims))
            data[name] = (dts, gts)
        return data

    def test_pooled_overall_equals_union_eval(self):
        from weakcube_tpu.evaluation.omni3d_eval import Omni3DEvaluationHelper
        data = self._two_datasets()
        helper = Omni3DEvaluationHelper(list(data), num_classes=3,
                                        proximity_datasets=())
        for name, (dts, gts) in data.items():
            for d, g in zip(dts, gts):
                assert helper.add_predictions(name, d, g)
        summary = helper.summarize_all()

        # per-dataset results match isolated evaluators
        for name, (dts, gts) in data.items():
            res2d = evaluate_detections(dts, gts, 3, "2D")
            res3d = evaluate_detections(dts, gts, 3, "3D")
            np.testing.assert_allclose(
                summary["per_dataset"][name]["AP2D"], res2d["AP"], atol=1e-9)
            np.testing.assert_allclose(
                summary["per_dataset"][name]["AP3D"], res3d["AP"], atol=1e-9)

        # overall matches a direct union evaluation with disambiguated ids
        union_dt, union_gt = [], []
        for di, (name, (dts, gts)) in enumerate(data.items()):
            for d, g in zip(dts, gts):
                union_dt.append(dict(d, image_id=d["image_id"] + 1000 * di))
                union_gt.append(dict(g, image_id=g["image_id"] + 1000 * di))
        res2d = evaluate_detections(union_dt, union_gt, 3, "2D")
        res3d = evaluate_detections(union_dt, union_gt, 3, "3D")
        np.testing.assert_allclose(summary["overall"]["AP2D"], res2d["AP"],
                                   atol=1e-9)
        np.testing.assert_allclose(summary["overall"]["AP3D"], res3d["AP"],
                                   atol=1e-9)
        for short, full in (("AP3D@15", "AP15"), ("AP3D@25", "AP25"),
                            ("AP3D@50", "AP50")):
            np.testing.assert_allclose(summary["overall"][short],
                                       res3d[full], atol=1e-9)
        # overlapping raw image ids must NOT have collided
        assert len(union_gt) == sum(len(g) for _, g in data.values())
