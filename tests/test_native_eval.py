"""Native C++ matcher vs the numpy reference implementation."""
import numpy as np
import pytest

from weakcube_tpu.evaluation import omni3d_eval
from weakcube_tpu.evaluation._native import get_lib, native_match


def _numpy_match(dt_scores, iou_mat, gt_ignore, iou_thrs, dt_ignore):
    """The pure-numpy body of _match_image (bypass native dispatch)."""
    D, G = iou_mat.shape
    T = len(iou_thrs)
    order = np.argsort(-dt_scores, kind="stable")
    dtm = -np.ones((T, D), np.int64)
    dt_ig = np.zeros((T, D), bool)
    g_order = np.argsort(gt_ignore.astype(np.int8), kind="stable")
    for ti, t in enumerate(iou_thrs):
        gt_taken = np.zeros(G, bool)
        for di in order:
            best, best_iou = -1, min(t, 1 - 1e-10)
            for gi in g_order:
                if gt_taken[gi] and not gt_ignore[gi]:
                    continue
                if best > -1 and not gt_ignore[best] and gt_ignore[gi]:
                    break
                if iou_mat[di, gi] < best_iou:
                    continue
                best_iou = iou_mat[di, gi]
                best = gi
            if best >= 0:
                gt_taken[best] = True
                dtm[ti, di] = best
                dt_ig[ti, di] = gt_ignore[best]
            else:
                dt_ig[ti, di] = dt_ignore[di]
    return dtm, dt_ig


class TestNativeMatch:
    def test_compiles(self):
        assert get_lib() is not None, "g++ available but native build failed"

    def test_matches_numpy_random(self):
        rng = np.random.default_rng(0)
        for trial in range(20):
            D = int(rng.integers(1, 30))
            G = int(rng.integers(1, 20))
            scores = rng.uniform(0, 1, D)
            iou = rng.uniform(0, 1, (D, G))
            gt_ig = rng.uniform(0, 1, G) < 0.3
            dt_ig = rng.uniform(0, 1, D) < 0.2
            thrs = np.array([0.1, 0.5, 0.9])
            got = native_match(scores, iou, gt_ig, thrs, dt_ig)
            assert got is not None
            want = _numpy_match(scores, iou, gt_ig, thrs, dt_ig)
            np.testing.assert_array_equal(got[0], want[0], err_msg=f"trial {trial}")
            np.testing.assert_array_equal(got[1], want[1], err_msg=f"trial {trial}")
