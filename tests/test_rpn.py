import jax
import jax.numpy as jnp
import numpy as np

from weakcube_tpu.models.rpn import (RPNLabels, label_and_sample_anchors,
                                     rpn_losses, select_proposals)
from weakcube_tpu.structures import GroundTruth


def make_gt(boxes, classes):
    boxes = np.asarray(boxes, np.float32).reshape(1, -1, 4)
    classes = np.asarray(classes, np.int32).reshape(1, -1)
    valid = np.ones(classes.shape, bool)
    return GroundTruth(boxes=jnp.asarray(boxes), classes=jnp.asarray(classes),
                       valid=jnp.asarray(valid))


ANCHORS = jnp.asarray(np.array([
    [0, 0, 10, 10],       # overlaps gt0 exactly
    [100, 100, 110, 110],  # overlaps nothing
    [2, 2, 12, 12],        # partial overlap with gt0
    [50, 50, 60, 60],      # inside ignore region
], np.float32))


class TestAnchorLabeling:
    def test_fg_bg_ignore(self):
        gt = make_gt([[0, 0, 10, 10], [45, 45, 70, 70]], [0, -1])
        lab = label_and_sample_anchors(
            jax.random.PRNGKey(0), ANCHORS, gt,
            batch_size_per_image=4, positive_fraction=1.0,
            iou_thresholds=[0.05, 0.05], iou_labels=[0, -1, 1],
            ignore_threshold=0.5)
        labels = np.asarray(lab.labels[0])
        assert labels[0] == 1           # exact match -> fg
        assert labels[2] == 1           # iou ~0.68 >= 0.05 -> fg
        assert labels[3] == -1          # bg anchor inside ignore region
        assert labels[1] in (0, -1)     # background (or unsampled)

    def test_best_anchor_forced(self):
        # tiny gt whose best anchor has low IoU: only forced if >= thresh
        gt = make_gt([[0, 0, 10, 10]], [0])
        lab = label_and_sample_anchors(
            jax.random.PRNGKey(1), ANCHORS, gt, 1, 1.0,
            [0.05, 0.05], [0, -1, 1], 0.5)
        labels = np.asarray(lab.labels[0])
        # with budget 1, the best anchor for the gt must still be positive
        assert labels[0] == 1 or labels[2] == 1

    def test_matched_boxes(self):
        gt = make_gt([[0, 0, 10, 10]], [0])
        lab = label_and_sample_anchors(
            jax.random.PRNGKey(2), ANCHORS, gt, 4, 1.0,
            [0.05, 0.05], [0, -1, 1], 0.5)
        np.testing.assert_allclose(np.asarray(lab.matched_boxes[0, 0]),
                                   [0, 0, 10, 10])


class TestRPNLoss:
    def test_iouness_targets(self):
        gt = make_gt([[0, 0, 10, 10]], [0])
        lab = label_and_sample_anchors(
            jax.random.PRNGKey(0), ANCHORS, gt, 4, 1.0,
            [0.05, 0.05], [0, -1, 1], 0.5)
        logits = jnp.zeros((1, 4))
        deltas = jnp.zeros((1, 4, 4))
        losses = rpn_losses(ANCHORS, logits, deltas, lab, 4)
        assert float(losses["rpn/cls"]) > 0
        assert float(losses["rpn/loc"]) >= 0
        assert np.isfinite(float(losses["rpn/cls"]))

    def test_perfect_predictions_low_loss(self):
        from weakcube_tpu.ops import boxes as B
        gt = make_gt([[0, 0, 10, 10]], [0])
        lab = label_and_sample_anchors(
            jax.random.PRNGKey(0), ANCHORS, gt, 4, 1.0,
            [0.05, 0.05], [0, -1, 1], 0.5)
        # logits = +inf-ish on fg (target IoU ~<=1), exact deltas
        logits = jnp.full((1, 4), 20.0)
        gt_deltas = B.get_deltas(ANCHORS, lab.matched_boxes[0])[None]
        perfect = rpn_losses(ANCHORS, logits, gt_deltas, lab, 4)
        sloppy = rpn_losses(ANCHORS, logits, jnp.zeros((1, 4, 4)), lab, 4)
        assert float(perfect["rpn/loc"]) < 1e-6
        assert float(sloppy["rpn/loc"]) > float(perfect["rpn/loc"])


class TestSelectProposals:
    def test_static_shapes_and_ordering(self):
        anchors = [jnp.asarray(np.array(
            [[0, 0, 10, 10], [20, 20, 40, 40], [0, 0, 11, 11], [60, 60, 90, 90]],
            np.float32))]
        logits = [jnp.asarray(np.array([[3.0, 2.0, 2.9, 1.0]], np.float32))]
        deltas = [jnp.zeros((1, 4, 4))]
        props = select_proposals(anchors, logits, deltas,
                                 jnp.asarray([[128.0, 128.0]]),
                                 pre_nms_topk=4, post_nms_topk=3,
                                 nms_thresh=0.5)
        assert props.boxes.shape == (1, 3, 4)
        v = np.asarray(props.valid[0])
        s = np.asarray(props.scores[0])
        # anchor 2 overlaps anchor 0 (iou > 0.5) and scores lower -> suppressed
        assert v.sum() == 3
        assert s[0] >= s[1] >= s[2]
        np.testing.assert_allclose(np.asarray(props.boxes[0, 0]), [0, 0, 10, 10])
