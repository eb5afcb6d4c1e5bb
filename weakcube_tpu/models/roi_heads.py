"""3D ROI heads: supervised (`ROIHeads3D`) and weak (`ROIHeads3DScore`).

TPU-native re-design of the reference's core component
(cubercnn/modeling/roi_heads/roi_heads.py, 2230 LoC). Structural changes:

  * Per-image dynamic `Instances` -> dense (B, S) arrays + fg/valid masks.
    The reference's per-instance Python loops over bube corners / projected
    boxes / RANSAC (roi_heads.py:948-960, 466-528) are single vmapped ops.
  * `safely_reduce_losses` (roi_heads.py:1307-1315) -> ops.losses.masked_mean
    (non-finite entries masked out, empty -> 0).
  * Virtual depth (roi_heads.py:904-905): in network-resolution intrinsics
    the scale collapses to VIRTUAL_FOCAL / K_net[1,1] (see
    cuboids.compute_virtual_scale_from_focal_spaces algebra).
  * Proposal labelling/sampling (roi_heads.py:1201-1304): matcher + ignore
    IoA + IoU-weighted Gumbel-top-k subsampling to a fixed S slots.

Both heads share the box branch; they differ only in the cube-branch loss
assembly, exactly as in the reference.
"""
from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import boxes as box_ops
from ..ops import cuboids
from ..ops import hull as hull_ops
from ..ops import losses as loss_ops
from ..ops import plane as plane_ops
from ..ops import rotations
from ..ops import sampling
from ..ops.roi_align import multilevel_roi_align
from ..structures import Detections, GroundTruth, Proposals, SampledRois, match_boxes
from .cube_head import CubeHead
from .fast_rcnn import (FastRCNNConvFCHead, FastRCNNPredictor, fast_rcnn_inference,
                        fast_rcnn_losses, predict_boxes)

SQRT2 = math.sqrt(2.0)
FPN_STRIDES = (4, 8, 16, 32, 64)


# ===========================================================================
# proposal labelling / sampling
# ===========================================================================

def label_and_sample_proposals(key: jax.Array, proposals: Proposals,
                               gt: GroundTruth, num_classes: int,
                               batch_size_per_image: int,
                               positive_fraction: float,
                               iou_thresholds: Sequence[float],
                               ignore_threshold: float = 0.5,
                               append_gt: bool = True) -> SampledRois:
    """Match RoIs to GTs, handle ignore regions, subsample to S slots."""

    if append_gt:
        boxes = jnp.concatenate([proposals.boxes, gt.boxes], axis=1)
        valid = jnp.concatenate([proposals.valid, gt.is_fg], axis=1)
    else:
        boxes, valid = proposals.boxes, proposals.valid

    def per_image(key, boxes, pvalid, gt_boxes, gt_classes, gt_valid):
        fg_gt = gt_valid & (gt_classes >= 0)
        ign_gt = gt_valid & (gt_classes < 0)
        iou = box_ops.pairwise_iou(gt_boxes, boxes)
        matched_idx, matched_vals, matched_labels = match_boxes(
            iou, fg_gt, list(iou_thresholds), [0, 1])
        # ignore regions flip background -> ignore (roi_heads.py:1259-1272)
        ioa = jnp.where(ign_gt[:, None], box_ops.pairwise_ioa(gt_boxes, boxes), 0.0)
        in_ignore = jnp.max(ioa, axis=0) >= ignore_threshold
        matched_labels = jnp.where((matched_labels == 0) & in_ignore, -1, matched_labels)
        matched_labels = jnp.where(pvalid, matched_labels, -1)

        is_fg = matched_labels == 1
        is_bg = matched_labels == 0
        fg_mask, bg_mask = sampling.sample_fg_bg(
            key, is_fg, is_bg, batch_size_per_image, positive_fraction,
            fg_log_weights=jnp.log(matched_vals + 1e-4))
        chosen = fg_mask | bg_mask

        # compact the chosen RoIs into S fixed slots (fg first)
        S = batch_size_per_image
        order_key = jnp.where(fg_mask, 0, jnp.where(bg_mask, 1, 2))
        order = jnp.argsort(order_key.astype(jnp.float32)
                            - 1e-6 * matched_vals)  # stable-ish: fg by IoU first
        sel = order[:S]
        roi_boxes = boxes[sel]
        roi_fg = fg_mask[sel]
        roi_valid = chosen[sel]
        roi_gt_idx = matched_idx[sel]
        classes = jnp.where(roi_fg, gt_classes[roi_gt_idx], num_classes)
        return SampledRois(roi_boxes, classes, roi_gt_idx, roi_fg, roi_valid)

    keys = jax.random.split(key, boxes.shape[0])
    return jax.vmap(per_image)(keys, boxes, valid, gt.boxes, gt.classes, gt.valid)


def gather_gt(gt_field: jnp.ndarray, gt_idx: jnp.ndarray) -> jnp.ndarray:
    """Gather per-RoI GT attributes: (B, G, ...) x (B, S) -> (B, S, ...)."""
    return jax.vmap(lambda f, i: f[i])(gt_field, gt_idx)


def fg_prefix_rois(rois: SampledRois, positive_fraction: float) -> SampledRois:
    """Static slice to the slots that can hold foreground.

    `label_and_sample_proposals` packs chosen fg RoIs into the leading
    slots and `sample_fg_bg` caps their count at
    int(S * positive_fraction), so rois[:, :cap] contains EVERY fg RoI —
    the static-shape equivalent of detectron2's
    `select_foreground_proposals` (reference roi_heads.py:714, 1632),
    which restricts the cube branch to fg instances only."""
    S = rois.boxes.shape[1]
    cap = max(int(S * positive_fraction), 1)
    if cap >= S:
        return rois
    return jax.tree_util.tree_map(lambda x: x[:, :cap], rois)


def iou3d_train_metric(dec: "CubeDecode", gt: GroundTruth, rois, K,
                       fg: jnp.ndarray,
                       tick: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Exact matched IoU3D between GT cubes and the decoded predictions at
    the sampled foreground RoIs — the reference's `Cube/IoU3D` training
    scalar (roi_heads.py:936-945, logged every 200 iters "because it is
    slow"). Ours is slow for the same reason at recipe scale (~135 ms for
    25x128 pairs of sequential polytope clipping on a v5e), so `tick`
    preserves the every-200 gating: a traced bool (train_step derives it
    from state.step); when False the lax.cond skips the compute and the
    metric reads NaN for that step. tick=None computes unconditionally
    (tests/small batches). Requires gt.boxes3D/gt.poses (zero-filled on
    datasets without 3D GT, where the metric reads 0)."""
    from ..ops import iou3d

    def compute():
        g3d = gather_gt(gt.boxes3D, rois.gt_idx)
        gposes = gather_gt(gt.poses, rois.gt_idx)
        gt_ctr = cuboids.backproject(g3d[..., 0:2], g3d[..., 2], K[:, None])
        gt_corners = cuboids.get_cuboid_verts_3d(
            jnp.concatenate([gt_ctr, g3d[..., 3:6]], -1), gposes)
        pred_corners = dec.cubes.corners()
        B, S = fg.shape
        iou = iou3d.matched_iou3d(gt_corners.reshape(B * S, 8, 3),
                                  pred_corners.reshape(B * S, 8, 3)).reshape(B, S)
        return loss_ops.masked_mean(iou, fg)

    if tick is None:
        return jax.lax.stop_gradient(compute())
    return jax.lax.stop_gradient(
        jax.lax.cond(tick, compute, lambda: jnp.float32(jnp.nan)))


# ===========================================================================
# shared cube decode
# ===========================================================================

class CubeDecode(NamedTuple):
    x: jnp.ndarray            # (B, S) projected 2D centre x (network px)
    y: jnp.ndarray
    z: jnp.ndarray            # (B, S) metric depth (real space)
    z_norm: jnp.ndarray       # pre-transform z (for z-type losses)
    dims: jnp.ndarray         # (B, S, 3) metric w,h,l
    dims_norm: jnp.ndarray    # raw head output
    pose: jnp.ndarray         # (B, S, 3, 3) egocentric
    pose_allo: jnp.ndarray    # (B, S, 3, 3) allocentric (pre-conversion)
    uncert: jnp.ndarray       # (B, S)
    cubes: cuboids.Cubes      # (B, S) full cubes (camera space)
    virtual_to_real: jnp.ndarray  # (B, S)
    z_cluster_stats: Optional[jnp.ndarray] = None  # (B, S, 2) [mean, std]


def decode_cube_predictions(deltas_2d, z_raw, dims_raw, pose_raw, uncert,
                            classes, roi_boxes, K, cfg_head,
                            dims_priors: Optional[jnp.ndarray],
                            z_scales: Optional[jnp.ndarray] = None,
                            z_stats: Optional[jnp.ndarray] = None) -> CubeDecode:
    """Per-class selection + decode to metric cubes (roi_heads.py:809-935).

    All inputs are (B, S, C, ...) head outputs; classes (B, S) selects the
    per-class slice. K: (B, 3, 3) at network resolution.
    z_scales/z_stats: (C, bins) / (C, bins, 2) cluster priors when
    CLUSTER_BINS > 1 (roi_heads.py:824-845, 874-902).
    """
    B, S = classes.shape
    cls = jnp.clip(classes, 0, deltas_2d.shape[2] - 1)

    def sel(x):
        return jnp.take_along_axis(
            x, cls.reshape(B, S, 1, *([1] * (x.ndim - 3))), axis=2)[:, :, 0]

    d2d = sel(deltas_2d)                    # (B, S, 2)
    dims_norm = sel(dims_raw)               # (B, S, 3)
    pose_allo = sel(pose_raw)               # (B, S, 3, 3)

    assignments = None
    if cfg_head.CLUSTER_BINS > 1 and z_scales is not None:
        # assign each RoI to its closest 2D-scale cluster per its class
        # (roi_heads.py:824-838): src_scales = diag length of the RoI box
        w = roi_boxes[..., 2] - roi_boxes[..., 0]
        h = roi_boxes[..., 3] - roi_boxes[..., 1]
        src_scales = jnp.sqrt(w * w + h * h)            # (B, S)
        zs = jnp.asarray(z_scales)[cls]                 # (B, S, bins)
        assignments = jnp.argmin(jnp.abs(zs - src_scales[..., None]), -1)
        # z_raw is (B, S, bins, C): pick (bin, class)
        z_bc = jnp.take_along_axis(
            z_raw, cls[..., None, None].repeat(z_raw.shape[2], 2), axis=3)[..., 0]
        z = jnp.take_along_axis(z_bc, assignments[..., None], -1)[..., 0]
    elif z_raw.ndim == 3:
        z = sel(z_raw[..., None])[..., 0]
    else:
        z = sel(z_raw)
    unc = sel(uncert[..., None])[..., 0] if uncert is not None else jnp.zeros((B, S))

    w = roi_boxes[..., 2] - roi_boxes[..., 0]
    h = roi_boxes[..., 3] - roi_boxes[..., 1]
    cx = roi_boxes[..., 0] + 0.5 * w
    cy = roi_boxes[..., 1] + 0.5 * h
    x = cx + w * d2d[..., 0]
    y = cy + h * d2d[..., 1]

    # dims priors (roi_heads.py:850-865)
    if cfg_head.DIMS_PRIORS_ENABLED and dims_priors is not None:
        pri = jnp.asarray(dims_priors)[cls]  # (B, S, 2, 3); trace-time constant
        mean, std = pri[..., 0, :], pri[..., 1, :]
        if cfg_head.DIMS_PRIORS_FUNC == "sigmoid":
            lo = jnp.clip(mean - 3 * std, 0.0)
            hi = mean + 3 * std
            dims = cuboids.scaled_sigmoid(dims_norm, lo, hi)
        else:
            dims = jnp.exp(jnp.clip(dims_norm, max=5.0)) * mean
    else:
        dims = jnp.exp(jnp.clip(dims_norm, max=5.0))

    # allocentric -> egocentric at the predicted centre (roi_heads.py:867-870)
    if cfg_head.ALLOCENTRIC_POSE:
        pose = cuboids.R_from_allocentric(
            K[:, None], pose_allo, jax.lax.stop_gradient(x), jax.lax.stop_gradient(y))
    else:
        pose = pose_allo

    z_norm = z
    if cfg_head.Z_TYPE == "sigmoid":
        z = jax.nn.sigmoid(z) * 100.0
        z_norm = jax.nn.sigmoid(z_norm)
    elif cfg_head.Z_TYPE == "log":
        z = jnp.exp(z)
    z_cluster_stats = None
    if cfg_head.Z_TYPE == "clusters" and z_stats is not None \
            and assignments is not None:
        # scaled sigmoid into +-3 sigma of the assigned cluster's depth
        # statistics (roi_heads.py:886-902)
        stats = jnp.asarray(z_stats)[cls]               # (B, S, bins, 2)
        stats = jnp.take_along_axis(
            stats, assignments[..., None, None].repeat(2, -1), axis=2)[:, :, 0]
        z_means = jax.lax.stop_gradient(stats[..., 0])
        z_stds = jax.lax.stop_gradient(stats[..., 1])
        lo = jnp.clip(z_means - 3 * z_stds, 0.0)
        hi = z_means + 3 * z_stds
        z = cuboids.scaled_sigmoid(z, lo, hi)
        z_cluster_stats = jnp.stack([z_means, z_stds], -1)

    fy = K[:, 1, 1]
    v2r = (cfg_head.VIRTUAL_FOCAL / jnp.maximum(fy, 1e-6))[:, None] \
        if cfg_head.VIRTUAL_DEPTH else jnp.ones((B, 1))
    v2r = jnp.broadcast_to(v2r, (B, S))
    z = z * v2r if cfg_head.VIRTUAL_DEPTH else z

    ctr3d = cuboids.backproject(jnp.stack([x, y], -1), z, K[:, None])
    cubes = cuboids.Cubes.from_parts(ctr3d, dims, pose)
    return CubeDecode(x, y, z, z_norm, dims, dims_norm, pose, pose_allo,
                      unc, cubes, v2r, z_cluster_stats)


# ===========================================================================
# weak losses (vectorised; reference methods of ROIHeads3DScore)
# ===========================================================================

def iou_projection_loss(gt_boxes, proj_boxes):
    """gIoU of projected cube box vs GT 2D box (roi_heads.py:977-978)."""
    return box_ops.giou_loss(gt_boxes, proj_boxes)


def pose_alignment_loss(pose, fg, batch_mask=None):
    """Intra-image pose consistency (roi_heads.py:445-464): mean over all
    FG pairs of 1 - |cos relative angle|, averaged over images with >= 2
    boxes. Returns a scalar (the reference broadcasts it per box)."""
    def per_image(R, m):
        vals, pmask = rotations.so3_relative_angle_pairs(R, m, cos_angle=True)
        n_pairs = jnp.sum(pmask)
        s = jnp.sum(jnp.where(pmask, 1.0 - jnp.abs(vals), 0.0))
        return s / jnp.maximum(n_pairs, 1), n_pairs > 0
    sums, has_pairs = jax.vmap(per_image)(pose, fg)
    n_img = jnp.sum(has_pairs)
    return jnp.sum(jnp.where(has_pairs, sums, 0.0)) / jnp.maximum(n_img, 1), n_img > 0


def ground_normals_from_maps(key, depth_maps, ground_masks, ground_valid,
                             use_nth: int = 5, K=None,
                             num_hypotheses: int = 1000):
    """Per-image up-vector from depth point cloud + RANSAC
    (roi_heads.py:466-528 `normal_vector_from_maps`).

    depth_maps: (B, H, W); ground_masks: (B, H, W) bool (all-True when no
    ground map — reference falls back to the whole image); ground_valid:
    (B,) whether a real ground map exists; K: (B, 3, 3).
    Returns (B, 3) unit normals with the wall-flip orientation fixes.
    """
    B, H, W = depth_maps.shape
    z = depth_maps[:, ::use_nth, ::use_nth]
    m = ground_masks[:, ::use_nth, ::use_nth]
    h, w = z.shape[1], z.shape[2]
    # the reference rebuilds the point cloud against the SUBSAMPLED map with
    # integer-divided focals and the subsampled principal point (w/2, h/2)
    u = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    v = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    fx = (K[:, 0, 0] // use_nth)[:, None, None]
    fy = (K[:, 1, 1] // use_nth)[:, None, None]
    x = (u - w / 2.0) * z / jnp.maximum(fx, 1e-6)
    y = (v - h / 2.0) * z / jnp.maximum(fy, 1e-6)
    pts = jnp.stack([x, y, z], axis=-1).reshape(B, h * w, 3)
    valid_pts = m.reshape(B, h * w)

    def per_image(key, pts, vp):
        eq, _ = plane_ops.ransac_plane(key, pts, vp, thresh=0.05,
                                       num_hypotheses=num_hypotheses)
        n = eq[:3]
        # wall-flip heuristics (roi_heads.py:507-520)
        ax, ay, az = jnp.abs(n[0]), jnp.abs(n[1]), jnp.abs(n[2])
        n = jnp.where(az > ay, jnp.array([1.0, 1.0, -1.0]) * n[jnp.array([0, 2, 1])], n)
        ax, ay = jnp.abs(n[0]), jnp.abs(n[1])
        n = jnp.where(ax > ay, jnp.array([-1.0, 1.0, 1.0]) * n[jnp.array([2, 0, 1])], n)
        n = jnp.where(n[1] < 0, -n, n)
        return n

    keys = jax.random.split(key, B)
    return jax.vmap(per_image)(keys, pts, valid_pts)


def pose_ground_loss(pose, normals):
    """1 - |cos| between predicted up (row 1 of R) and the ground normal
    (roi_heads.py:987-995)."""
    pred_up = pose[..., 1, :]                       # (B, S, 3)
    n = normals[:, None, :]
    cos = jnp.sum(pred_up * n, -1) / jnp.maximum(
        jnp.linalg.norm(pred_up, axis=-1) * jnp.linalg.norm(n, axis=-1), 1e-8)
    return 1.0 - jnp.abs(cos)


def normal_to_rotation(normals):
    """Ground normal -> full rotation matrix (roi_heads.py:686-696)."""
    x1 = jnp.array([1.0, 0.0, 0.0])
    t0 = jnp.cross(jnp.broadcast_to(normals, normals.shape), x1)
    # fall back to y-axis when the normal is parallel to x
    small = jnp.sum(t0 * t0, -1, keepdims=True) < 1e-3
    t0 = jnp.where(small, jnp.cross(normals, jnp.array([0.0, 1.0, 0.0])), t0)
    t0 = t0 / jnp.maximum(jnp.linalg.norm(t0, axis=-1, keepdims=True), 1e-8)
    t1 = jnp.cross(normals, t0)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-8)
    return jnp.stack([t0, t1, normals], axis=-2)


def pose_ground2_loss(pose, normals):
    """Rotation-matrix variant (roi_heads.py:997-1007)."""
    R_gt = normal_to_rotation(normals)[:, None]
    return 1.0 - rotations.so3_relative_angle(pose, R_gt, cos_angle=True)


def sample_depth_at(depth_maps, xy, image_wh):
    """Depth at (clamped) pixel positions: (B,H,W) x (B,S,2) -> (B,S)
    (roi_heads.py:635-656 clamps to [10, w-11])."""
    B, H, W = depth_maps.shape
    wh = jnp.broadcast_to(image_wh, (B, 2))
    x = jnp.clip(xy[..., 0], 10, wh[:, 0:1] - 11).astype(jnp.int32)
    y = jnp.clip(xy[..., 1], 10, wh[:, 1:2] - 11).astype(jnp.int32)
    return jax.vmap(lambda d, yy, xx: d[yy, xx])(depth_maps, y, x)


def pseudo_gt_z_point_loss(depth_maps, xy, z, image_wh):
    return jnp.abs(z - sample_depth_at(depth_maps, xy, image_wh))


def masked_median_depth_in_boxes(depth_maps, boxes, image_wh,
                                 grid: int = 32):
    """Median depth inside each box via a fixed bilinear sample grid.

    The reference takes an exact median over the dynamic box crop
    (roi_heads.py:575-610). A fixed 32x32 sample lattice inside the box is
    the static-shape analogue (median over 1024 samples; identical up to
    sampling noise).
    """
    B, H, W = depth_maps.shape
    wh = jnp.broadcast_to(image_wh, (B, 2))
    b = box_ops.clip_boxes(boxes, wh[:, None, :])
    gs = (jnp.arange(grid, dtype=jnp.float32) + 0.5) / grid
    xs = b[..., 0:1] + (b[..., 2:3] - b[..., 0:1]) * gs            # (B, S, g)
    ys = b[..., 1:2] + (b[..., 3:4] - b[..., 1:2]) * gs

    def per_image(d, xs, ys):
        xi = jnp.clip(xs, 0, W - 1).astype(jnp.int32)               # (S, g)
        yi = jnp.clip(ys, 0, H - 1).astype(jnp.int32)
        vals = d[yi[:, :, None], xi[:, None, :]]                     # (S, g, g)
        return jnp.median(vals.reshape(vals.shape[0], -1), axis=-1)

    med = jax.vmap(per_image)(depth_maps, xs, ys)
    # degenerate boxes (zero area) -> fall back to centre-point depth
    area = box_ops.area(b)
    ctr = jnp.stack([(b[..., 0] + b[..., 2]) / 2, (b[..., 1] + b[..., 3]) / 2], -1)
    fallback = sample_depth_at(depth_maps, ctr, image_wh)
    return jnp.where(area > 0, med, fallback)


def pseudo_gt_z_box_loss(depth_maps, proj_boxes, z, image_wh):
    return jnp.abs(z - masked_median_depth_in_boxes(depth_maps, proj_boxes, image_wh))


def dims_prior_loss(dims, classes, dims_priors):
    """Hinged z-score of dims vs per-category priors (roi_heads.py:612-633).
    Returns (B, S, 3) per-axis scores."""
    pri = jnp.asarray(dims_priors)[jnp.clip(classes, 0, dims_priors.shape[0] - 1)]
    mean, std = pri[..., 0, :], pri[..., 1, :]
    score = jnp.abs(dims - mean) / jnp.maximum(std, 1e-6)
    return jnp.maximum(score - 1.0, 0.0)


def z_area_search_loss(gt_boxes, cubes: cuboids.Cubes, K, image_wh,
                       max_count: int = 50):
    """Area-matched depth search (roi_heads.py:530-573): slide the cube
    along z in 0.1 m steps, pick the step whose projected-box area best
    matches the GT box area, penalise |z - z_best| / 2. Vectorised over
    (B, S, max_count)."""
    B, S = cubes.tensor.shape[:2]
    gt_area = box_ops.area(gt_boxes)                       # (B, S)
    proj = cubes.to_boxes(K[:, None], image_wh[:, None])
    pred_area = box_ops.area(proj)
    steps = jnp.linspace(0.0, (max_count - 1) / 10.0, max_count)

    sign = jnp.where(gt_area < pred_area, 1.0, -1.0)       # grow z if too big
    z0 = cubes.centers[..., 2]
    cand_z = z0[..., None] + sign[..., None] * steps       # (B, S, T)
    # rebuild candidate cubes with shifted z (centres move along the ray? the
    # reference shifts raw z only, keeping x, y camera coords fixed)
    ctr = jnp.repeat(cubes.centers[..., None, :], max_count, axis=-2)
    ctr = ctr.at[..., 2].set(cand_z)
    cand = cuboids.Cubes.from_parts(
        ctr, jnp.repeat(cubes.dims[..., None, :], max_count, -2),
        jnp.repeat(cubes.rotations[..., None, :, :], max_count, -3))
    cand_boxes = cand.to_boxes(K[:, None, None], image_wh[:, None, None])
    cand_area = box_ops.area(cand_boxes)                   # (B, S, T)
    cand_area = jnp.where(cand_area == 0, 1e7, cand_area)
    best = jnp.argmin(jnp.abs(cand_area - gt_area[..., None]), axis=-1)
    z_best = jnp.take_along_axis(cand_z, best[..., None], -1)[..., 0]
    loss = jnp.abs(z0 - jax.lax.stop_gradient(z_best))

    # centre-outside-gt fallback: flat 0.1 * max_count penalty (:569-571)
    ctr2d = (proj[..., :2] + proj[..., 2:]) / 2.0
    inside = (ctr2d[..., 0] >= gt_boxes[..., 0] - max_count) & \
             (ctr2d[..., 1] >= gt_boxes[..., 1] - max_count)
    return jnp.where(inside, loss, 0.1 * max_count) / 2.0


def depth_range_loss(depth_maps, masks, gt_idx, gt_boxes, cubes, image_wh):
    """q90 - q10 of depth under the instance mask (or GT box fallback) vs
    the cube's corner-depth extent (roi_heads.py:658-684).

    masks: per-GT instance masks (B, G, MH, MW) bool in image-normalised
    coordinates, or None -> always sample the GT-box region. Per-RoI masks
    are gathered by gt_idx (the reference's first_occurrence indexing).
    Depth values are sampled on a fixed 32x32 lattice inside the GT box;
    mask membership is evaluated at the same lattice points.
    """
    corner_z = cubes.corners()[..., 2]
    pred_range = jnp.max(corner_z, -1) - jnp.min(corner_z, -1)   # (B, S)

    B, H, W = depth_maps.shape
    gs = 32
    g = (jnp.arange(gs, dtype=jnp.float32) + 0.5) / gs
    wh = jnp.broadcast_to(image_wh, (B, 2))
    b = box_ops.clip_boxes(gt_boxes, wh[:, None])
    xs = b[..., 0:1] + (b[..., 2:3] - b[..., 0:1]) * g           # (B, S, gs)
    ys = b[..., 1:2] + (b[..., 3:4] - b[..., 1:2]) * g

    def per_image(d, xs, ys, m, wh_i):
        S = xs.shape[0]
        xi = jnp.clip(xs, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(ys, 0, H - 1).astype(jnp.int32)
        vals = d[yi[:, :, None], xi[:, None, :]].reshape(S, -1)   # (S, gs*gs)
        if m is not None:
            MH, MW = m.shape[-2:]
            # lattice points in mask-grid coords (masks cover the image frame)
            mx = jnp.clip(xs / jnp.maximum(wh_i[0], 1.0) * MW, 0, MW - 1).astype(jnp.int32)
            my = jnp.clip(ys / jnp.maximum(wh_i[1], 1.0) * MH, 0, MH - 1).astype(jnp.int32)
            sel = m[jnp.arange(S)[:, None, None], my[:, :, None], mx[:, None, :]]
            sel = sel.reshape(S, -1)
            use_mask = jnp.sum(sel, -1) > 0
            vals = jnp.where(sel | ~use_mask[:, None], vals, jnp.nan)
        q90 = jnp.nanquantile(vals, 0.9, axis=-1)
        q10 = jnp.nanquantile(vals, 0.1, axis=-1)
        return q90 - q10

    if masks is None:
        gt_range = jax.vmap(lambda d, xs, ys, wh_i: per_image(d, xs, ys, None, wh_i))(
            depth_maps, xs, ys, wh)
    else:
        roi_masks = gather_gt(masks, gt_idx)                     # (B, S, MH, MW)
        gt_range = jax.vmap(per_image)(depth_maps, xs, ys, roi_masks, wh)
    return jnp.abs(jax.lax.stop_gradient(gt_range) - pred_range)


def segment_loss(masks, gt_idx, bube_corners, image_wh):
    """Differentiable hull of bube corners vs instance masks, focal loss
    (roi_heads.py:420-443).

    masks: per-GT (B, G, MH, MW) bool covering the image frame; the per-RoI
    mask is gathered by gt_idx. Bube corners (image coords) are rescaled
    into the mask grid before the soft-hull rasterisation.
    """
    B = bube_corners.shape[0]
    MH, MW = masks.shape[-2:]
    roi_masks = gather_gt(masks, gt_idx)                # (B, S, MH, MW)
    wh = jnp.broadcast_to(image_wh, (B, 2))
    sx = (MW / jnp.maximum(wh[:, 0], 1.0))[:, None, None]
    sy = (MH / jnp.maximum(wh[:, 1], 1.0))[:, None, None]
    corners = jnp.stack([bube_corners[..., 0] * sx,
                         bube_corners[..., 1] * sy], -1)

    def per_roi(c, m):
        soft = hull_ops.soft_hull_mask(c, MH, MW)
        # reference calls sigmoid_focal_loss(y=mask, y_hat=hull) with the
        # arguments transposed (mask as "logits"); we keep the intended
        # semantics: focal of hull prediction against the mask.
        fl = loss_ops.sigmoid_focal_loss(soft * 8.0 - 4.0, m.astype(jnp.float32))
        return jnp.mean(fl)

    return jax.vmap(jax.vmap(per_roi))(corners, roi_masks)


# ===========================================================================
# ROI heads modules
# ===========================================================================

class ROIHeadsCommon(nn.Module):
    """Shared box branch + cube pooling/decoding plumbing."""

    cfg: Any
    num_classes: int
    dims_priors: Optional[Any] = None   # (C, 2, 3) [mean, std], host numpy
    z_scales: Optional[Any] = None      # (C, bins) cluster 2D scales
    z_stats: Optional[Any] = None       # (C, bins, 2) cluster z mean/std
    dtype: Any = jnp.float32

    def setup(self):
        rb = self.cfg.MODEL.ROI_BOX_HEAD
        rc = self.cfg.MODEL.ROI_CUBE_HEAD
        self.box_head = FastRCNNConvFCHead(rb.NUM_FC, rb.FC_DIM, self.dtype)
        self.box_predictor = FastRCNNPredictor(self.num_classes, self.dtype)
        self.cube_head = CubeHead(
            num_classes=self.num_classes, num_fc=rc.NUM_FC, fc_dim=rc.FC_DIM,
            shared_fc=rc.SHARED_FC, pose_type=rc.POSE_TYPE,
            cluster_bins=rc.CLUSTER_BINS, use_confidence=rc.USE_CONFIDENCE,
            dtype=self.dtype)

    # ---- pooling ---------------------------------------------------------
    def _pool(self, features: Dict[str, jnp.ndarray], boxes: jnp.ndarray,
              resolution: int, inference: bool = False) -> jnp.ndarray:
        feats = [features[f] for f in self.cfg.MODEL.ROI_HEADS.IN_FEATURES]
        strides = FPN_STRIDES[:len(feats)]
        use_pallas = ("USE_PALLAS_ROI_ALIGN" in self.cfg.TPU
                      and self.cfg.TPU.USE_PALLAS_ROI_ALIGN
                      # Mosaic kernels only lower on TPU; CPU (tests,
                      # dryrun) deterministically takes the XLA paths
                      and jax.default_backend() == "tpu")
        if inference and use_pallas:
            # forward-only Pallas kernel: inference path. Features go in
            # AS-IS (the kernel stages bf16 window tiles internally — a
            # host-side f32 cast only materialises a 2x pyramid copy) and
            # the pooled output comes back in the feature dtype.
            from ..ops.roi_align_pallas import multilevel_roi_align_pallas
            return multilevel_roi_align_pallas(feats, boxes, strides,
                                               resolution)
        # reference POOLER_SAMPLING_RATIO=0 means adaptive; the static
        # equivalent is 2 samples/bin (d2's effective value at RoI ~ 14
        # units); values > 0 are honoured verbatim
        sr = self.cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO or 2
        if inference:
            return multilevel_roi_align(feats, boxes, strides, resolution,
                                        sampling_ratio=sr)
        # Training feature-gradient plan (boxes are stop-gradient'd
        # upstream so their zero cotangent is exact in every plan):
        #   matmul   (default) scatter-free: two MXU einsums per level
        #            against closed-form hat-function interpolation
        #            matrices (ops/roi_align.py::matmul_bwd)
        #   windowed one (2,2,C)-block scatter_add per sample — 4x fewer
        #            scatter rows than autodiff, but scatter serializes on
        #            TPU and this plan faults the v5e libtpu at compile
        #            ("TPU worker process crashed", bisected 2026-08-20)
        #   autodiff XLA's per-corner scatter of the gather forward
        # Forward plan: the take_along_axis gather runs at ~3% of HBM
        # bandwidth at recipe scale (191 ms for the b25x512 box pooler,
        # round-3 tools/bench_fwd_parts.py); the dense-contraction "matmul"
        # forward (same separable plan as the matmul backward, the default)
        # rides the MXU and measures 124.8 ms for the ENTIRE model forward
        # (fwd_only, vs 307.5 with the gather). Monolithic train graphs
        # containing it fault the 2026-08 axon libtpu when the depth/ground
        # maps are runtime arguments alongside the backbone (round-4
        # arg-narrowing bisect) — the default four-program backbone-split
        # step (parallel/train_step.py split="backbone") keeps them in
        # separate programs and runs clean.
        # Both plans come from cfg.TPU (YAML-first); the WEAKCUBE_RA_* env
        # vars override at TRACE time (bench sweeps) — set before the first
        # train step compiles; later changes don't touch cached executables.
        import os
        plan = os.environ.get("WEAKCUBE_RA_TRAIN_BWD",
                              self.cfg.TPU.ROI_ALIGN_TRAIN_BWD)
        if plan not in ("matmul", "windowed", "autodiff"):
            raise ValueError(
                f"ROI_ALIGN_TRAIN_BWD={plan!r}: expected one of "
                "'matmul', 'windowed', 'autodiff'")
        fwd_plan = os.environ.get("WEAKCUBE_RA_TRAIN_FWD",
                                  self.cfg.TPU.ROI_ALIGN_TRAIN_FWD)
        if fwd_plan not in ("matmul", "gather", "pallas"):
            raise ValueError(
                f"ROI_ALIGN_TRAIN_FWD={fwd_plan!r}: expected "
                "'matmul', 'gather' or 'pallas'")
        if fwd_plan == "pallas" and jax.default_backend() != "tpu":
            # the Mosaic kernel only lowers on TPU; on CPU (tests, the
            # multi-chip dryrun) the pallas plan deterministically resolves
            # to the matmul forward. Platform-keyed, not data-dependent —
            # a given backend always runs one fixed plan, so crash bisects
            # and parity tests stay meaningful.
            fwd_plan = "matmul"
        if fwd_plan in ("matmul", "pallas") and plan == "autodiff":
            # autodiff means "differentiate the gather forward"; with the
            # matmul forward the custom_vjp has no gather to differentiate
            # and would silently fall back to another plan — refuse instead
            # (advisor r3: a silent fallback corrupts crash bisects)
            raise ValueError(
                "ROI_ALIGN_TRAIN_FWD='matmul' requires an explicit backward "
                "plan ('matmul' or 'windowed'); 'autodiff' differentiates "
                "the gather forward and does not apply")
        chunk = int(os.environ.get("WEAKCUBE_RA_CHUNK",
                                   self.cfg.TPU.ROI_ALIGN_CHUNK))
        lvl_skip = bool(getattr(self.cfg.TPU, "ROI_ALIGN_LEVEL_SKIP", False))
        if plan in ("matmul", "windowed") or fwd_plan in ("matmul", "pallas"):
            from ..ops.roi_align import multilevel_roi_align_trainable
            return multilevel_roi_align_trainable(tuple(feats), boxes,
                                                  tuple(strides), resolution,
                                                  sr, 2, plan, fwd_plan,
                                                  chunk, lvl_skip)
        return multilevel_roi_align(feats, boxes, strides, resolution,
                                    sampling_ratio=sr)

    def _scale_boxes(self, boxes):
        s = self.cfg.MODEL.ROI_CUBE_HEAD.SCALE_ROI_BOXES
        if s and s > 0:
            cx = (boxes[..., 0] + boxes[..., 2]) / 2
            cy = (boxes[..., 1] + boxes[..., 3]) / 2
            w = boxes[..., 2] - boxes[..., 0]
            h = boxes[..., 3] - boxes[..., 1]
            return jnp.stack([cx - 0.5 * w * s, cy - 0.5 * h * s,
                              cx + 0.5 * w * s, cy + 0.5 * h * s], -1)
        return boxes

    # ---- box branch ------------------------------------------------------
    def forward_box_train(self, features, rois: SampledRois, gt: GroundTruth):
        pooled = self._pool(features, rois.boxes,
                            self.cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION)
        x = self.box_head(pooled)
        scores, deltas = self.box_predictor(x)
        gt_boxes_m = gather_gt(gt.boxes, rois.gt_idx)
        losses = fast_rcnn_losses(
            scores, deltas, rois, gt_boxes_m, self.num_classes,
            tuple(self.cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS),
            self.cfg.MODEL.ROI_BOX_HEAD.SMOOTH_L1_BETA)
        # predicted boxes for the cube branch (class of the matched GT)
        pb = predict_boxes(deltas, rois.boxes, self.num_classes,
                           tuple(self.cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS))
        cls = jnp.clip(rois.classes, 0, self.num_classes - 1)
        pred_boxes = jnp.take_along_axis(
            pb, cls[..., None, None].repeat(4, -1), axis=2)[:, :, 0]
        return losses, jax.lax.stop_gradient(pred_boxes), scores, deltas

    def forward_box_inference(self, features, proposals: Proposals, image_wh):
        pooled = self._pool(features, proposals.boxes,
                            self.cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
                            inference=True)
        x = self.box_head(pooled)
        scores, deltas = self.box_predictor(x)
        boxes_pc = predict_boxes(deltas, proposals.boxes, self.num_classes,
                                 tuple(self.cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS))
        det, roi_sel = fast_rcnn_inference(
            scores, boxes_pc, proposals, image_wh,
            self.cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
            self.cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
            self.cfg.TEST.DETECTIONS_PER_IMAGE,
            candidate_topk=self.cfg.TEST.NMS_CANDIDATE_TOPK)
        return det, roi_sel

    # ---- cube branch plumbing --------------------------------------------
    def run_cube_head(self, features, boxes, classes, K, inference: bool = False):
        rc = self.cfg.MODEL.ROI_CUBE_HEAD
        pooled = self._pool(features, self._scale_boxes(boxes),
                            rc.POOLER_RESOLUTION, inference=inference)
        deltas_2d, z_raw, dims_raw, pose_raw, uncert = self.cube_head(pooled)
        return decode_cube_predictions(deltas_2d, z_raw, dims_raw, pose_raw,
                                       uncert, classes, boxes, K, rc,
                                       self.dims_priors, self.z_scales,
                                       self.z_stats)

    def cube_inference(self, features, det: Detections, K,
                       image_ratio: jnp.ndarray) -> Detections:
        """Attach 3D fields to 2D detections (roi_heads.py:2063-2120)."""
        dec = self.run_cube_head(features, det.boxes, det.classes, K,
                                 inference=True)
        conf = jnp.exp(-dec.uncert)
        score3d = jnp.sqrt(jnp.maximum(det.scores * conf, 0.0))
        return det._replace(centers3D=dec.cubes.centers, dims3D=dec.dims,
                            poses3D=dec.pose, scores3D=jnp.where(det.valid, score3d, 0.0))


def uncert_weight_and_reduce(per_box_losses: Dict[str, jnp.ndarray],
                             scalar_losses: Dict[str, jnp.ndarray],
                             uncert: jnp.ndarray, fg: jnp.ndarray,
                             use_confidence: float, weights: Dict[str, float],
                             loss_w_3d: float) -> Dict[str, jnp.ndarray]:
    """sqrt(2)*exp(-u) weighting + masked reduce + uncert regulariser
    (roi_heads.py:1075-1144)."""
    out = {}
    sf = SQRT2 * jnp.exp(-uncert) if use_confidence > 0 else jnp.ones_like(uncert)
    for name, l in per_box_losses.items():
        out[name] = loss_ops.masked_mean(l * sf, fg) * weights[name] * loss_w_3d
    for name, l in scalar_losses.items():
        # scalar losses broadcast per box in the reference, then get the
        # same uncertainty weighting
        out[name] = loss_ops.masked_mean(l * sf, fg) * weights[name] * loss_w_3d
    if use_confidence > 0:
        out["Cube/uncert"] = use_confidence * loss_ops.masked_mean(uncert, fg)
    return out


class ROIHeads3DScore(ROIHeadsCommon):
    """Weakly-supervised 3D head (reference ROIHeads3DScore,
    roi_heads.py:52-1315): box branch + cube branch trained purely from
    projection/pseudo-GT consistency losses selected by cfg.loss_functions.
    """

    def __call__(self, features, proposals: Proposals, gt: GroundTruth,
                 K, image_wh, depth_maps=None, ground_masks=None,
                 ground_valid=None, ground_normals=None,
                 ground_normal_valid=None, instance_masks=None,
                 train: bool = False,
                 rng: Optional[jax.Array] = None, metrics_tick=None):
        if not train:
            det, _ = self.forward_box_inference(features, proposals, image_wh)
            ratio = jnp.ones((det.boxes.shape[0],))
            return self.cube_inference(features, det, K, ratio)

        cfg = self.cfg
        rc = cfg.MODEL.ROI_CUBE_HEAD
        loss_fns = list(cfg.loss_functions)
        k_sample, k_ransac = jax.random.split(rng)

        rois = label_and_sample_proposals(
            k_sample, proposals, gt, self.num_classes,
            cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
            cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION,
            cfg.MODEL.ROI_HEADS.IOU_THRESHOLDS,
            cfg.MODEL.RPN.IGNORE_THRESHOLD,
            cfg.MODEL.ROI_HEADS.PROPOSAL_APPEND_GT)

        losses, pred_boxes, _, _ = self.forward_box_train(features, rois, gt)

        all_fg = rois.fg & rois.valid
        if rc.LOSS_W_3D == 0:
            # 2D-only pretraining (Base_Omni3D_2D_only.yaml): the cube
            # branch contributes nothing — skip its compute entirely
            metrics = {"roi_head/num_fg_samples": jnp.sum(all_fg) / all_fg.shape[0]}
            return losses, metrics
        # the cube branch runs on FOREGROUND proposals only (reference
        # select_foreground_proposals, roi_heads.py:714). The sampler packs
        # fg into the leading slots and caps their count at
        # positive_fraction * batch_size_per_image, so slicing that static
        # prefix is exact — and cuts the cube pooler/head/loss work ~4x at
        # the default 0.25 fraction (ROIAlign backward dominates the step)
        num_bg = jnp.sum(rois.valid & ~rois.fg) / all_fg.shape[0]
        rois = fg_prefix_rois(rois, cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION)
        fg = rois.fg & rois.valid
        dec = self.run_cube_head(features, rois.boxes, rois.classes, K)

        gt_boxes_m = gather_gt(gt.boxes, rois.gt_idx)
        bube = dec.cubes.bube_corners(K[:, None], image_wh[None, :]
                                      if image_wh.ndim == 1 else image_wh[:, None])
        proj_boxes = dec.cubes.to_boxes(K[:, None], image_wh[None, :]
                                        if image_wh.ndim == 1 else image_wh[:, None])

        per_box: Dict[str, jnp.ndarray] = {}
        scalar: Dict[str, jnp.ndarray] = {}
        weights: Dict[str, float] = {}

        if "iou" in loss_fns:
            per_box["Cube/loss_iou"] = iou_projection_loss(gt_boxes_m, proj_boxes)
            weights["Cube/loss_iou"] = rc.LOSS_W_IOU

        if "pose_alignment" in loss_fns:
            pl, has = pose_alignment_loss(dec.pose, fg)
            scalar["Cube/loss_pose"] = jnp.where(has, pl, 0.0) * jnp.ones_like(dec.z)
            weights["Cube/loss_pose"] = rc.LOSS_W_POSE

        if ("pose_ground" in loss_fns or "pose_ground2" in loss_fns) \
                and (depth_maps is not None or ground_normals is not None):
            if ground_normals is not None:
                # pre-fitted per-image plane normal from the data pipeline
                # (TPU.CACHE_GROUND_NORMALS): the pseudo-GT depth/ground
                # maps are static, so the RANSAC below would recompute the
                # same plane every step
                normals = ground_normals
                gv = ground_normal_valid if ground_normal_valid is not None \
                    else jnp.ones((normals.shape[0],), dtype=bool)
            else:
                gm = ground_masks if ground_masks is not None else \
                    jnp.ones_like(depth_maps, dtype=bool)
                gv = ground_valid if ground_valid is not None else \
                    jnp.ones((depth_maps.shape[0],), dtype=bool)
                import os as _os
                tpu_cfg = getattr(cfg, "TPU", None)
                nh = int(_os.environ.get(
                    "WEAKCUBE_RANSAC_HYP",
                    getattr(tpu_cfg, "RANSAC_HYPOTHESES", 1000)))
                nth = int(_os.environ.get(
                    "WEAKCUBE_RANSAC_NTH",
                    getattr(tpu_cfg, "RANSAC_USE_NTH", 5)))
                normals = ground_normals_from_maps(k_ransac, depth_maps, gm,
                                                   gv, use_nth=nth, K=K,
                                                   num_hypotheses=nh)
            normals = jax.lax.stop_gradient(normals)
            conf = jnp.where(gv, 1.0, 0.1)[:, None]
            if "pose_ground" in loss_fns:
                gr = pose_ground_loss(dec.pose, normals) * conf
            else:
                gr = pose_ground2_loss(dec.pose, normals) * conf
            per_box["Cube/loss_normal_vec"] = gr
            weights["Cube/loss_normal_vec"] = rc.LOSS_W_NORMAL_VEC

        if "z" in loss_fns:
            per_box["Cube/loss_z"] = z_area_search_loss(gt_boxes_m, dec.cubes, K,
                                                        jnp.broadcast_to(image_wh, (K.shape[0], 2)))
            weights["Cube/loss_z"] = rc.LOSS_W_Z

        if depth_maps is not None and "z_pseudo_gt_patch" in loss_fns:
            per_box["Cube/loss_pseudo_gt_z"] = pseudo_gt_z_box_loss(
                depth_maps, proj_boxes, dec.z, image_wh)
            weights["Cube/loss_pseudo_gt_z"] = rc.LOSS_W_Z
        elif depth_maps is not None and "z_pseudo_gt_center" in loss_fns:
            xy = jnp.stack([dec.x, dec.y], -1)
            per_box["Cube/loss_pseudo_gt_z"] = pseudo_gt_z_point_loss(
                depth_maps, xy, dec.z, image_wh)
            weights["Cube/loss_pseudo_gt_z"] = rc.LOSS_W_Z

        if "dims" in loss_fns and self.dims_priors is not None:
            ds = dims_prior_loss(dec.dims, rois.classes, self.dims_priors)
            for i, ax in enumerate("whl"):
                per_box[f"Cube/loss_dims_{ax}"] = ds[..., i]
                weights[f"Cube/loss_dims_{ax}"] = rc.LOSS_W_DIMS

        if "depth" in loss_fns and depth_maps is not None:
            per_box["Cube/loss_depth"] = depth_range_loss(
                depth_maps, instance_masks, rois.gt_idx,
                gt_boxes_m, dec.cubes, image_wh)
            weights["Cube/loss_depth"] = rc.LOSS_W_DEPTH

        if "segmentation" in loss_fns and instance_masks is not None:
            per_box["Cube/loss_seg"] = segment_loss(
                instance_masks, rois.gt_idx, bube, image_wh)
            weights["Cube/loss_seg"] = rc.LOSS_W_SEG

        losses.update(uncert_weight_and_reduce(
            per_box, scalar, dec.uncert, fg, rc.USE_CONFIDENCE, weights,
            rc.LOSS_W_3D))

        metrics = {
            "Cube/2D_IoU": loss_ops.masked_mean(
                box_ops.elementwise_iou(gt_boxes_m, proj_boxes), fg),
            "Cube/IoU3D": iou3d_train_metric(dec, gt, rois, K, fg,
                                             tick=metrics_tick),
            "roi_head/num_fg_samples": jnp.sum(all_fg) / all_fg.shape[0],
            "roi_head/num_bg_samples": num_bg,
        }
        return losses, metrics


class ROIHeads3D(ROIHeadsCommon):
    """Fully-supervised Cube R-CNN head (reference ROIHeads3D,
    roi_heads.py:1327-2230): disentangled corner losses + chamfer pose +
    joint entangled loss + uncertainty weighting.
    """

    def __call__(self, features, proposals: Proposals, gt: GroundTruth,
                 K, image_wh, train: bool = False,
                 rng: Optional[jax.Array] = None, metrics_tick=None):
        if not train:
            det, _ = self.forward_box_inference(features, proposals, image_wh)
            ratio = jnp.ones((det.boxes.shape[0],))
            return self.cube_inference(features, det, K, ratio)

        cfg = self.cfg
        rc = cfg.MODEL.ROI_CUBE_HEAD
        rois = label_and_sample_proposals(
            rng, proposals, gt, self.num_classes,
            cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
            cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION,
            cfg.MODEL.ROI_HEADS.IOU_THRESHOLDS,
            cfg.MODEL.RPN.IGNORE_THRESHOLD,
            cfg.MODEL.ROI_HEADS.PROPOSAL_APPEND_GT)

        losses, pred_boxes, _, _ = self.forward_box_train(features, rois, gt)
        all_fg = rois.fg & rois.valid
        if rc.LOSS_W_3D == 0:
            metrics = {"roi_head/num_fg_samples": jnp.sum(all_fg) / all_fg.shape[0]}
            return losses, metrics
        # cube branch on fg-capable slots only (reference
        # select_foreground_proposals, roi_heads.py:1632) — see
        # fg_prefix_rois
        rois = fg_prefix_rois(rois, cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION)
        fg = rois.fg & rois.valid
        dec = self.run_cube_head(features, rois.boxes, rois.classes, K)

        # GT quantities (gt_boxes3D layout: proj_cx, proj_cy, z, w, h, l, 3d ctr)
        g3d = gather_gt(gt.boxes3D, rois.gt_idx)
        gposes = gather_gt(gt.poses, rois.gt_idx)
        gt_2d = g3d[..., 0:2]
        gt_z = g3d[..., 2]
        gt_dims = g3d[..., 3:6]
        gt_ctr3d = cuboids.backproject(gt_2d, gt_z, K[:, None])
        gt_corners = cuboids.get_cuboid_verts_3d(
            jnp.concatenate([gt_ctr3d, gt_dims], -1), gposes)

        def corners(ctr, dims, pose):
            return cuboids.get_cuboid_verts_3d(jnp.concatenate([ctr, dims], -1), pose)

        def l1_corner_loss(c):
            return jnp.abs(c - gt_corners).mean(axis=(-1, -2))

        def chamfer_corner_loss(c):
            d = jnp.abs(c[..., :, None, :] - gt_corners[..., None, :, :]).sum(-1)
            return d.min(-2).mean(-1) + d.min(-1).mean(-1)

        per_box: Dict[str, jnp.ndarray] = {}
        weights: Dict[str, float] = {}

        if rc.DISENTANGLED_LOSS:
            # z: predicted z + GT everything else (roi_heads.py:1857-1869)
            ctr_z = cuboids.backproject(gt_2d, dec.z, K[:, None])
            per_box["Cube/loss_z"] = l1_corner_loss(corners(ctr_z, gt_dims, gposes))
            # xy: predicted centre + GT z/dims/pose
            ctr_xy = cuboids.backproject(jnp.stack([dec.x, dec.y], -1), gt_z, K[:, None])
            per_box["Cube/loss_xy"] = l1_corner_loss(corners(ctr_xy, gt_dims, gposes))
            # dims
            per_box["Cube/loss_dims"] = l1_corner_loss(corners(gt_ctr3d, dec.dims, gposes))
            # pose (chamfer by default)
            pose_corners = corners(gt_ctr3d, gt_dims, dec.pose)
            per_box["Cube/loss_pose"] = chamfer_corner_loss(pose_corners) \
                if rc.CHAMFER_POSE else l1_corner_loss(pose_corners)
        else:
            # normalized-space variants (roi_heads.py:1896-1939)
            w = rois.boxes[..., 2] - rois.boxes[..., 0]
            h = rois.boxes[..., 3] - rois.boxes[..., 1]
            cx = rois.boxes[..., 0] + 0.5 * w
            cy = rois.boxes[..., 1] + 0.5 * h
            gt_deltas = (gt_2d - jnp.stack([cx, cy], -1)) / jnp.stack(
                [jnp.maximum(w, 1e-6), jnp.maximum(h, 1e-6)], -1)
            d2d = jnp.stack([dec.x, dec.y], -1)
            pred_deltas = (d2d - jnp.stack([cx, cy], -1)) / jnp.stack(
                [jnp.maximum(w, 1e-6), jnp.maximum(h, 1e-6)], -1)
            per_box["Cube/loss_xy"] = jnp.abs(pred_deltas - gt_deltas).mean(-1)
            if rc.DIMS_PRIORS_ENABLED and self.dims_priors is not None:
                pri = self.dims_priors[jnp.clip(rois.classes, 0, self.num_classes - 1)]
                tgt = jnp.log(jnp.maximum(gt_dims, 1e-6) / jnp.maximum(pri[..., 0, :], 1e-6))
            else:
                tgt = jnp.log(jnp.maximum(gt_dims, 1e-6))
            per_box["Cube/loss_dims"] = jnp.abs(dec.dims_norm - tgt).mean(-1)
            per_box["Cube/loss_pose"] = 1.0 - rotations.so3_relative_angle(
                dec.pose, gposes, cos_angle=True)
            # z loss per Z_TYPE (roi_heads.py:1941-1953)
            r2v = 1.0 / jnp.maximum(dec.virtual_to_real, 1e-6)
            if rc.Z_TYPE == "sigmoid":
                per_box["Cube/loss_z"] = jnp.abs(
                    dec.z_norm - jnp.clip(gt_z * r2v / 100.0, 0.0, 1.0))
            elif rc.Z_TYPE == "log":
                per_box["Cube/loss_z"] = jnp.abs(
                    dec.z_norm - jnp.log(jnp.maximum(gt_z * r2v, 0.01)))
            elif rc.Z_TYPE == "clusters" and dec.z_cluster_stats is not None:
                # standardised z-score target (roi_heads.py:1952-1953)
                mu = dec.z_cluster_stats[..., 0]
                sig = jnp.maximum(dec.z_cluster_stats[..., 1], 1e-6)
                per_box["Cube/loss_z"] = jnp.abs(
                    dec.z_norm - (gt_z * r2v - mu) / sig)
            else:  # 'direct'
                per_box["Cube/loss_z"] = jnp.abs(dec.z - gt_z)

        weights.update({"Cube/loss_z": rc.LOSS_W_Z, "Cube/loss_xy": rc.LOSS_W_XY,
                        "Cube/loss_dims": rc.LOSS_W_DIMS,
                        "Cube/loss_pose": rc.LOSS_W_POSE})

        if rc.LOSS_W_JOINT > 0:
            joint_corners = corners(
                cuboids.backproject(jnp.stack([dec.x, dec.y], -1), dec.z, K[:, None]),
                dec.dims, dec.pose)
            per_box["Cube/loss_joint"] = chamfer_corner_loss(joint_corners) \
                if (rc.CHAMFER_POSE and rc.DISENTANGLED_LOSS) \
                else l1_corner_loss(joint_corners)
            weights["Cube/loss_joint"] = rc.LOSS_W_JOINT

        if rc.INVERSE_Z_WEIGHT:
            inv_w = 1.0 / jnp.log(jnp.maximum(gt_z, math.e))
            per_box = {k: v * inv_w for k, v in per_box.items()}

        losses.update(uncert_weight_and_reduce(
            per_box, {}, dec.uncert, fg, rc.USE_CONFIDENCE, weights,
            rc.LOSS_W_3D))

        metrics = {
            "Cube/z_error": loss_ops.masked_mean(jnp.abs(dec.z - gt_z), fg),
            "Cube/dims_error": loss_ops.masked_mean(
                jnp.abs(dec.dims - gt_dims).mean(-1), fg),
            "Cube/IoU3D": iou3d_train_metric(dec, gt, rois, K, fg,
                                             tick=metrics_tick),
            "roi_head/num_fg_samples": jnp.sum(fg) / fg.shape[0],
        }
        return losses, metrics
