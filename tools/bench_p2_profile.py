#!/usr/bin/env python
"""Split P2 (the backbone-split rest program, ~170 ms of the 323 ms round-4
step) into its cost components, one jitted program per variant, ONE VARIANT
PER PROCESS (crash isolation on the faulting 2026-08 axon libtpu — a bad
variant costs one worker recovery, not the whole sweep).

Variants (pass as argv[1]):
  p2          the production jit_rest (baseline re-measure, ~170 ms r4)
  fwdonly     rest forward from features, loss scalar only, NO grad
  ransac      ground_normals_from_maps alone (B maps, 1000 hypotheses)
  ransac256   ... with 256 hypotheses (accuracy lever: reference uses 1000)
  ransac64    ... with 64 hypotheses
  pool        box (R=512) + cube (R=128) pooler matmul FORWARD alone
  poolbwd     pooler forward + backward w.r.t. the feature pyramid
  poolgather  gather-forward pooler alone (for comparison)
  noransac    jit_rest with pose_ground dropped (kills the in-graph RANSAC)
  iouonly     jit_rest with loss_functions=["iou"] (pool+heads+iou only)
  noboxhead   jit_rest with LOSS_W_3D=0 (2D branch only: RPN+box losses)
  pallasmm    jit_rest with ROI_ALIGN_TRAIN_FWD='pallas' + matmul bwd
              (the production combo since round 5: windowed-DMA fwd,
              scatter-free bwd; 164.6 ms / 151.1 with level-skip vs the
              200 ms matmul-fwd baseline, v5e 2026-08-22).

Env sweeps (set BEFORE the run; they bind at trace time):
  WEAKCUBE_RA_CHUNK=64|128|256|512   pooler scan chunk (default 128)
  BENCH_TRAIN_BATCH / BENCH_TRAIN_SIZE as in bench_train_stages

Run: python tools/bench_p2_profile.py <variant>
Driver: for v in p2 fwdonly ransac pool poolbwd noransac; do
          timeout 600 python tools/bench_p2_profile.py $v; done
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench_train_stages import build, timed  # noqa: E402


def _rand_boxes(rng, B, R, size):
    """Realistic proposal boxes: centres uniform, sqrt(area) log-uniform in
    [16, 0.8*size] px (spreads RoIs across FPN levels like RPN output)."""
    k1, k2, k3 = np.random.default_rng(rng).spawn(3)
    s = np.exp(k1.uniform(np.log(16.0), np.log(0.8 * size), (B, R)))
    ar = np.exp(k2.uniform(np.log(0.5), np.log(2.0), (B, R)))
    w = s * np.sqrt(ar)
    h = s / np.sqrt(ar)
    cx = k3.uniform(0, size, (B, R))
    cy = k3.uniform(0, size, (B, R))
    x1 = np.clip(cx - w / 2, 0, size - 1)
    y1 = np.clip(cy - h / 2, 0, size - 1)
    x2 = np.clip(cx + w / 2, 1, size)
    y2 = np.clip(cy + h / 2, 1, size)
    return np.stack([x1, y1, np.maximum(x2, x1 + 1),
                     np.maximum(y2, y1 + 1)], -1).astype(np.float32)


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "p2"
    os.environ.setdefault("WEAKCUBE_RA_TRAIN_FWD",
                          "pallas" if variant == "pallasmm" else "matmul")
    import jax
    import jax.numpy as jnp
    from weakcube_tpu.parallel import make_train_step

    overrides = None
    if variant == "noransac":
        overrides = {"loss_functions": ["iou", "z_pseudo_gt_center",
                                        "pose_alignment"]}
    elif variant == "iouonly":
        overrides = {"loss_functions": ["iou"]}
    elif variant == "noboxhead":
        overrides = {"MODEL.ROI_CUBE_HEAD.LOSS_W_3D": 0.0}

    model, tx, state, batch, rng = build(overrides)
    params, batch_stats = state.params, state.batch_stats
    r2 = jax.random.fold_in(rng, 2)
    B = batch["image"].shape[0]
    S = batch["image"].shape[2]

    if variant.startswith("ransac"):
        from weakcube_tpu.models.roi_heads import ground_normals_from_maps
        from weakcube_tpu.ops.bitpack import unpack_mask_bits
        nh = int(variant[len("ransac"):] or 1000)
        dm = batch["depth_map"].astype(jnp.float32)
        gm = batch.get("ground_mask")
        if gm is None:
            gm = unpack_mask_bits(batch["ground_mask_bits"], dm.shape[2])
        gv = batch["ground_valid"]
        Kc = batch["K"]
        f = jax.jit(lambda k: ground_normals_from_maps(
            k, dm, gm, gv, K=Kc, num_hypotheses=nh))
        call = lambda: float(f(r2)[0, 0])
    elif variant in ("pool", "poolbwd", "poolgather"):
        from weakcube_tpu.models.backbone.build import build_backbone
        from weakcube_tpu.ops.roi_align import (matmul_fwd,
                                                multilevel_roi_align)
        bb = build_backbone(model.cfg, model.dtype)
        bb_params = {"bottom_up": params["bottom_up"],
                     "fpn": params["backbone"]["fpn"]}
        bs = batch_stats or {}
        bb_stats = {k: v for k, v in (
            ("bottom_up", bs.get("bottom_up", {})),
            ("fpn", bs.get("backbone", {}).get("fpn", {}))) if v}
        featd = jax.jit(lambda p: bb.apply(
            {"params": p, "batch_stats": bb_stats}, batch["image"],
            train=False))(bb_params)
        names = sorted(featd, key=lambda n: int(n[1:]))  # p2..p6
        feats = [featd[n] for n in names]
        strides = [4 * 2 ** i for i in range(len(feats))]
        box_b = jnp.asarray(_rand_boxes(0, B, 512, S))
        cube_b = jnp.asarray(_rand_boxes(1, B, 128, S))
        chunk = int(os.environ.get("WEAKCUBE_RA_CHUNK", 128))

        def fwd(fs):
            if variant == "poolgather":
                a = multilevel_roi_align(fs, box_b, strides, 7, 2)
                b = multilevel_roi_align(fs, cube_b, strides, 7, 2)
            else:
                a = matmul_fwd(fs, box_b, strides, 7, 2, 2, chunk)
                b = matmul_fwd(fs, cube_b, strides, 7, 2, 2, chunk)
            return (jnp.sum(a.astype(jnp.float32) ** 2)
                    + jnp.sum(b.astype(jnp.float32) ** 2))

        if variant == "poolbwd":
            import optax
            f = jax.jit(lambda fs: optax.global_norm(
                jax.grad(lambda t: fwd(list(t)))(tuple(fs))))
        else:
            f = jax.jit(fwd)
        call = lambda: float(f(feats))
    elif variant == "fwdonly":
        sp = make_train_step(model, tx, split="backbone")
        feats, _ = sp.jit_bb_fwd(params, batch_stats, batch["image"])
        from weakcube_tpu.parallel.train_step import REST_BATCH_KEYS
        rest_batch = {k: v for k, v in batch.items()
                      if k in REST_BATCH_KEYS}
        mt = jnp.zeros((), bool)

        def floss(p, f_, bt, r):
            losses, _m = model.apply(
                {"params": p}, f_, dict(bt, metrics_tick=mt), train=True,
                rng=r, method="forward_from_features")
            return jnp.sum(jnp.stack(list(losses.values())))
        f = jax.jit(floss)
        call = lambda: float(f(params, feats, rest_batch, r2))
    else:  # p2 / noransac / iouonly / noboxhead: the production jit_rest
        sp = make_train_step(model, tx, split="backbone")
        feats, _ = sp.jit_bb_fwd(params, batch_stats, batch["image"])
        from weakcube_tpu.parallel.train_step import REST_BATCH_KEYS
        rest_batch = {k: v for k, v in batch.items()
                      if k in REST_BATCH_KEYS}
        # step=1, NOT state.step (=0): metrics_tick fires on step%200==0 and
        # the exact-IoU3D diagnostic it gates costs ~135 ms — production
        # pays it 1/200 steps, so steady-state P2 must measure tick-OFF
        step1 = jnp.ones((), jnp.int32)
        call = lambda: float(sp.jit_rest(params, feats, step1,
                                         rest_batch, r2)[2])

    t0 = time.perf_counter()
    v0 = call()
    print(f"# {variant}: compile+first {time.perf_counter() - t0:.0f}s "
          f"val {v0:.3f}", file=sys.stderr, flush=True)
    sec = timed(call, iters=8)
    chunk = os.environ.get("WEAKCUBE_RA_CHUNK", "128")
    print(f"RESULT p2prof {variant} chunk={chunk} ms {sec * 1e3:.1f}",
          flush=True)


if __name__ == "__main__":
    main()
