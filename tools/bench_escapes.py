#!/usr/bin/env python
"""Round-4 crash-escape experiments for the matmul ROIAlign forward.

Round-3 ground truth (NOTES_NEXT_ROUND.md): the dense-einsum ROIAlign
forward (ops/roi_align.py::matmul_fwd, fwd+bwd 299.1 vs 481.7 ms measured)
faults the axon libtpu inside any full train step whose batch arrives as a
runtime argument, while (a) the identical math with the batch closed over
and (b) standalone pooler fwd+bwd programs with runtime args both run
clean. Since NMS/top-k/sort kernels are param-dependent and therefore
PRESENT in the clean closed-batch variant too, the only subgraphs that
differ are the batch input buffers themselves and the gt-only anchor
labelling. Each variant here perturbs exactly one of those axes on the
FULL b25@512 recipe step:

  control       matmul fwd, unmodified step (expected: worker crash)
  barrier_io    optimization_barrier on features+boxes entering matmul_fwd
                (severs producer fusion into the einsums)
  matmul_2d     einsums re-expressed as reshaped batched jnp.matmul
                (different dot_general shapes -> different kernel choice)
  f32_einsum    hat weights + einsums in f32 (different MXU tiling)
  batch_copy    batch passed through a tiny identity program first (fresh
                non-donated device buffers as step inputs)
  batch_donate  the batch argument donated to the step (different input
                buffer aliasing)
  anchor_precomp  anchor labelling (the gt-only subgraph that const-folds
                in the clean closed-batch variant) moved to its own tiny
                program; the step receives batch["rpn_labels"] as inputs
                (bit-identical math, models/rcnn3d.py::make_anchor_labeler)

Arg-narrowing variants (value_and_grad program, matmul fwd, everything
closed over EXCEPT the named piece — the round-3 bisect only ever flipped
the whole (batch, rng) group at once, so WHICH argument triggers the
fault is unknown):

  arg_rng       only the rng is an argument (sampling kernels live)
  arg_image     only batch["image"] is an argument
  arg_gt        only batch["gt"] is an argument (labelling kernels live)
  arg_maps      only depth_map/ground_mask/ground_valid are arguments
  arg_gt_maps_rng  gt + maps + rng as arguments, image/wh/K closed — the
                exact argument set of the backbone-split's big program
  arg_all       the full (batch, rng) argument set rebuilt inside this
                harness (control: should crash like args_p_batch_rng)

Structural escape (the real thing, end to end):

  split_backbone  THREE programs per step: (1) backbone fwd (image arg,
                no einsums), (2) rest fwd+bwd from feats (einsums, but no
                image arg) -> grads_rest + g_feats, (3) backbone bwd via
                re-run with the surrogate loss sum(feats * g_feats) (image
                arg, no einsums). Prices the escape: ~1 extra backbone
                forward vs the monolithic step.

Run ONE variant per process (a fault kills the backend):
    python tools/bench_escapes.py <variant>
The runner script loops variants with a worker probe between runs.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench_train_stages import build, timed  # noqa: E402


def _patch_matmul_fwd(variant):
    import jax
    import jax.numpy as jnp
    from weakcube_tpu.ops import roi_align as ra

    orig = ra.matmul_fwd

    if variant == "barrier_io":
        def patched(features, boxes, *a, **k):
            features = [jax.lax.optimization_barrier(f) for f in features]
            boxes = jax.lax.optimization_barrier(boxes)
            return jax.lax.optimization_barrier(
                orig(features, boxes, *a, **k))
        ra.matmul_fwd = patched

    elif variant in ("matmul_2d", "f32_einsum"):
        def patched(features, boxes, strides, output_size=7,
                    sampling_ratio=2, min_level=2, chunk=128):
            B, R = boxes.shape[:2]
            P, S, L = output_size, sampling_ratio, len(features)
            C = features[0].shape[-1]
            levels = ra.assign_fpn_levels(
                boxes, min_level, min_level + L - 1) - min_level
            wdt = jnp.float32 if variant == "f32_einsum" \
                else features[0].dtype
            grid = (jnp.arange(P * S, dtype=jnp.float32) + 0.5) / (P * S)
            chunk = int(os.environ.get("WEAKCUBE_RA_CHUNK", chunk))
            chunk = min(chunk, R)
            nc = -(-R // chunk)
            pad = nc * chunk - R

            def hat(c, size):
                c = jnp.clip(c, 0.0, float(size - 1))
                w = jnp.maximum(0.0, 1.0 - jnp.abs(
                    c[..., None] - jnp.arange(size, dtype=jnp.float32)))
                return w.reshape(B, R, P, S, size).sum(3) / S

            out = None
            for l, f in enumerate(features):
                H, W = f.shape[1], f.shape[2]
                scale = 1.0 / strides[l]
                x1 = boxes[..., 0] * scale - 0.5
                y1 = boxes[..., 1] * scale - 0.5
                x2 = boxes[..., 2] * scale - 0.5
                y2 = boxes[..., 3] * scale - 0.5
                sx = x1[..., None] + jnp.maximum(
                    x2 - x1, 1e-6)[..., None] * grid
                sy = y1[..., None] + jnp.maximum(
                    y2 - y1, 1e-6)[..., None] * grid
                mask = (levels == l).astype(jnp.float32)
                wy = (hat(sy, H) * mask[..., None, None]).astype(wdt)
                wx = hat(sx, W).astype(wdt)
                wy = jnp.pad(wy, ((0, 0), (0, pad), (0, 0), (0, 0)))
                wx = jnp.pad(wx, ((0, 0), (0, pad), (0, 0), (0, 0)))
                wy = wy.reshape(B, nc, chunk, P, H).transpose(1, 0, 2, 3, 4)
                wx = wx.reshape(B, nc, chunk, P, W).transpose(1, 0, 2, 3, 4)
                wy, wx = jax.lax.optimization_barrier((wy, wx))
                fw = f.astype(wdt) if variant == "f32_einsum" else f

                if variant == "f32_einsum":
                    def body(carry, xs, fw=fw, H=H, W=W):
                        wyk, wxk = xs
                        v = jnp.einsum("bkpy,byxc->bkpxc", wyk, fw)
                        o = jnp.einsum("bkqx,bkpxc->bkpqc", wxk, v)
                        return carry, o
                else:
                    def body(carry, xs, fw=fw, H=H, W=W):
                        wyk, wxk = xs
                        k = wyk.shape[1]
                        # v[b,kp,WC] = wy[b,kP,H] @ f[b,H,WC]
                        v = jnp.matmul(wyk.reshape(B, k * P, H),
                                       fw.reshape(B, H, W * C))
                        v = v.reshape(B, k, P, W, C)
                        # o[bk,q,pC] = wx[bk,q,W] @ v'[bk,W,pC]
                        v2 = v.transpose(0, 1, 3, 2, 4).reshape(
                            B * k, W, P * C)
                        o = jnp.matmul(wxk.reshape(B * k, P, W), v2)
                        o = o.reshape(B, k, P, P, C).transpose(0, 1, 3, 2, 4)
                        return carry, o
                _, ys = jax.lax.scan(body, 0, (wy, wx))
                out = ys if out is None else out + ys
            out = out.transpose(1, 0, 2, 3, 4, 5).reshape(
                B, nc * chunk, P, P, C)
            return out[:, :R].astype(features[0].dtype)
        ra.matmul_fwd = patched


def _run_arg_bisect(variant, model, state, batch, rng):
    """value_and_grad program with everything closed over except ONE piece
    (passed as the jit argument). Any crash here names the exact guilty
    argument kind; a clean run exonerates it."""
    import jax
    import jax.numpy as jnp

    params, batch_stats = state.params, state.batch_stats
    r2 = jax.random.fold_in(rng, 2)
    batch = dict(batch, metrics_tick=jnp.zeros((), bool))

    def fwd_p(p, bt, r):
        (losses, _m), _ = model.apply(
            {"params": p, "batch_stats": batch_stats},
            bt, train=True, rng=r, mutable=["batch_stats"])
        return jnp.sum(jnp.stack(list(losses.values())))

    vg = jax.value_and_grad(fwd_p)
    # params stays an argument in every variant — the round-3 clean
    # `fwd_bwd` (params-as-only-arg) exonerated it
    if variant == "arg_rng":
        f = jax.jit(lambda p, r: vg(p, batch, r))
        call = lambda: f(params, r2)[0]
    elif variant == "arg_image":
        f = jax.jit(lambda p, img: vg(p, dict(batch, image=img), r2))
        call = lambda: f(params, batch["image"])[0]
    elif variant == "arg_gt":
        f = jax.jit(lambda p, gt: vg(p, dict(batch, gt=gt), r2))
        call = lambda: f(params, batch["gt"])[0]
    elif variant == "arg_maps":
        maps = {k: batch[k] for k in ("depth_map", "ground_mask",
                                      "ground_valid") if k in batch}
        f = jax.jit(lambda p, m: vg(p, dict(batch, **m), r2))
        call = lambda: f(params, maps)[0]
    elif variant == "arg_depth_map":
        f = jax.jit(lambda p, d: vg(p, dict(batch, depth_map=d), r2))
        call = lambda: f(params, batch["depth_map"])[0]
    elif variant == "arg_ground_mask":
        # the two BOOL parameters alone (S1/S8 packing suspect)
        f = jax.jit(lambda p, gm, gv: vg(
            p, dict(batch, ground_mask=gm, ground_valid=gv), r2))
        call = lambda: f(params, batch["ground_mask"],
                         batch["ground_valid"])[0]
    elif variant == "arg_maps_u8":
        # ESCAPE candidate: all three maps are arguments, but the bool
        # masks cross the program boundary as uint8 and are re-cast inside
        gm8 = batch["ground_mask"].astype(jnp.uint8)
        gv8 = batch["ground_valid"].astype(jnp.uint8)
        f = jax.jit(lambda p, d, gm, gv: vg(
            p, dict(batch, depth_map=d, ground_mask=gm != 0,
                    ground_valid=gv != 0), r2))
        call = lambda: f(params, batch["depth_map"], gm8, gv8)[0]
    elif variant == "arg_gt_maps_rng":
        maps = {k: batch[k] for k in ("depth_map", "ground_mask",
                                      "ground_valid") if k in batch}
        f = jax.jit(lambda p, gt, m, r: vg(p, dict(batch, gt=gt, **m), r))
        call = lambda: f(params, batch["gt"], maps, r2)[0]
    elif variant == "arg_all":
        f = jax.jit(lambda p, bt, r: vg(p, bt, r))
        call = lambda: f(params, batch, r2)[0]
    else:
        raise ValueError(variant)

    t0 = time.perf_counter()
    loss0 = float(call())
    print(f"# {variant}: compile+first {time.perf_counter() - t0:.0f}s "
          f"loss {loss0:.3f}", file=sys.stderr, flush=True)
    sec = timed(call, iters=6)
    print(f"RESULT {variant} ok step_ms {sec * 1e3:.1f}", flush=True)


def _run_split_backbone(model, state, batch, rng):
    """Three-program step (no optimizer — the known +~8 ms is priced by
    bench_train_stages): backbone fwd | rest fwd+bwd | backbone bwd."""
    import jax
    import jax.numpy as jnp

    from weakcube_tpu.models.backbone.build import build_backbone

    params, batch_stats = state.params, state.batch_stats
    r2 = jax.random.fold_in(rng, 2)
    batch = dict(batch, metrics_tick=jnp.zeros((), bool))

    bb = build_backbone(model.cfg, model.dtype)
    bb_params = {"bottom_up": params["bottom_up"],
                 "fpn": params["backbone"]["fpn"]}
    bs = batch_stats or {}
    bb_stats = {k: v for k, v in (
        ("bottom_up", bs.get("bottom_up", {})),
        ("fpn", bs.get("backbone", {}).get("fpn", {}))) if v}

    # P1: backbone forward — image is an argument, no pooler einsums
    @jax.jit
    def p1(bbp, image):
        feats, mut = bb.apply({"params": bbp, "batch_stats": bb_stats},
                              image, train=True, mutable=["batch_stats"])
        return feats

    # P2: everything downstream of the backbone, fwd+bwd w.r.t.
    # (params, feats) — pooler einsums present, image NOT an argument
    def rest_loss(p, feats, bt, r):
        (losses, _m), _ = model.apply(
            {"params": p, "batch_stats": batch_stats}, feats, bt,
            train=True, rng=r, mutable=["batch_stats"],
            method="forward_from_features")
        return jnp.sum(jnp.stack(list(losses.values())))

    p2 = jax.jit(lambda p, feats, bt, r:
                 jax.value_and_grad(rest_loss, argnums=(0, 1))(p, feats,
                                                               bt, r))

    # P3: backbone backward via re-run with the surrogate loss
    # sum(feats * g_feats) — image is an argument, no pooler einsums
    def bb_surrogate(bbp, image, g_feats):
        feats, _ = bb.apply({"params": bbp, "batch_stats": bb_stats},
                            image, train=True, mutable=["batch_stats"])
        return sum(jnp.sum(feats[k].astype(jnp.float32)
                           * g_feats[k].astype(jnp.float32))
                   for k in g_feats)

    p3 = jax.jit(lambda bbp, img, gf: jax.grad(bb_surrogate)(bbp, img, gf))

    maps = {k: batch[k] for k in ("gt", "image_wh", "K", "depth_map",
                                  "ground_mask", "ground_valid",
                                  "metrics_tick") if k in batch}

    def run():
        feats = p1(bb_params, batch["image"])
        (loss, (grads_rest, g_feats)) = p2(params, feats, maps, r2)
        grads_bb = p3(bb_params, batch["image"], g_feats)
        return loss + grads_bb["bottom_up"]["base_conv"][
            "kernel"].astype(jnp.float32).sum() * 0.0

    t0 = time.perf_counter()
    loss0 = float(run())
    print(f"# split_backbone: compile+first {time.perf_counter() - t0:.0f}s "
          f"loss {loss0:.3f}", file=sys.stderr, flush=True)
    sec = timed(run, iters=6)
    print(f"RESULT split_backbone ok step_ms {sec * 1e3:.1f} "
          f"img_s {25.0 / sec:.1f}", flush=True)


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "control"
    os.environ.setdefault("WEAKCUBE_RA_TRAIN_FWD", "matmul")
    # deliberate crash repros: this harness exists to exercise the
    # monolithic matmul-fwd graphs that make_train_step refuses by default
    os.environ.setdefault("WEAKCUBE_ALLOW_FAULTY_COMBO", "1")
    import jax
    import jax.numpy as jnp

    _patch_matmul_fwd(variant)

    from weakcube_tpu.parallel import make_train_step

    model, tx, state, batch, rng = build()
    if variant.startswith("arg_"):
        return _run_arg_bisect(variant, model, state, batch, rng)
    if variant == "split_backbone":
        return _run_split_backbone(model, state, batch, rng)
    if variant == "batch_copy":
        copy = jax.jit(lambda b: jax.tree_util.tree_map(lambda x: x + 0, b))
        batch = copy(batch)

    # split=False: these variants probe the MONOLITHIC step graph (the
    # shipped default is now the backbone split, which dodges the fault)
    if variant == "batch_donate":
        # one outer jit (the inner jitted step inlines during tracing) with
        # the batch donated too — same HLO, different input buffer aliasing
        inner = make_train_step(model, tx, split=False)
        step = jax.jit(lambda s, b, r: inner(s, b, r),
                       donate_argnums=(0, 1))
    else:
        step = make_train_step(model, tx, split=False)

    labeler = None
    if variant == "anchor_precomp":
        from weakcube_tpu.models.rcnn3d import make_anchor_labeler
        labeler = make_anchor_labeler(model.cfg)

    cell = {"s": state}
    r2 = jax.random.fold_in(rng, 2)

    fresh = jax.jit(lambda b: jax.tree_util.tree_map(lambda x: x + 0, b))

    def run(r):
        b = batch
        if labeler is not None:
            b = dict(batch, rpn_labels=labeler(r, batch["gt"]))
        if variant == "batch_donate":
            b = fresh(b)   # donated buffers die per step: re-copy
        cell["s"], logs = step(cell["s"], b, r)
        return logs["total_loss"]

    t0 = time.perf_counter()
    loss0 = float(run(r2))
    print(f"# {variant}: compile+first {time.perf_counter() - t0:.0f}s "
          f"loss {loss0:.3f}", file=sys.stderr, flush=True)

    sec = timed(lambda: run(r2), iters=6)
    print(f"RESULT {variant} ok step_ms {sec * 1e3:.1f} "
          f"img_s {25.0 / sec:.1f}", flush=True)


if __name__ == "__main__":
    main()
