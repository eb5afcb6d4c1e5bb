#!/usr/bin/env python
"""Decompose the recipe-scale train step (Omni_combined, b25@512px) into
coarse stages by timing graph variants on the real TPU:

  full            forward + backward + optimizer (the production step)
  fwd_only        loss forward alone (no grad)
  fwd_bwd         forward + backward, no optimizer -> optax cost by diff
  loss_iou_only   weak losses reduced to ["iou"]
  loss_iou_*      iou + one recipe loss each -> per-loss cost
(pass 1 extra: g1 = one GT/image showed labeling cost ~ 0)

Each variant is a separate jit (remote compiles are serial; expect ~5-15
min each on axon). Prints one JSON line per variant.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


_TINY = None


def _tiny():
    """Jitted trivial kernel used as a per-sample tunnel-RTT probe."""
    global _TINY
    if _TINY is None:
        import jax
        import jax.numpy as jnp
        _TINY = jax.jit(lambda x: x + 1.0)
        float(_TINY(jnp.zeros(())))  # compile
    import jax.numpy as jnp
    return float(_TINY(jnp.zeros(())))


def timed(fn, *args, iters=8):
    """Median seconds per call with the tunnel RTT subtracted PER SAMPLE:
    the axon RTT drifts 28-94 ms between runs (observed), so a single
    up-front RTT estimate can be off by >50 ms — instead each timing sample
    is followed immediately by a tiny-kernel call and that adjacent RTT is
    subtracted from it."""
    out = fn(*args)
    _ = jax_block(out)
    _tiny()
    per = []
    for _i in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = jax_block(out)
        t1 = time.perf_counter()
        _tiny()
        t2 = time.perf_counter()
        per.append((t1 - t0) - (t2 - t1))
    return max(float(np.median(per)), 1e-6)


def jax_block(tree):
    import jax
    leaves = jax.tree_util.tree_leaves(tree)
    # fetch ONE scalar-ish leaf to host (block_until_ready unreliable on axon)
    for l in leaves:
        if hasattr(l, "shape") and l.size == 1:
            return float(l.reshape(()))
    return np.asarray(leaves[0]).ravel()[0] if leaves else 0.0


def build(cfg_overrides=None, G=16):
    import jax
    from __graft_entry__ import _tiny_batch
    from weakcube_tpu.config import get_cfg
    from weakcube_tpu.models.rcnn3d import build_model
    from weakcube_tpu.parallel import make_mesh, shard_batch
    from weakcube_tpu.solver import build_optimizer

    B = int(os.environ.get("BENCH_TRAIN_BATCH", 25))
    S = int(os.environ.get("BENCH_TRAIN_SIZE", 512))
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(os.path.dirname(__file__), "..",
                                     "configs", "Omni_combined.yaml"))
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 38
    # match the PRODUCTION train graph: Pallas ROIAlign crashes the TPU
    # worker inside train graphs (see bench.py), so the default train path
    # is XLA gather fwd + matmul bwd; BENCH_TRAIN_PALLAS=1 to re-test
    cfg.TPU.USE_PALLAS_ROI_ALIGN = os.environ.get(
        "BENCH_TRAIN_PALLAS", "") not in ("", "0", "false")
    # default POOLER_SAMPLING_RATIO (0 -> static 2) so the stages decompose
    # the same graph bench.py's weakcube_train_step_recipe measures; override
    # via BENCH_TRAIN_SR when comparing sampling ratios
    if os.environ.get("BENCH_TRAIN_SR"):
        cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = int(
            os.environ["BENCH_TRAIN_SR"])
    cfg.TPU.IMAGE_SIZE = S
    if cfg_overrides:
        for k, v in cfg_overrides.items():
            node = cfg
            *path, leaf = k.split(".")
            for p in path:
                node = getattr(node, p)
            setattr(node, leaf, v)
    cfg.freeze()

    priors = {"priors_dims_per_cat": np.tile(
        np.array([[[0.8, 0.8, 0.8], [0.3, 0.3, 0.3]]], np.float32),
        (38, 1, 1))}
    model = build_model(cfg, priors)
    batch = _tiny_batch(B, S, S, G=G, with_depth=True)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda r: model.init({"params": r}, batch, train=True,
                             rng=jax.random.fold_in(r, 1)))(rng)
    from weakcube_tpu.parallel.train_step import TrainState
    import jax.numpy as jnp
    params = variables["params"]
    tx = build_optimizer(cfg, params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params), loss_ema=jnp.zeros(()),
        ema_init=jnp.zeros((), bool), skipped=jnp.zeros((), jnp.int32),
        applied=jnp.zeros((), jnp.int32))
    mesh = make_mesh([-1], ["data"])
    state = jax.device_put(state)
    batch = shard_batch(batch, mesh)
    return model, tx, state, batch, rng


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from weakcube_tpu.parallel import make_train_step

    results = {}
    model, tx, state, batch, rng = build()
    # fwd-only variants bypass make_train_step's metrics_tick injection;
    # pin it False so the every-200-steps IoU3D diagnostic (135 ms) does
    # not pollute the steady-state stage timings
    batch = dict(batch, metrics_tick=jnp.zeros((), bool))
    r2 = jax.random.fold_in(rng, 2)

    def stepper(step_fn, state0, batch0):
        # the train step donates its state argument: thread it through
        cell = {"s": state0}

        def one():
            cell["s"], logs = step_fn(cell["s"], batch0, r2)
            # sync on the UPDATE program's output, not total_loss: in the
            # split-step forms total_loss is produced by an earlier
            # program, and fetching it lets the trailing programs hide in
            # the subtracted adjacent-RTT probe (see bench.py)
            return cell["s"].loss_ema
        return one

    # forward only (before the full step: that one donates the state)
    params, batch_stats = state.params, state.batch_stats

    # backbone-only fwd and fwd+bwd: prices the DLA34-FPN convs, the one
    # stage with real MXU FLOPs — the gap between this and fwd_bwd is the
    # detection-head (RPN labels/NMS + RoI/cube) cost
    if not os.environ.get("BENCH_STAGES_SKIP_BACKBONE"):
        from weakcube_tpu.models.backbone.build import build_backbone
        bb = build_backbone(model.cfg, model.dtype)
        # the bottom_up module is constructed with an explicit name before
        # Backbone wraps it, so inside RCNN3D its params are hoisted to a
        # TOP-LEVEL "bottom_up" scope (siblings of "backbone"/"fpn") — remap
        # to the {bottom_up, fpn} layout a standalone Backbone.init produces
        bb_params = {"bottom_up": params["bottom_up"],
                     "fpn": params["backbone"]["fpn"]}
        bs = batch_stats or {}
        bb_stats = {k: v for k, v in (
            ("bottom_up", bs.get("bottom_up", {})),
            ("fpn", bs.get("backbone", {}).get("fpn", {}))) if v}
        images = batch["image"]

        def bb_fwd(p):
            feats = bb.apply({"params": p, "batch_stats": bb_stats},
                             images, train=False)
            return sum(jnp.sum(f.astype(jnp.float32) ** 2)
                       for f in feats.values())
        def measure(tag, thunk):
            t0 = time.perf_counter()
            try:
                results[tag] = timed(thunk)
                print(f"# {tag} compiled+timed in "
                      f"{time.perf_counter() - t0:.0f}s", file=sys.stderr)
            except Exception as e:  # keep later stages alive
                print(f"# {tag} FAILED: {e!r}", file=sys.stderr)

        bf = jax.jit(bb_fwd)
        measure("backbone_fwd", lambda: bf(bb_params))
        bg = jax.jit(lambda p: optax.global_norm(jax.grad(bb_fwd)(p)))
        measure("backbone_fwd_bwd", lambda: bg(bb_params))

    skip_fwd = os.environ.get("BENCH_STAGES_SKIP_FWD")

    def fwd(p):
        (losses, _m), _ = model.apply(
            {"params": p, "batch_stats": batch_stats},
            batch, train=True, rng=r2, mutable=["batch_stats"])
        return jnp.sum(jnp.stack(list(losses.values())))
    def measure2(tag, thunk):
        t0 = time.perf_counter()
        try:
            results[tag] = timed(thunk)
            print(f"# {tag} compiled+timed in {time.perf_counter() - t0:.0f}s",
                  file=sys.stderr)
        except Exception as e:
            print(f"# {tag} FAILED: {e!r}", file=sys.stderr)

    f = jax.jit(fwd)
    if not skip_fwd:
        measure2("fwd_only", lambda: f(params))

    # forward + backward, no optimizer (consume the grads via a global-norm
    # scalar or XLA dead-code-eliminates the whole backward)
    def loss_and_gnorm(p):
        val, grads = jax.value_and_grad(fwd)(p)
        return val + 0.0 * optax.global_norm(grads)
    g = jax.jit(loss_and_gnorm)
    if not skip_fwd:
        measure2("fwd_bwd", lambda: g(params))

    # variant: return the RAW grads pytree (like the split-step grads
    # program) instead of consuming it into a norm — round-3 crash bisect
    if os.environ.get("BENCH_STAGES_RET_GRADS"):
        gr = jax.jit(lambda p: jax.value_and_grad(fwd)(p))

        def _ret():
            val, grads = gr(params)
            return val
        measure2("fwd_bwd_ret_grads", _ret)

    # output-kind bisect (round-3): fwd+bwd works returning (val, grads);
    # prog1 (= + losses + metrics + batch_stats) crashes. Which output?
    if os.environ.get("BENCH_STAGES_OUT_BISECT"):
        def fwd_full(p):
            (losses, metrics), mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                batch, train=True, rng=r2, mutable=["batch_stats"])
            total = jnp.sum(jnp.stack(list(losses.values())))
            return total, (losses, metrics, mut.get("batch_stats", {}))

        only_v5 = os.environ.get("BENCH_STAGES_ONLY_V5")
        vg = jax.value_and_grad(fwd_full, has_aux=True)
        jA = jax.jit(lambda p: ((lambda vt, g: (vt[0], g, vt[1][2]))(*vg(p))))
        if not only_v5:
            measure2("out_val_grads_bs", lambda: jA(params)[0])
        jB = jax.jit(lambda p: ((lambda vt, g: (vt[0], g, vt[1][0], vt[1][1]))(*vg(p))))
        if not only_v5:
            measure2("out_val_grads_lossmetrics", lambda: jB(params)[0])
        jC = jax.jit(lambda p: ((lambda vt, g: (vt[0], g, vt[1][0], vt[1][1], vt[1][2]))(*vg(p))))
        if not only_v5:
            measure2("out_all", lambda: jC(params)[0])

        # argument-structure bisect: out_all works with params-as-arg +
        # closures; the split jit_grads (TrainState/batch/rng as args)
        # crashes. Walk the argument structure toward it.
        def fwd_args(p, bs, bt, r):
            (losses, metrics), mut = model.apply(
                {"params": p, "batch_stats": bs},
                bt, train=True, rng=r, mutable=["batch_stats"])
            total = jnp.sum(jnp.stack(list(losses.values())))
            return total, (losses, metrics, mut.get("batch_stats", {}))

        vga = jax.value_and_grad(fwd_args, has_aux=True)
        jV2 = jax.jit(lambda p, bt, r: vga(p, batch_stats, bt, r))
        if not only_v5:
            measure2("args_p_batch_rng",
                     lambda: jV2(params, batch, r2)[0][0])
        jV3 = jax.jit(vga)
        if not only_v5:
            measure2("args_p_bs_batch_rng",
                     lambda: jV3(params, batch_stats, batch, r2)[0][0])
        jV4 = jax.jit(lambda st, bt, r: vga(st.params, st.batch_stats, bt, r))
        if not only_v5:
            measure2("args_trainstate",
                     lambda: jV4(state, batch, r2)[0][0])

        # V2 crashed: sharded batch-as-ARG is the trigger. Does a PLAIN
        # (SingleDeviceSharding) batch argument work?
        batch_plain = jax.device_put(jax.device_get(batch))
        jV5 = jax.jit(lambda p, bt, r: vga(p, batch_stats, bt, r))
        measure2("args_batch_unsharded",
                 lambda: jV5(params, batch_plain, r2)[0][0])
        for k, v in results.items():
            print(json.dumps({"metric": f"train_stage_{k}",
                              "value": round(v * 1e3, 1), "unit": "ms/step"}))
        return

    # backbone-split programs individually (the round-4 production step):
    # BENCH_STAGES_BB_SPLIT=1 times p1 (backbone fwd), p2 (rest fwd+bwd),
    # p3 (backbone bwd re-run), p4 (update) and the full chained step
    if os.environ.get("BENCH_STAGES_BB_SPLIT"):
        sp = make_train_step(model, tx, split="backbone")
        image = batch["image"]
        # the production allowlist (parallel/train_step.py stepped_bb):
        # cached ground normals / stale metrics_tick as runtime args of
        # this program fault the libtpu (round-4 P2 bisect)
        from weakcube_tpu.parallel.train_step import REST_BATCH_KEYS
        rest_batch = {k: v for k, v in batch.items()
                      if k in REST_BATCH_KEYS}

        def sync(tree):
            leaf = jax.tree_util.tree_leaves(tree)[0]
            return float(leaf.reshape(-1)[0])

        measure2("bbsplit_p1_backbone_fwd",
                 lambda: sync(sp.jit_bb_fwd(params, batch_stats, image)[0]))
        feats, bb_st = sp.jit_bb_fwd(params, batch_stats, image)
        measure2("bbsplit_p2_rest_fwd_bwd",
                 lambda: sp.jit_rest(params, feats, state.step,
                                     rest_batch, r2)[2])
        g_rest, g_feats, total, _losses, _metrics = sp.jit_rest(
            params, feats, state.step, rest_batch, r2)
        measure2("bbsplit_p3_backbone_bwd",
                 lambda: sync(sp.jit_bb_bwd(params, batch_stats, image,
                                            g_feats)))
        g_bb = sp.jit_bb_bwd(params, batch_stats, image, g_feats)

        def _p4():
            ns, _div, _gf = sp.jit_update(
                jax.tree_util.tree_map(jnp.copy, state),
                jax.tree_util.tree_map(jnp.copy, g_rest),
                jax.tree_util.tree_map(jnp.copy, g_bb),
                total, bb_st)
            return ns.loss_ema
        measure2("bbsplit_p4_update", _p4)
        # full chained step LAST (it donates the state)
        measure2("bbsplit_full", stepper(sp, state, batch))
        for k, v in results.items():
            print(json.dumps({"metric": f"train_stage_{k}",
                              "value": round(v * 1e3, 1), "unit": "ms/step"}))
        return

    # split-step programs individually (round-3 crash bisect):
    # BENCH_STAGES_GRADS_ONLY=1 runs only program 1 (fwd+bwd+all outputs);
    # =2 also runs program 2 (stabilise+optimizer) fed from program 1
    go = os.environ.get("BENCH_STAGES_GRADS_ONLY")
    if go:
        sp = make_train_step(model, tx, split=True)
        measure2("split_prog1",
                 lambda: sp.jit_grads(state, batch, r2)[1])
        if go == "2":
            grads, total, losses, metrics, new_bs = sp.jit_grads(
                state, batch, r2)

            def _p2():
                ns, div, gf = sp.jit_update(
                    jax.tree_util.tree_map(jnp.copy, state),
                    jax.tree_util.tree_map(jnp.copy, grads), total, new_bs)
                return ns.loss_ema
            measure2("split_prog2", _p2)
        for k, v in results.items():
            print(json.dumps({"metric": f"train_stage_{k}",
                              "value": round(v * 1e3, 1), "unit": "ms/step"}))
        return

    # full production step (donates state — run last on this state)
    step = make_train_step(model, tx)
    measure2("full", stepper(step, state, batch))

    # loss ablations: recipe = iou + z_pseudo_gt_center + pose_alignment +
    # pose_ground; add each to the iou base to price it individually
    for tag, fns in (
            ("loss_iou_only", ["iou"]),
            ("loss_iou_zc", ["iou", "z_pseudo_gt_center"]),
            ("loss_iou_posealign", ["iou", "pose_alignment"]),
            ("loss_iou_poseground", ["iou", "pose_ground"]),
    ):
        if os.environ.get("BENCH_STAGES_SKIP_ABLATIONS"):
            break
        m2, t2, s2, b2, _ = build({"loss_functions": fns})
        st2 = make_train_step(m2, t2)
        t0 = time.perf_counter()
        results[tag] = timed(stepper(st2, s2, b2))
        print(f"# {tag} compiled+timed in {time.perf_counter() - t0:.0f}s",
              file=sys.stderr)

    for k, v in results.items():
        print(json.dumps({"metric": f"train_stage_{k}", "value": round(v * 1e3, 1),
                          "unit": "ms/step"}))


if __name__ == "__main__":
    main()
