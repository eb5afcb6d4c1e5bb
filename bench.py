#!/usr/bin/env python
"""Benchmarks for the flagship Weak Cube R-CNN stack on one TPU chip.

Prints one JSON line per benchmark
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}
in this order (each stage is independently guarded; the LAST line is the
headline inference metric the driver has tracked since round 1):

  1. weakcube_train_step_recipe   full fwd+bwd+update at the published
     recipe scale (Omni_combined: b25@512px, losses iou + z_pseudo_gt_center
     + pose_alignment + pose_ground, reference submit.sh:15-27), with an MFU
     estimate. Baseline: the thesis A40 trains this recipe at ~1.7 s/it
     (25 img / it -> 14.7 img/s).
  2. weakcube_train_loop_recipe   END-TO-END loop throughput at the same
     scale: host batches in the wire formats -> prefetch-thread upload ->
     step, wall-clock over 20 steps (the step metric above uploads once
     and times pure compute; the A40 baseline 1.7 s/it IS a loop number).
  3. depth_anything_v2_vitl_518px pseudo-GT depth throughput, batched bf16
     (the reference generates depth maps one image at a time,
     generate_depth_maps.py:82-86; ~13 img/s on an A40).
  4. weakcube_dla34_fpn_inference_512px   bf16 batched inference.
     Baseline: estimated 12 img/s for the reference PyTorch Cube R-CNN
     DLA34-FPN at 512 px on the thesis A40 (no published number, SURVEY §6).

Skip stages with BENCH_SKIP_TRAIN=1 / BENCH_SKIP_DEPTH=1 (the inference
stage always runs). BENCH_BATCH / BENCH_TRAIN_BATCH / BENCH_DEPTH_BATCH
override batch sizes.

Stage isolation: each stage runs in its OWN fresh subprocess
(`bench.py --stage <name>`), so HBM fragmentation / compiled-executable
state from the train and depth stages cannot taint the headline inference
number. (Round 3 post-mortem of the r01->r02 393.5 -> 334.7 "regression":
an isolated r03 run still measured 335, and the RAW per-iter medians were
119.8 ms (r01) vs 123.5 ms (r03) — the swing was the run-to-run variance
of the subtracted tunnel RTT (38.4 vs 28.0 ms), not compute. The inference
stage now chains iterations device-side under lax.fori_loop so one scalar
fetch amortises the RTT over BENCH_INFER_CHAIN iterations.) After all
stages the parent compares each metric against the newest BENCH_r*.json
and prints a delta warning on any >5% drop.

Methodology (axon remote-TPU platform): jax.block_until_ready is unreliable
here, so every timing fetches a scalar to host and subtracts the tunnel
round-trip (measured with a trivial kernel); medians guard against VM
pauses.
"""
from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys
import time

import numpy as np


def _env_flag(name: str) -> bool:
    """True only for a real opt-in ('1'/'true'/'yes'), not '0'/'false'."""
    return os.environ.get(name, "").strip().lower() not in ("", "0", "false", "no")

BASELINE_INFER_IPS = 12.0      # estimated reference inference on A40
BASELINE_TRAIN_IPS = 14.7      # 25 img / 1.7 s/it recipe training on A40
BASELINE_DEPTH_IPS = 13.0      # unbatched DAv2-L 518px on A40
PEAK_FLOPS = float(os.environ.get("BENCH_PEAK_FLOPS", 197e12))  # v5e bf16


def _measure_rtt():
    import jax
    import jax.numpy as jnp
    tiny = jax.jit(lambda x: x + 1.0)
    _ = float(tiny(jnp.zeros(())))  # compile
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        _ = float(tiny(jnp.zeros(())))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(f"# tunnel round-trip median {rtt * 1e3:.1f}ms", file=sys.stderr)
    return rtt


_TINY_FN = None


def _tiny_call():
    """Jitted trivial kernel fetch — one tunnel round-trip."""
    global _TINY_FN
    import jax
    import jax.numpy as jnp
    if _TINY_FN is None:
        _TINY_FN = jax.jit(lambda x: x + 1.0)
        float(_TINY_FN(jnp.zeros(())))  # compile
    return float(_TINY_FN(jnp.zeros(())))


def _timed_scalar(fn, rtt, iters, *args):
    """Median seconds per call, host-sync via scalar fetch. The tunnel RTT
    drifts 28-94 ms BETWEEN runs (and within long ones), so instead of
    subtracting the up-front `rtt` estimate, every sample is followed by an
    adjacent tiny-kernel fetch whose cost is subtracted per sample — a
    drift-proof correction (the up-front rtt is kept as a floor check)."""
    del rtt
    _tiny_call()
    per = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = fn(i, *args)
        _ = float(out)
        t1 = time.perf_counter()
        _tiny_call()
        t2 = time.perf_counter()
        per.append((t1 - t0) - (t2 - t1))
    return max(float(np.median(per)), 1e-6)


def bench_train(rtt):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _tiny_batch
    from weakcube_tpu.config import get_cfg
    from weakcube_tpu.models.rcnn3d import build_model
    from weakcube_tpu.parallel import make_mesh, make_train_step, shard_batch
    from weakcube_tpu.parallel.train_step import TrainState
    from weakcube_tpu.solver import build_optimizer

    B = int(os.environ.get("BENCH_TRAIN_BATCH", 25))
    S = 512
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                     "configs", "Omni_combined.yaml"))
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 38
    cfg.TPU.IMAGE_SIZE = S
    # Pallas ROIAlign inside the TRAIN graph reproducibly crashes the remote
    # TPU worker (bisected 2026-08-20; RE-CONFIRMED 2026-08-21 with the
    # matmul backward now the default, so the fault is the Pallas FORWARD
    # kernel inside train graphs — inference-only Pallas is fine). Default
    # the train bench to the pure-XLA trainable path (cfg.TPU defaults:
    # matmul fwd+bwd inside the four-program backbone-split step);
    # BENCH_TRAIN_PALLAS=1 re-enables for re-testing on newer libtpu.
    cfg.TPU.USE_PALLAS_ROI_ALIGN = _env_flag("BENCH_TRAIN_PALLAS")
    cfg.freeze()

    priors = {"priors_dims_per_cat": np.tile(
        np.array([[[0.8, 0.8, 0.8], [0.3, 0.3, 0.3]]], np.float32), (38, 1, 1))}
    model = build_model(cfg, priors)
    batch = _tiny_batch(B, S, S, G=16, with_depth=True)
    rng = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    variables = jax.jit(
        lambda r: model.init({"params": r}, batch, train=True,
                             rng=jax.random.fold_in(r, 1)))(rng)
    params = variables["params"]
    tx = build_optimizer(cfg, params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params), loss_ema=jnp.zeros(()),
        ema_init=jnp.zeros((), bool), skipped=jnp.zeros((), jnp.int32),
        applied=jnp.zeros((), jnp.int32))
    print(f"# train init {time.perf_counter() - t0:.0f}s", file=sys.stderr)

    mesh = make_mesh([-1], ["data"])
    state = jax.device_put(state)
    batch = shard_batch(batch, mesh)
    step = make_train_step(model, tx)

    t0 = time.perf_counter()
    state, logs = step(state, batch, jax.random.fold_in(rng, 2))
    _ = float(logs["total_loss"])
    print(f"# train compile+first {time.perf_counter() - t0:.0f}s",
          file=sys.stderr)

    cell = {"s": state}

    def one(i):
        cell["s"], logs = step(cell["s"], batch, jax.random.fold_in(rng, 3 + i))
        # sync on a scalar produced by the LAST program of the step.
        # logs["total_loss"] comes from the grads/rest program — in the
        # split-step forms, fetching it returns while the backbone-bwd and
        # update programs are still queued, and the adjacent-RTT probe then
        # absorbs their runtime into the subtracted "RTT" (a 2x flattering
        # artifact measured round-4: 166 ms vs the honest 330). loss_ema is
        # computed by the update program in every step structure.
        return cell["s"].loss_ema

    sec = _timed_scalar(lambda i: one(i), rtt, 10)
    ips = B / sec

    # MFU numerator: analytical flops of the compiled step graph. Runs
    # LAST (it AOT-compiles a second executable, which once crashed the
    # remote TPU worker — the throughput number must already be banked)
    # and can be disabled outright with BENCH_SKIP_COST=1.
    flops = None
    if not _env_flag("BENCH_SKIP_COST"):
        def _flops_of(lowered):
            cost = lowered.compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            return float(cost.get("flops", 0.0))
        try:
            s = cell["s"]
            r2 = jax.random.fold_in(rng, 2)
            if getattr(step, "split", None) in ("backbone", "backbone2"):
                # backbone-split mode: sum the three compute programs (the
                # update program is O(params) elementwise). NEVER lower the
                # combined step through one outer jit here — that rebuilds
                # the monolithic matmul-fwd graph that faults the worker.
                # Use the PRODUCTION allowlist (stepped_bb drops the cached
                # normals): lowering with extra keys would compile a second,
                # different jit_rest executable — the cached-normal graph
                # that faults this libtpu.
                from weakcube_tpu.parallel.train_step import REST_BATCH_KEYS
                rest_batch = {k: v for k, v in batch.items()
                              if k in REST_BATCH_KEYS}
                feats_sd = jax.eval_shape(
                    step.jit_bb_fwd, s.params, s.batch_stats,
                    batch["image"])[0]
                flops = (
                    _flops_of(step.jit_bb_fwd.lower(
                        s.params, s.batch_stats, batch["image"]))
                    + _flops_of(step.jit_rest.lower(
                        s.params, feats_sd, s.step, rest_batch, r2))
                    + _flops_of(step.jit_bb_bwd.lower(
                        s.params, s.batch_stats, batch["image"],
                        feats_sd))) or None
            elif hasattr(step, "jit_grads"):
                # split-step mode: the grads program holds ~all the flops;
                # lowering the combined step through one outer jit would
                # rebuild the monolithic graph the split exists to avoid
                flops = _flops_of(step.jit_grads.lower(s, batch, r2)) or None
            else:
                flops = _flops_of(jax.jit(
                    lambda s, b, r: step(s, b, r)).lower(s, batch, r2)) \
                    or None
        except Exception as e:  # pragma: no cover - backend-specific
            print(f"# cost_analysis unavailable: {e!r}", file=sys.stderr)
    mfu = (flops / sec / PEAK_FLOPS) if flops else None
    print(f"# train step {sec * 1e3:.0f}ms  flops {flops and flops / 1e12}T  "
          f"MFU {mfu and round(100 * mfu, 1)}%", file=sys.stderr)
    line = {
        "metric": "weakcube_train_step_recipe",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / BASELINE_TRAIN_IPS, 2),
    }
    if mfu is not None:
        line["mfu"] = round(mfu, 4)
    print(json.dumps(line))


def bench_trainloop(rtt):
    """END-TO-END train-loop throughput: host batches -> tunnel upload (in
    the production prefetch thread) -> the 4-program backbone-split step.

    The step-only number (bench_train) uploads the batch ONCE; on this host
    the tunnel moves ~110 MB/s, so a recipe batch that uploads slower than
    the step computes makes the loop transfer-bound no matter how fast the
    chip is. This stage measures the loop the way tools/train_net.py runs
    it — upload overlapped via prefetch — over a pool of PRE-MAPPED host
    batches in the production transfer-diet formats (uint8 image + f16
    depth + bit-packed ground mask, cfg.TPU.TRANSFER_*). The mapper/augment
    CPU cost is excluded: the 1-core bench host cannot represent the
    many-core host a real run shards the mapper across (the reference gets
    this from detectron2 worker processes); what is under test is the
    framework's transfer+dispatch pipeline.
    """
    import jax

    from __graft_entry__ import _tiny_batch
    from weakcube_tpu.config import get_cfg
    from weakcube_tpu.data.build import prefetch
    from weakcube_tpu.models.rcnn3d import build_model
    from weakcube_tpu.parallel import make_mesh, make_train_step, shard_batch
    from weakcube_tpu.parallel.train_step import TrainState
    from weakcube_tpu.solver import build_optimizer

    import jax.numpy as jnp

    B = int(os.environ.get("BENCH_TRAIN_BATCH", 25))
    S = 512
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                     "configs", "Omni_combined.yaml"))
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 38
    cfg.TPU.IMAGE_SIZE = S
    cfg.TPU.USE_PALLAS_ROI_ALIGN = False
    cfg.freeze()

    priors = {"priors_dims_per_cat": np.tile(
        np.array([[[0.8, 0.8, 0.8], [0.3, 0.3, 0.3]]], np.float32), (38, 1, 1))}
    model = build_model(cfg, priors)

    # pool of host-side numpy batches in the diet wire formats; uint8 image
    # like the production mapper (TRANSFER_UINT8)
    host_batches = []
    for seed in range(3):
        b = jax.device_get(_tiny_batch(B, S, S, G=16, with_depth=True,
                                       seed=seed))
        img = np.clip(np.asarray(b["image"]) * 50 + 110, 0, 255
                      ).astype(np.uint8)
        b["image"] = img
        host_batches.append(b)
    nbytes = sum(a.nbytes for a in jax.tree_util.tree_leaves(host_batches[0]))
    print(f"# trainloop host batch {nbytes / 1e6:.1f} MB", file=sys.stderr)

    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    variables = jax.jit(
        lambda r: model.init({"params": r}, host_batches[0], train=True,
                             rng=jax.random.fold_in(r, 1)))(rng)
    params = variables["params"]
    tx = build_optimizer(cfg, params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params), loss_ema=jnp.zeros(()),
        ema_init=jnp.zeros((), bool), skipped=jnp.zeros((), jnp.int32),
        applied=jnp.zeros((), jnp.int32))
    print(f"# trainloop init {time.perf_counter() - t0:.0f}s",
          file=sys.stderr)

    mesh = make_mesh([-1], ["data"])
    state = jax.device_put(state)
    step = make_train_step(model, tx)

    # the production second pipeline stage (tools/train_net.py): uploads
    # run in their own prefetch thread, overlapping the previous step.
    # Round-5 A/B'd three strategies on an idle host: threaded overlap
    # 543 ms/step (BEST), leaf-wise serial upload + per-step sync 1122,
    # packed single-buffer (parallel/packed.py) serial + sync 1010. The
    # flat-buffer upload itself measures 23 ms idle (bench_tunnel_bw.py),
    # so the serial losses point at block_until_ready not actually
    # serializing on this platform (see the methodology note above) —
    # uploads keep landing against in-flight compute and stalling. Until
    # a reliable device-idle sync exists on the tunnel, threaded overlap
    # is the measured best; packed upload + a FETCH-synced loop is the
    # next candidate (needs a scalar fetch per step wired through the
    # prefetch thread).
    mode = os.environ.get("BENCH_TRAINLOOP_MODE", "threaded")
    if mode == "packed":
        # packed single-buffer upload + FETCH-synced loop: float() on the
        # last program's scalar is the only reliable device sync on this
        # platform (block_until_ready variants measured 1010-1122 ms/step
        # because uploads kept landing against in-flight compute)
        from weakcube_tpu.parallel.packed import (make_unpack, pack,
                                                  pack_spec)
        spec = pack_spec(host_batches[0])
        packed_pool = [pack(b, spec) for b in host_batches]
        unpack = make_unpack(spec)

        def next_batch(i):
            buf = jax.device_put(packed_pool[i % len(packed_pool)])
            return unpack(buf)

        def sync(st):
            return float(st.loss_ema)
    else:
        def batch_gen():
            import itertools
            for i in itertools.count():
                yield host_batches[i % len(host_batches)]

        dev_batches = prefetch(
            (shard_batch(b, mesh) for b in batch_gen()), depth=2)

        def next_batch(i):
            return next(dev_batches)

        def sync(st):
            return None

    # compile + warmup (2 steps so every program executable is cached)
    t0 = time.perf_counter()
    for i in range(2):
        state, logs = step(state, next_batch(i),
                           jax.random.fold_in(rng, 2))
    _ = float(state.loss_ema)
    print(f"# trainloop compile+warmup {time.perf_counter() - t0:.0f}s",
          file=sys.stderr)

    N = int(os.environ.get("BENCH_TRAINLOOP_STEPS", 20))
    t0 = time.perf_counter()
    for i in range(N):
        state, logs = step(state, next_batch(i),
                           jax.random.fold_in(rng, 3 + i))
        sync(state)
    _ = float(state.loss_ema)  # sync: all N steps complete
    wall = time.perf_counter() - t0
    sec = wall / N
    ips = B / sec
    print(f"# trainloop {N} steps, {sec * 1e3:.0f}ms/step wall "
          f"(mode={mode})", file=sys.stderr)
    print(json.dumps({
        "metric": "weakcube_train_loop_recipe",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / BASELINE_TRAIN_IPS, 2),
        "methodology": "loop-wall-clock",
    }))


def bench_depth(rtt):
    import jax
    import jax.numpy as jnp
    from weakcube_tpu.data.pseudo_gt.depth_anything_v2 import DepthAnythingV2

    # batch sweep on v5e (tools/bench_depth_sweep.py, 2026-08-20): B16 59.7,
    # B32 55.7, B48 67.4, B64 67.3, B96 66.5, B128 57.2 img/s (pad-once) —
    # B48 is the sweet spot
    B = int(os.environ.get("BENCH_DEPTH_BATCH", 48))
    SIZE = 518
    model = DepthAnythingV2(variant="vitl", max_depth=20.0)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(B, SIZE, SIZE, 3)).astype(np.float32))
    t0 = time.perf_counter()
    params = jax.jit(lambda r: model.init(r, x))(jax.random.PRNGKey(0))["params"]
    fwd = jax.jit(lambda p, xi: model.apply({"params": p}, xi)[0, 0, 0])
    _ = float(fwd(params, x))
    print(f"# depth init+compile {time.perf_counter() - t0:.0f}s",
          file=sys.stderr)
    sec = _timed_scalar(lambda i: fwd(params, x + i * 1e-6), rtt, 12)
    ips = B / sec
    print(f"# depth step {sec * 1e3:.0f}ms", file=sys.stderr)
    print(json.dumps({
        "metric": "depth_anything_v2_vitl_518px",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / BASELINE_DEPTH_IPS, 2),
    }))


def bench_inference(rtt):
    import jax
    import jax.numpy as jnp

    from weakcube_tpu.config import get_cfg
    from weakcube_tpu.models.rcnn3d import build_model
    from weakcube_tpu.structures import GroundTruth

    B = int(os.environ.get("BENCH_BATCH", 32))
    S = 512
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "RCNN3D_combined_features"
    cfg.MODEL.ROI_HEADS.NAME = "ROIHeads3DScore"
    cfg.MODEL.BACKBONE.NAME = "build_dla_from_vision_fpn_backbone"
    cfg.MODEL.DLA.TYPE = "dla34"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 38
    cfg.TPU.IMAGE_SIZE = S
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.USE_PALLAS_ROI_ALIGN = not os.environ.get("BENCH_NO_PALLAS")
    cfg.freeze()

    priors = {"priors_dims_per_cat": np.tile(
        np.array([[[0.8, 0.8, 0.8], [0.3, 0.3, 0.3]]], np.float32), (38, 1, 1))}
    model = build_model(cfg, priors)

    rng = np.random.default_rng(0)
    K = np.tile(np.array([[500.0, 0, S / 2], [0, 500.0, S / 2], [0, 0, 1]],
                         np.float32), (B, 1, 1))
    G = 8
    gt = GroundTruth(
        boxes=jnp.asarray(rng.uniform(10, S - 60, (B, G, 4)).astype(np.float32)),
        classes=jnp.zeros((B, G), jnp.int32),
        valid=jnp.zeros((B, G), bool),
        boxes3D=jnp.zeros((B, G, 9)),
        poses=jnp.tile(jnp.eye(3), (B, G, 1, 1)))
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, S, S, 3)).astype(np.float32)),
        "image_wh": jnp.full((B, 2), float(S)),
        "K": jnp.asarray(K),
        "gt": gt,
    }

    t0 = time.perf_counter()
    variables = jax.jit(
        lambda r: model.init({"params": r}, batch, train=False)
    )(jax.random.PRNGKey(0))
    print(f"# infer init {time.perf_counter() - t0:.0f}s", file=sys.stderr)

    @jax.jit
    def forward(variables, b):
        det = model.apply(variables, b, train=False)
        return det.scores3D[0, 0]

    t0 = time.perf_counter()
    _ = float(forward(variables, batch))
    print(f"# infer compile+first {time.perf_counter() - t0:.0f}s",
          file=sys.stderr)

    # At ~100 ms/iter the ~30 ms tunnel RTT is a third of every measured
    # call, and its run-to-run variance (28-38 ms observed) swung the
    # round-1 -> round-2 headline by 15% (393.5 vs 334.7 was RTT noise, not
    # compute: raw per-iter medians were 119.8 vs 123.5 ms). Chain CHAIN
    # forwards device-side under lax.fori_loop so one scalar fetch amortises
    # the RTT over CHAIN iterations; the residual RTT error is rtt/CHAIN.
    CHAIN = int(os.environ.get("BENCH_INFER_CHAIN", 8))

    @jax.jit
    def forward_chain(variables, b):
        def body(i, acc):
            det = model.apply(
                variables, dict(b, image=b["image"] + i.astype(jnp.float32)
                                * 1e-6), train=False)
            return acc + det.scores3D[0, 0]
        return jax.lax.fori_loop(0, CHAIN, body, jnp.zeros((), jnp.float32))

    t0 = time.perf_counter()
    _ = float(forward_chain(variables, batch))
    print(f"# infer chain compile+first {time.perf_counter() - t0:.0f}s",
          file=sys.stderr)
    sec_chain = _timed_scalar(lambda i: forward_chain(variables, batch),
                              rtt, 8) / CHAIN
    sec_single = _timed_scalar(
        lambda i: forward(variables, dict(batch, image=batch["image"] + i * 1e-6)),
        rtt, 20)
    print(f"# infer step chained {sec_chain * 1e3:.1f}ms "
          f"(single-call {sec_single * 1e3:.1f}ms)", file=sys.stderr)

    # Bank the reference-budget headline JSON BEFORE compiling the fast
    # preset: AOT-compiling a second executable once crashed the remote TPU
    # worker, and a worker crash is not a Python exception — the try/except
    # around the fast stage cannot save an unprinted headline (advisor r4).
    # The same line is RE-printed after the fast stage so the headline stays
    # the LAST json line (the driver parses the last line as the headline);
    # the parent dedups records by metric name.
    sec = sec_chain
    ips = B / sec
    headline = json.dumps({
        "metric": "weakcube_dla34_fpn_inference_512px",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / BASELINE_INFER_IPS, 2),
        # timing methodology tag: the regression check skips comparisons
        # across methodologies (chained fori_loop vs the pre-r03
        # single-call numbers differ by the amortised tunnel RTT)
        "methodology": "chained",
    })
    print(headline, flush=True)

    # fast-serving preset (configs/cubercnn_DLA34_FPN_fast.yaml semantics:
    # test-time proposal budgets 1000 -> 512, NMS candidate pool 1024 ->
    # 512; params are budget-independent so the weights are reused) — a
    # SECOND metric line printed after the banked headline.
    # BENCH_SKIP_FAST=1 disables.
    if not _env_flag("BENCH_SKIP_FAST"):
        try:
            cfg_f = cfg.clone().defrost()
            cfg_f.MODEL.RPN.PRE_NMS_TOPK_TEST = 512
            cfg_f.MODEL.RPN.POST_NMS_TOPK_TEST = 512
            cfg_f.TEST.NMS_CANDIDATE_TOPK = 512
            cfg_f.freeze()
            model_f = build_model(cfg_f, priors)

            @jax.jit
            def forward_chain_f(variables, b):
                def body(i, acc):
                    det = model_f.apply(
                        variables, dict(b, image=b["image"]
                                        + i.astype(jnp.float32) * 1e-6),
                        train=False)
                    return acc + det.scores3D[0, 0]
                return jax.lax.fori_loop(0, CHAIN, body,
                                         jnp.zeros((), jnp.float32))

            t0 = time.perf_counter()
            _ = float(forward_chain_f(variables, batch))
            print(f"# infer fast-preset compile+first "
                  f"{time.perf_counter() - t0:.0f}s", file=sys.stderr)
            sec_f = _timed_scalar(lambda i: forward_chain_f(variables, batch),
                                  rtt, 8) / CHAIN
            ips_f = B / sec_f
            print(f"# infer fast-preset step chained {sec_f * 1e3:.1f}ms",
                  file=sys.stderr)
            print(json.dumps({
                "metric": "weakcube_dla34_fpn_inference_512px_fast",
                "value": round(ips_f, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips_f / BASELINE_INFER_IPS, 2),
                "methodology": "chained",
            }))
        except Exception as e:  # secondary metric only; headline is banked
            print(f"# fast-preset stage failed: {e!r}", file=sys.stderr)
        print(headline, flush=True)  # keep the headline as the LAST line


def _wait_for_worker(max_wait_s: float = 2700.0) -> bool:
    """After a TPU worker crash, poll a trivial kernel until the worker is
    back (observed restart times: 13-45 min). Keeps the later stages — above
    all the headline inference line — alive even if an earlier stage kills
    the worker."""
    import jax
    import jax.numpy as jnp
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        try:
            if float(jax.jit(lambda x: x + 1.0)(jnp.zeros(()))) == 1.0:
                print(f"# TPU worker back after {time.time() - t0:.0f}s",
                      file=sys.stderr)
                return True
        except Exception:
            pass
        time.sleep(30)
    print("# TPU worker did not recover in time", file=sys.stderr)
    return False


STAGES = {"train": bench_train, "trainloop": bench_trainloop,
          "depth": bench_depth, "inference": bench_inference}


def _run_stage_inline(name):
    """Child-process entry: measure rtt and run exactly one stage."""
    rtt = _measure_rtt()
    STAGES[name](rtt)


def _previous_bench():
    """Newest BENCH_r*.json in the repo root -> {metric: record}.

    Each record keeps "value" plus optional "methodology" so the regression
    check can refuse apples-to-oranges comparisons (advisor r3: the chained
    inference methodology must not be diffed against single-call numbers)."""
    here = os.path.dirname(os.path.abspath(__file__))
    best, best_n = None, -1
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m and int(m.group(1)) > best_n:
            best, best_n = path, int(m.group(1))
    if best is None:
        return {}
    try:
        with open(best) as f:
            text = f.read()
    except OSError as e:
        print(f"# WARNING: could not read {best}: {e} — "
              "regression check disabled for this run", file=sys.stderr)
        return {}
    prev = {}
    # the driver artifact embeds the bench stdout in a "tail" field; pull
    # every {"metric": ...} JSON line out of the whole text
    for m in re.finditer(r'\{"metric":[^\n]*?\}', text.replace("\\n", "\n")
                         .replace('\\"', '"')):
        try:
            rec = json.loads(m.group(0))
            prev[rec["metric"]] = rec
        except (json.JSONDecodeError, KeyError):
            pass
    if not prev:
        # format drift in the driver artifact would otherwise silently turn
        # the >5% regression guard into a no-op (VERDICT r3 weak #7)
        print(f"# WARNING: no previous metrics parsed from {best} — "
              "regression check disabled for this run", file=sys.stderr)
    return prev


def _run_stage_subprocess(name, timeout_s=3600):
    """Run one stage in a fresh interpreter; forward its stdout (the JSON
    metric lines) and stderr. Returns the parsed metric records."""
    cmd = [sys.executable, os.path.abspath(__file__), "--stage", name]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout_s)
    except subprocess.TimeoutExpired as e:
        print(f"# {name} stage timed out after {timeout_s}s", file=sys.stderr)
        sys.stderr.write(e.stderr or "")
        return []
    sys.stderr.write(proc.stderr)
    records = []
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            print(line, flush=True)
            try:
                records.append(json.loads(line))
            except json.JSONDecodeError:
                pass
        elif line:
            print(line, file=sys.stderr)
    if proc.returncode != 0:
        print(f"# {name} stage exited rc={proc.returncode}", file=sys.stderr)
        combined = proc.stdout + proc.stderr
        if "worker process crashed" in combined or "UNAVAILABLE" in combined:
            _wait_for_worker()
    return records


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--stage":
        _run_stage_inline(sys.argv[2])
        return
    prev = _previous_bench()
    stages = []
    if not _env_flag("BENCH_SKIP_TRAIN"):
        stages.append("train")
    if not (_env_flag("BENCH_SKIP_TRAIN") or _env_flag("BENCH_SKIP_TRAINLOOP")):
        stages.append("trainloop")
    if not _env_flag("BENCH_SKIP_DEPTH"):
        stages.append("depth")
    stages.append("inference")
    results = {}
    for name in stages:
        for rec in _run_stage_subprocess(name):
            results[rec["metric"]] = rec
    for metric, rec in results.items():
        p = prev.get(metric)
        if not p or p.get("value", 0) <= 0:
            continue
        meth_now, meth_prev = rec.get("methodology"), p.get("methodology")
        if meth_now is not None and meth_prev is not None \
                and meth_now != meth_prev:
            print(f"# {metric}: methodology changed "
                  f"({meth_prev} -> {meth_now}); skipping regression delta",
                  file=sys.stderr)
            continue
        if meth_now is not None and meth_prev is None:
            # pre-label artifact (BENCH_r03 measured chained before the tag
            # existed) — compare, but say what is being assumed
            print(f"# {metric}: previous record has no methodology tag; "
                  f"assuming {meth_now!r}", file=sys.stderr)
        value = rec["value"]
        delta = (value - p["value"]) / p["value"]
        tag = "REGRESSION " if delta < -0.05 else ""
        print(f"# {tag}{metric}: {value} vs previous {p['value']} "
              f"({delta:+.1%})", file=sys.stderr)


if __name__ == "__main__":
    main()
