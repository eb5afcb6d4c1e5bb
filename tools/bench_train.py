#!/usr/bin/env python
"""Train-step throughput at the published recipe scale (Omni_combined:
batch 25, 512 px, DLA34, weak losses). Prints one JSON line with
images/sec/chip for the full forward+backward+update step.

The reference trains 42k iters of this recipe in ~20 h on an A40
(~1.7 s/it => ~14.7 img/s); this measures our jitted SPMD step.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF_TRAIN_IMG_PER_SEC = 14.7  # 25 img / 1.7 s/it on the thesis A40


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _tiny_batch
    from weakcube_tpu.config import get_cfg
    from weakcube_tpu.models.rcnn3d import build_model
    from weakcube_tpu.parallel import make_mesh, make_train_step, shard_batch
    from weakcube_tpu.parallel.train_step import TrainState
    from weakcube_tpu.solver import build_optimizer

    B = int(os.environ.get("BENCH_TRAIN_BATCH", 25))
    S = int(os.environ.get("BENCH_TRAIN_SIZE", 512))

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(os.path.dirname(__file__), "..",
                                     "configs", "Omni_combined.yaml"))
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 38
    if os.environ.get("BENCH_TRAIN_PALLAS"):
        cfg.TPU.USE_PALLAS_ROI_ALIGN = True
    if os.environ.get("BENCH_TRAIN_SR"):
        cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = int(os.environ["BENCH_TRAIN_SR"])
    cfg.TPU.IMAGE_SIZE = S
    cfg.freeze()

    priors = {"priors_dims_per_cat": np.tile(
        np.array([[[0.8, 0.8, 0.8], [0.3, 0.3, 0.3]]], np.float32), (38, 1, 1))}
    model = build_model(cfg, priors)
    batch = _tiny_batch(B, S, S, G=16, with_depth=True)

    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    variables = jax.jit(
        lambda r: model.init({"params": r}, batch, train=True,
                             rng=jax.random.fold_in(r, 1))
    )(rng)
    params = variables["params"]
    tx = build_optimizer(cfg, params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params), loss_ema=jnp.zeros(()),
        ema_init=jnp.zeros((), bool), skipped=jnp.zeros((), jnp.int32),
        applied=jnp.zeros((), jnp.int32))
    print(f"# init in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    mesh = make_mesh([-1], ["data"])
    state = jax.device_put(state)
    batch = shard_batch(batch, mesh)
    step = make_train_step(model, tx)

    t0 = time.perf_counter()
    state, logs = step(state, batch, jax.random.fold_in(rng, 2))
    _ = float(logs["total_loss"])
    print(f"# compile+first step {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    iters = 10
    per = []
    for i in range(iters):
        t0 = time.perf_counter()
        state, logs = step(state, batch, jax.random.fold_in(rng, 3 + i))
        # sync on the LAST program's output: in the split-step forms
        # total_loss is produced by an earlier program and fetching it
        # would exclude the trailing programs (see bench.py round-4 note)
        _ = float(state.loss_ema)
        per.append(time.perf_counter() - t0)
    med = float(np.median(per))
    ips = B / med
    print(f"# per-step median {med * 1e3:.0f}ms", file=sys.stderr)
    print(json.dumps({
        "metric": f"weak_train_step_{S}px_b{B}",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / REF_TRAIN_IMG_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
