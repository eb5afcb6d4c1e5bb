#!/usr/bin/env python
"""Evaluation driver: run inference over the test split and compute
Omni3D 2D/3D AP (the reference's do_test, tools/train_net.py:65-124 +
inference_on_dataset, omni3d_evaluation.py:523-642)."""
from __future__ import annotations

import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

logger = logging.getLogger("weakcube_tpu.eval")


# Detections fields the host records actually read — the jitted eval step
# returns ONLY these (scores_full alone is (B, D, C+1) of dead transfer on
# the tunnel-attached TPU, and fewer leaves = fewer fetch round-trips).
FETCH_FIELDS = ("boxes", "scores", "classes", "valid",
                "centers3D", "dims3D", "poses3D", "scores3D")


FIELD_WIDTHS = (("boxes", 4), ("scores", 1), ("classes", 1), ("valid", 1),
                ("centers3D", 3), ("dims3D", 3), ("poses3D", 9),
                ("scores3D", 1))


def make_fetch_eval_step(model):
    """Jitted inference step returning ONE packed (B, D, W) f32 array of
    the fields the host records read, instead of a dict of 8 leaves.

    On the tunnel-attached axon TPU, jax.device_get transfers leaves with
    a round-trip each (~29 ms), so the dict fetch cost 8 RTTs per batch —
    measured 1021 ms/batch of 32 against ~88 ms of compute (round-4).
    Packing device-side makes the fetch one transfer. The per-field
    (field, width) layout is derived ONCE on first call via jax.eval_shape
    (no tracing side effects — a retrace on a new batch shape can never
    clear it mid-flight; advisor r4) and exposed as `jitted.layout`;
    `unpack_fetched` inverts it on host."""
    import jax
    import jax.numpy as jnp

    def det_fn(params, batch_stats, b):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           b, train=False)

    def f(params, batch_stats, b):
        det = det_fn(params, batch_stats, b)
        parts = [getattr(det, k).reshape(det.boxes.shape[0],
                                         det.boxes.shape[1], -1)
                 .astype(jnp.float32)
                 for k, _w in FIELD_WIDTHS if getattr(det, k) is not None]
        return jnp.concatenate(parts, axis=-1)

    jitted = jax.jit(f)

    class _Step:
        """Callable wrapper; .layout is derived once on the first call."""

        layout = None

        def __call__(self, params, batch_stats, b):
            if self.layout is None:
                # abstract eval: which Detections fields the model emits is
                # a function of the model config, not of batch values
                det = jax.eval_shape(det_fn, params, batch_stats, b)
                self.layout = [(k, w) for k, w in FIELD_WIDTHS
                               if getattr(det, k) is not None]
            return jitted(params, batch_stats, b)

    return _Step()


def unpack_fetched(packed, layout):
    """Host-side inverse of the packed eval-step fetch: (B, D, W) numpy ->
    {field: array} with original shapes/dtypes."""
    packed = np.asarray(packed)
    out = {}
    o = 0
    for k, w in layout:
        v = packed[..., o:o + w]
        o += w
        if k == "poses3D":
            v = v.reshape(v.shape[0], v.shape[1], 3, 3)
        elif w == 1:
            v = v[..., 0]
        if k == "classes":
            v = v.astype(np.int32)
        elif k == "valid":
            v = v > 0.5
        out[k] = v
    return out


def detections_to_records(fetched, batch, detections_per_image: int):
    """Host-fetched eval-step dict -> per-image numpy eval records (rescaled
    to the original resolution, like GeneralizedRCNN._postprocess)."""
    from weakcube_tpu.ops import cuboids as cub
    out = []
    boxes = np.asarray(fetched["boxes"])
    scores = np.asarray(fetched["scores"])
    classes = np.asarray(fetched["classes"])
    valid = np.asarray(fetched["valid"])
    centers = np.asarray(fetched["centers3D"]) \
        if fetched.get("centers3D") is not None else None
    dims = np.asarray(fetched["dims3D"]) \
        if fetched.get("dims3D") is not None else None
    poses = np.asarray(fetched["poses3D"]) \
        if fetched.get("poses3D") is not None else None
    s3d = np.asarray(fetched["scores3D"]) \
        if fetched.get("scores3D") is not None else scores
    B = boxes.shape[0]
    for b in range(B):
        m = valid[b]
        scale = float(batch["scale"][b])
        rec = {
            "image_id": int(batch["image_id"][b]),
            "boxes": boxes[b][m] / scale,
            "scores": s3d[b][m],
            "classes": classes[b][m],
        }
        if centers is not None:
            box3d = np.concatenate([centers[b][m], dims[b][m]], -1)
            rec["centers3D"] = centers[b][m]
            rec["corners3D"] = cub.get_cuboid_verts_3d_np(box3d, poses[b][m])
        out.append(rec)
    return out


def gt_records_from_raw(records):
    """Dataset records -> evaluator GT records (original resolution).
    Pure numpy: one device call per record would be a tunnel roundtrip
    each on remote-TPU hosts."""
    from weakcube_tpu.ops import cuboids as cub
    out = []
    for r in records:
        annos = [a for a in r.get("annotations", [])]
        boxes = np.asarray([a["bbox"] for a in annos], np.float32).reshape(-1, 4)
        classes = np.asarray([a["category_id"] for a in annos], np.int32)
        ignore = np.asarray([a.get("ignore", False) for a in annos], bool)
        centers = np.asarray([a["center_cam"] for a in annos], np.float32).reshape(-1, 3)
        dims = np.asarray([a["dimensions"] for a in annos], np.float32).reshape(-1, 3)
        poses = np.asarray([a["pose"] for a in annos], np.float32).reshape(-1, 3, 3)
        corners = cub.get_cuboid_verts_3d_np(
            np.concatenate([centers, dims], -1), poses) \
            if len(annos) else np.zeros((0, 8, 3), np.float32)
        out.append({
            "image_id": r["image_id"], "boxes": boxes, "classes": classes,
            "ignore": ignore, "centers3D": centers, "corners3D": corners,
        })
    return out


def do_test(cfg, args, records, loaders, model=None, variables=None,
            proximity: bool = True, batch_size: int | None = None,
            sharded=None):
    """sharded: None = shard inference over all visible devices when more
    than one is present (the reference's per-rank inference + gather,
    omni3d_evaluation.py:523-642, as SPMD batch sharding + host device_get);
    False forces single-device."""
    import jax
    from weakcube_tpu.data.build import build_test_batches
    from weakcube_tpu.evaluation import Omni3DEvaluator
    from weakcube_tpu.models.priors import compute_priors
    from weakcube_tpu.models.rcnn3d import build_model
    from weakcube_tpu.parallel import make_mesh, replicate, shard_batch
    from weakcube_tpu.vis.logperf import (print_ap_analysis_histogram,
                                          print_ap_category_histogram,
                                          print_ap_table)

    num_classes = cfg.MODEL.ROI_HEADS.NUM_CLASSES
    if batch_size is None:
        batch_size = int(getattr(cfg.TEST, "IMS_PER_BATCH", 8))
    n_dev = jax.device_count()
    mesh = None
    if (sharded if sharded is not None else n_dev > 1) and n_dev > 1:
        # round the batch up to a device multiple so the data axis shards
        batch_size = -(-batch_size // n_dev) * n_dev
        mesh = make_mesh([-1], ["data"])
        logger.info("sharded eval over %d devices (batch %d)", n_dev,
                    batch_size)
    if model is None:
        priors = compute_priors(cfg, records, num_classes)
        model = build_model(cfg, priors)
    if variables is None:
        # cfg.MODEL.WEIGHTS names an explicit checkpoint to evaluate
        # (reference resume_or_load semantics: cubercnn:// URIs, released
        # .pth files, orbax dirs); fall back to OUTPUT_DIR's rolling ckpt
        first = next(build_test_batches(cfg, records[:batch_size],
                                        batch_size=batch_size, loaders=loaders))
        init_vars = model.init({"params": jax.random.PRNGKey(0)}, first,
                               train=False)
        target = {"params": init_vars["params"],
                  "batch_stats": init_vars.get("batch_stats", {})}
        if cfg.MODEL.WEIGHTS:
            from weakcube_tpu.solver.checkpoint import load_model_weights
            params, batch_stats = load_model_weights(cfg.MODEL.WEIGHTS, cfg)
            variables = {"params": params, "batch_stats": batch_stats}
            logger.info("restored MODEL.WEIGHTS=%s", cfg.MODEL.WEIGHTS)
        else:
            name = "model_final" if os.path.exists(
                os.path.join(cfg.OUTPUT_DIR, "model_final")) else "model_recent"
            if os.path.exists(os.path.join(cfg.OUTPUT_DIR, name)):
                import orbax.checkpoint as ocp
                restored = ocp.StandardCheckpointer().restore(
                    os.path.join(os.path.abspath(cfg.OUTPUT_DIR), name))
                variables = {"params": restored["params"],
                             "batch_stats": restored.get("batch_stats", {})}
                logger.info("restored %s", name)
            else:
                variables = target
                logger.warning("no checkpoint found in %s; evaluating random "
                               "init", cfg.OUTPUT_DIR)

    if mesh is not None:
        variables = replicate(variables, mesh)
    eval_step = make_fetch_eval_step(model)
    gt_recs = {g["image_id"]: g for g in gt_records_from_raw(records)}
    # multi-dataset: one evaluator per source dataset + pooled summarize_all
    # (reference Omni3DEvaluationHelper, omni3d_evaluation.py:168-520)
    ds_of = {r["image_id"]: r.get("dataset_name", "dataset") for r in records}
    ds_names = sorted(set(ds_of.values()))
    multi_ds = len(ds_names) > 1
    if multi_ds:
        from weakcube_tpu.evaluation import Omni3DEvaluationHelper
        helper = Omni3DEvaluationHelper(
            ds_names, num_classes,
            output_folder=os.path.join(cfg.OUTPUT_DIR, "eval") if
            cfg.OUTPUT_DIR else None)
        add_record = lambda rec: helper.add_predictions(
            ds_of[rec["image_id"]], rec, gt_recs[rec["image_id"]])
    else:
        evaluator = Omni3DEvaluator(num_classes, proximity=proximity)
        add_record = lambda rec: evaluator.add(rec, gt_recs[rec["image_id"]])

    vis_budget = int(os.environ.get("WEAKCUBE_EVAL_VIS", 0))
    t0 = time.time()
    n_img = 0
    batch_times = []   # steady-state excludes per-shape first batches (compile)
    data_times = []    # time blocked on the host loader (mapper/decode)
    shapes_seen = set()
    tb = time.time()
    from weakcube_tpu.data.build import prefetch
    it = prefetch(build_test_batches(cfg, records, batch_size=batch_size,
                                     loaders=loaders))
    def process(out_dev, batch):
        """Fetch one dispatched batch's trimmed outputs and feed the
        evaluator. Called AFTER the next batch has been dispatched, so the
        device_get (a tunnel round-trip on remote TPUs) and the host record
        building overlap with the next batch's on-device compute."""
        nonlocal n_img, vis_budget
        fetched = unpack_fetched(jax.device_get(out_dev), eval_step.layout)
        if vis_budget > 0:
            # eval-time JPEG dumps (reference vis.visualize_from_instances)
            import types

            from weakcube_tpu.vis.vis import visualize_from_instances
            shim = types.SimpleNamespace(**{
                k: fetched.get(k) for k in FETCH_FIELDS})
            vdir = os.path.join(cfg.OUTPUT_DIR, "eval_vis")
            os.makedirs(vdir, exist_ok=True)
            from weakcube_tpu.vis.vis import image_to_pixels
            for i in range(min(vis_budget, len(batch["image_id"]))):
                img = image_to_pixels(batch["image"][i], cfg)
                visualize_from_instances(
                    img, np.asarray(batch["K"][i]), shim, i,
                    os.path.join(vdir, f"{int(batch['image_id'][i])}_pred.jpg"))
                vis_budget -= 1
        for rec in detections_to_records(fetched, batch,
                                         cfg.TEST.DETECTIONS_PER_IMAGE):
            # only count records the evaluator actually accepted: aspect
            # buckets pad each tail batch by repeating the last example, and
            # add() silently drops those duplicates
            if rec["image_id"] in gt_recs and add_record(rec):
                n_img += 1

    pending = None   # (dispatched outputs, host batch) awaiting fetch

    def to_device(batch):
        """Extract + upload the model inputs. Runs inside the prefetch
        thread so the host->device image transfer (the dominant per-batch
        cost on tunnel-attached TPUs) overlaps the previous batch's
        compute. The inference graph reads ONLY image/image_wh/K/gt —
        depth/ground maps are train-time inputs and uploading them was
        pure waste (32 MB + 8 MB per b32 batch)."""
        model_batch = {k: batch[k] for k in
                       ("image", "image_wh", "K", "gt") if k in batch}
        if mesh is not None:
            model_batch = shard_batch(model_batch, mesh)
        else:
            model_batch = jax.device_put(model_batch)
        return model_batch, batch

    it = prefetch(map(to_device, it))
    while True:
        td = time.time()
        nxt = next(it, None)
        data_times.append(time.time() - td)
        if nxt is not None:
            model_batch, batch = nxt
            out_dev = eval_step(variables["params"], variables["batch_stats"],
                                model_batch)
        if pending is not None:
            process(*pending)
        if nxt is None:
            break
        pending = (out_dev, batch)
        shape = tuple(batch["image"].shape)
        dt_b = time.time() - tb
        tb = time.time()
        if shape in shapes_seen:
            batch_times.append(dt_b)
        else:
            shapes_seen.add(shape)   # first batch per shape pays the compile
    dt = time.time() - t0
    logger.info("inference on %d images in %.1fs (%.2f img/s)", n_img, dt,
                n_img / max(dt, 1e-9))
    if batch_times:
        med = float(np.median(batch_times))
        med_d = float(np.median(data_times[1:])) if len(data_times) > 1 else 0.0
        logger.info("steady-state %.2f img/s (%.0f ms/batch of %d, of which "
                    "%.0f ms blocked on host data; median over %d batches, "
                    "compile batches excluded)",
                    batch_size / max(med, 1e-9), med * 1e3, batch_size,
                    med_d * 1e3, len(batch_times))

    if multi_ds:
        # reference end-of-eval report: per-dataset, analysis, omni tables
        # (omni3d_evaluation.py:378-520 + logperf.py)
        from weakcube_tpu.vis.logperf import (print_ap_dataset_histogram,
                                              print_ap_omni_histogram,
                                              print_dataset_analysis_histogram)
        for name in ds_names:
            helper.save_predictions(name)
        summary = helper.summarize_all()
        for name, res in summary["per_dataset"].items():
            print(f"== {name} ==")
            print_ap_table(res, num_classes)
            print_ap_category_histogram(name, res)
        print_dataset_analysis_histogram(summary["per_dataset"])
        print_ap_dataset_histogram(summary["per_dataset"])
        print_ap_omni_histogram(summary["overall"])
        results = summary["overall"]
        results["per_dataset"] = summary["per_dataset"]
    else:
        results = evaluator.summarize()
        print_ap_table(results, num_classes)
        print_ap_category_histogram(ds_names[0] if ds_names else "dataset",
                                    results)
        print_ap_analysis_histogram(results)
    return results


if __name__ == "__main__":
    from train_net import main
    main(["--eval-only"] + sys.argv[1:])
