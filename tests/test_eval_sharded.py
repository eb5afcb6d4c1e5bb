"""Sharded eval inference parity: do_test over the 8-virtual-device CPU mesh
must produce the exact same AP as single-device (the reference's per-rank
inference + record gather, omni3d_evaluation.py:523-642, re-designed as SPMD
batch sharding over the data mesh + host-side device_get of detections)."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _setup(tmp_path, n_img=12):
    from tools.train_net import parse_args, setup
    repo = os.path.join(os.path.dirname(__file__), "..")
    argv = ["--config-file", os.path.join(repo, "configs/synthetic_smoke.yaml"),
            "--eval-only", "--synthetic", str(n_img),
            "TPU.IMAGE_SIZE", "128",
            "OUTPUT_DIR", str(tmp_path / "out")]
    args = parse_args(argv)
    cfg = setup(args)
    from tools.train_net import build_data
    records, loaders, num_classes = build_data(cfg, args)
    return cfg, args, records, loaders, num_classes


def test_sharded_eval_matches_single_device(tmp_path):
    assert jax.device_count() >= 2, "conftest should expose 8 CPU devices"
    from tools.eval_net import do_test
    from weakcube_tpu.models.priors import compute_priors
    from weakcube_tpu.models.rcnn3d import build_model

    cfg, args, records, loaders, num_classes = _setup(tmp_path)
    priors = compute_priors(cfg, records, num_classes)
    model = build_model(cfg, priors)

    # one fixed random-init parameter set shared by both runs
    from weakcube_tpu.data.build import build_test_batches
    first = next(build_test_batches(cfg, records[:2], batch_size=2,
                                    loaders=loaders))
    variables = model.init({"params": jax.random.PRNGKey(7)}, first,
                           train=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}

    single = do_test(cfg, args, records, loaders, model=model,
                     variables=variables, batch_size=4, sharded=False)
    multi = do_test(cfg, args, records, loaders, model=model,
                    variables=variables, batch_size=4, sharded=True)

    assert set(single) == set(multi)
    for k in single:
        if isinstance(single[k], dict):   # per_class_{2D,3D}
            assert set(single[k]) == set(multi[k])
            for c in single[k]:
                np.testing.assert_allclose(single[k][c], multi[k][c],
                                           atol=1e-4,
                                           err_msg=f"{k}[{c}] mismatch")
        else:
            np.testing.assert_allclose(single[k], multi[k], atol=1e-4,
                                       err_msg=f"AP mismatch for {k}")
