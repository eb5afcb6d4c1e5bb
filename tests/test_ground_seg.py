"""End-to-end tests for ground-segmentation pseudo-GT generation.

Covers both CLI methods of weakcube_tpu/data/generate_ground_segmentations.py
(reference: cubercnn/data/generate_ground_segmentations.py:137-206):
  * depth-ransac (TPU-native default),
  * foundation — GroundingDINO -> best box -> SAM-HQ, exercised with
    random-small-weights through the REAL pipeline (tokenised "ground."
    prompt, per-phrase text masks, box selection, SAM 1024-space prompt,
    mask resize) to prove the npz + no_ground_idx.csv artefacts are produced.
"""
import csv
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weakcube_tpu.data import synthetic
from weakcube_tpu.data.generate_ground_segmentations import (
    GROUND_PROMPT_TOKENS, generate)


def _read_no_ground(root):
    path = os.path.join(root, "no_ground_idx.csv")
    assert os.path.exists(path)
    with open(path) as f:
        return [row[0] for row in csv.reader(f) if row]


class TestDepthRansac:
    def test_synthetic_end_to_end(self, tmp_path):
        records = synthetic.make_dataset(2, width=160, height=120)
        out = tmp_path / "ground_maps"
        generate(records, str(out), depth_dir="unused",
                 method="depth-ransac", artifacts_root=str(tmp_path),
                 depth_loader=lambda r: synthetic.render_depth(r["_scene"]))
        wrote = sorted(os.listdir(out))
        no_ground = _read_no_ground(str(tmp_path))
        assert len(wrote) + len(no_ground) == 2
        for f in wrote:
            with np.load(out / f) as zf:
                m = zf["ground"]
            assert m.dtype == bool and m.shape == (120, 160)


class TestFoundation:
    def test_requires_models(self, tmp_path):
        records = synthetic.make_dataset(1, width=64, height=64)
        with pytest.raises(ValueError, match="foundation method needs"):
            generate(records, str(tmp_path / "g"), depth_dir="unused",
                     method="foundation", artifacts_root=str(tmp_path))

    def test_random_small_weights_end_to_end(self, tmp_path):
        """Tiny GroundingDINO + SAM vit_tiny with random init, box_threshold
        forced below any sigmoid so the full GDINO->SAM path always runs;
        asserts the ground npz artefact layout the loaders consume."""
        from weakcube_tpu.data.pseudo_gt import grounding_dino as gd
        from weakcube_tpu.data.pseudo_gt import sam as sam_mod

        gdino = gd.GroundingDINO(num_enhancer=1, num_decoder=2,
                                 num_queries=16, dtype=jnp.float32)
        tokens = jnp.asarray([GROUND_PROMPT_TOKENS + [0] * 12])
        gdino_params = gdino.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3)), tokens,
            tokens > 0)["params"]

        sam = sam_mod.Sam(variant="vit_tiny", hq=True, dtype=jnp.float32)
        sam_params = sam.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, sam_mod.IMG_SIZE, sam_mod.IMG_SIZE, 3)),
            jnp.zeros((1, 1, 4)))["params"]

        records = synthetic.make_dataset(2, width=128, height=96)
        out = tmp_path / "ground_maps"
        generate(records, str(out), depth_dir="unused", method="foundation",
                 artifacts_root=str(tmp_path),
                 foundation_models=(gdino, gdino_params, sam, sam_params),
                 image_loader=lambda r: synthetic.render_image(r["_scene"]),
                 box_threshold=-1.0, gdino_side=112)
        wrote = sorted(os.listdir(out))
        no_ground = _read_no_ground(str(tmp_path))
        assert len(wrote) + len(no_ground) == 2
        for f in wrote:
            with np.load(out / f) as zf:
                m = zf["ground"]
            assert m.dtype == bool and m.shape == (96, 128)
