"""Checkpointing: rolling single checkpoint + final + weights-only warm start.

Replaces fvcore/detectron2 DetectionCheckpointer + the reference's
`PeriodicCheckpointerOnlyOne` (cubercnn/solver/checkpoint.py:18-27, which
deliberately keeps ONE rolling `model_recent.pth` plus `model_final.pth`)
and the `MODEL.WEIGHTS_PRETRAIN` weights-only warm start
(tools/train_net.py:149-152). Implemented with orbax.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class PeriodicCheckpointerOnlyOne:
    """Save `model_recent` every `period` steps (overwriting) and
    `model_final` on close."""

    def __init__(self, output_dir: str, period: int):
        self.output_dir = os.path.abspath(output_dir)
        self.period = max(int(period), 1)
        os.makedirs(self.output_dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.output_dir, name)

    def save(self, name: str, state: Any) -> None:
        path = self._path(name)
        self._ckpt.save(path, jax.device_get(state), force=True)
        self._ckpt.wait_until_finished()

    def step(self, iteration: int, state: Any) -> None:
        if (iteration + 1) % self.period == 0:
            self.save("model_recent", state)

    def finalize(self, state: Any) -> None:
        self.save("model_final", state)

    def has_checkpoint(self) -> bool:
        return os.path.exists(self._path("model_recent"))

    def load(self, name: str, target: Any) -> Any:
        return self._ckpt.restore(self._path(name), target=jax.device_get(target))

    def resume_or_load(self, state: Any, resume: bool = True) -> Any:
        if resume and self.has_checkpoint():
            return self.load("model_recent", state)
        return state


def load_weights_pretrain(path: str, params: Any) -> Any:
    """Weights-only warm start: restore params (no optimizer/step), the
    MODEL.WEIGHTS_PRETRAIN semantics."""
    ckpt = ocp.StandardCheckpointer()
    restored = ckpt.restore(os.path.abspath(path))
    if isinstance(restored, dict) and "params" in restored:
        return restored["params"]
    return restored


def load_model_weights(src: str, cfg) -> tuple:
    """`cfg.MODEL.WEIGHTS` resolution — the reference's
    `DetectionCheckpointer.resume_or_load(cfg.MODEL.WEIGHTS)` semantics
    (reference tools/train_net.py:149-155): evaluate or warm-start from any
    named checkpoint. Accepts
      * ``cubercnn://...`` zoo URIs (resolved via utils.model_zoo, cached),
      * released detectron2 ``.pth`` files (converted on the fly),
      * orbax checkpoint directories (full TrainState or weights-only).
    Returns ``(params, batch_stats)``.
    """
    if src.startswith("cubercnn://"):
        from weakcube_tpu.utils.model_zoo import resolve
        src = resolve(src)
    if src.endswith(".pth"):
        from weakcube_tpu.utils.torch_convert import load_pth
        from weakcube_tpu.utils.zoo_convert import convert_zoo_checkpoint
        return convert_zoo_checkpoint(load_pth(src), cfg)
    restored = ocp.StandardCheckpointer().restore(os.path.abspath(src))
    if isinstance(restored, dict) and "params" in restored:
        return restored["params"], restored.get("batch_stats", {}) or {}
    return restored, {}
