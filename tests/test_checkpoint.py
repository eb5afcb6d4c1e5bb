"""Checkpoint save/restore roundtrip + weights-only warm start."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from weakcube_tpu.solver.checkpoint import (PeriodicCheckpointerOnlyOne,
                                            load_weights_pretrain)


def _state(seed):
    k = jax.random.PRNGKey(seed)
    return {
        "params": {"w": jax.random.normal(k, (4, 4)), "b": jnp.zeros((4,))},
        "opt_state": {"mu": jnp.ones((4, 4))},
        "step": jnp.asarray(7, jnp.int32),
    }


class TestCheckpointer:
    def test_roundtrip(self, tmp_path):
        ckpt = PeriodicCheckpointerOnlyOne(str(tmp_path), period=1)
        s = _state(0)
        ckpt.save("model_recent", s)
        assert ckpt.has_checkpoint()
        restored = ckpt.load("model_recent", _state(1))
        np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                                   np.asarray(s["params"]["w"]))
        assert int(restored["step"]) == 7

    def test_rolling_overwrite(self, tmp_path):
        ckpt = PeriodicCheckpointerOnlyOne(str(tmp_path), period=2)
        ckpt.step(1, _state(0))   # (1+1) % 2 == 0 -> saves
        first = ckpt.load("model_recent", _state(9))
        ckpt.step(3, _state(5))   # overwrites the SAME file
        second = ckpt.load("model_recent", _state(9))
        assert not np.allclose(np.asarray(first["params"]["w"]),
                               np.asarray(second["params"]["w"]))
        # only one rolling checkpoint exists
        names = [n for n in os.listdir(str(tmp_path)) if n.startswith("model")]
        assert names == ["model_recent"]

    def test_resume_or_load_fresh(self, tmp_path):
        ckpt = PeriodicCheckpointerOnlyOne(str(tmp_path), period=1)
        s = _state(3)
        out = ckpt.resume_or_load(s, resume=True)  # no ckpt -> identity
        np.testing.assert_allclose(np.asarray(out["params"]["w"]),
                                   np.asarray(s["params"]["w"]))

    def test_weights_pretrain(self, tmp_path):
        ckpt = PeriodicCheckpointerOnlyOne(str(tmp_path), period=1)
        s = _state(4)
        ckpt.save("model_final", s)
        params = load_weights_pretrain(os.path.join(str(tmp_path), "model_final"),
                                       s["params"])
        np.testing.assert_allclose(np.asarray(params["w"]),
                                   np.asarray(s["params"]["w"]))
