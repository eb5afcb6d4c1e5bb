"""Divergence-stabilisation semantics of the jitted train step."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from weakcube_tpu.parallel.train_step import TrainState, make_train_step


class ToyModel(nn.Module):
    """Minimal model with the RCNN3D train interface."""

    @nn.compact
    def __call__(self, batch, train=False, rng=None):
        w = self.param("w", nn.initializers.ones, (4,))
        pred = jnp.sum(batch["x"] * w)
        loss = (pred - batch["y"]) ** 2
        return {"loss": loss}, {"metric": loss}


def make_state(model, tx, batch):
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=True,
                           rng=jax.random.PRNGKey(1))
    params = variables["params"]
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats={}, opt_state=tx.init(params),
                      loss_ema=jnp.zeros(()), ema_init=jnp.zeros((), bool),
                      skipped=jnp.zeros((), jnp.int32),
                      applied=jnp.zeros((), jnp.int32))


class TestStabilisation:
    def setup_method(self):
        self.model = ToyModel()
        self.tx = optax.sgd(0.01)
        self.batch = {"x": jnp.ones((4,)), "y": jnp.asarray(2.0)}
        self.state = make_state(self.model, self.tx, self.batch)
        self.step = make_train_step(self.model, self.tx)

    def test_normal_update_applies(self):
        s1, logs = self.step(self.state, self.batch, jax.random.PRNGKey(0))
        assert int(s1.applied) == 1 and int(s1.skipped) == 0
        # params move off the ones-init (input state was donated)
        assert not np.allclose(np.asarray(s1.params["w"]), np.ones(4))
        assert float(s1.loss_ema) == float(logs["total_loss"])

    def test_nan_batch_skips_and_preserves_params(self):
        s1, _ = self.step(self.state, self.batch, jax.random.PRNGKey(0))
        # the step donates its input state — snapshot params to host first
        w_before = np.asarray(s1.params["w"]).copy()
        bad = {"x": jnp.full((4,), jnp.nan), "y": jnp.asarray(2.0)}
        s2, logs = self.step(s1, bad, jax.random.PRNGKey(1))
        assert int(s2.skipped) == 1
        np.testing.assert_allclose(np.asarray(s2.params["w"]), w_before)
        assert float(logs["diverging"]) == 1.0
        # EMA absorbed the clipped loss, not the NaN
        assert np.isfinite(float(s2.loss_ema))

    def test_explosion_skips(self):
        s = self.state
        for i in range(3):  # warm the EMA near the normal loss
            s, _ = self.step(s, self.batch, jax.random.fold_in(jax.random.PRNGKey(0), i))
        huge = {"x": jnp.ones((4,)), "y": jnp.asarray(1e6)}  # loss ~1e12 >> 4x ema
        before = np.asarray(s.params["w"]).copy()
        skipped_before = int(s.skipped)
        s2, logs = self.step(s, huge, jax.random.PRNGKey(9))
        assert float(logs["diverging"]) == 1.0
        assert int(s2.skipped) == skipped_before + 1
        np.testing.assert_allclose(np.asarray(s2.params["w"]), before)

    def test_recovers_after_skip(self):
        s1, _ = self.step(self.state, self.batch, jax.random.PRNGKey(0))
        bad = {"x": jnp.full((4,), jnp.nan), "y": jnp.asarray(2.0)}
        s2, _ = self.step(s1, bad, jax.random.PRNGKey(1))
        s3, logs = self.step(s2, self.batch, jax.random.PRNGKey(2))
        assert float(logs["diverging"]) == 0.0
        assert int(s3.applied) == 2
        assert np.all(np.isfinite(np.asarray(s3.params["w"])))


class TestBackboneSplitParity:
    @pytest.mark.parametrize("split", ["backbone", "backbone2"])
    def test_backbone_split_matches_monolithic(self, split):
        # the four-program backbone split (the round-4 libtpu-fault escape
        # that unblocks the matmul ROIAlign forward) must match the
        # monolithic step: same log keys, same losses, same updated params
        # (allclose, not bitwise — the program partitioning changes XLA
        # fusion order). "backbone2" merges programs 3+4 (backbone bwd +
        # update) — same math, one fewer dispatch.
        from test_model import tiny_cfg, tiny_batch
        from weakcube_tpu.models.rcnn3d import build_model
        import numpy as onp

        cfg = tiny_cfg("RCNN3D_combined_features", "ROIHeads3DScore")
        cfg.TPU.ROI_ALIGN_TRAIN_FWD = "matmul"
        cfg = cfg.freeze()
        priors = {"priors_dims_per_cat": onp.tile(
            onp.array([[[0.8, 0.8, 0.8], [0.3, 0.3, 0.3]]], onp.float32),
            (5, 1, 1))}
        model = build_model(cfg, priors)
        tx = optax.sgd(0.01)
        batch = tiny_batch(with_depth=True)
        variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                               train=True, rng=jax.random.PRNGKey(1))
        s_a = TrainState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            loss_ema=jnp.zeros(()), ema_init=jnp.zeros((), bool),
            skipped=jnp.zeros((), jnp.int32),
            applied=jnp.zeros((), jnp.int32))
        s_b = jax.tree_util.tree_map(jnp.copy, s_a)
        step_a = make_train_step(model, tx, split=False)
        step_b = make_train_step(model, tx, split=split)
        assert getattr(step_b, "split", None) == split
        for i in range(2):
            rng = jax.random.PRNGKey(i)
            s_a, logs_a = step_a(s_a, batch, rng)
            s_b, logs_b = step_b(s_b, batch, rng)
            assert set(logs_a) == set(logs_b)
            for k in logs_a:
                np.testing.assert_allclose(
                    np.asarray(logs_a[k]), np.asarray(logs_b[k]),
                    rtol=2e-4, atol=1e-5, err_msg=f"log {k} step {i}")
        la = jax.tree_util.tree_leaves_with_path(s_a.params)
        lb = jax.tree_util.tree_leaves(s_b.params)
        assert len(la) == len(lb)
        for (path, pa), pb in zip(la, lb):
            np.testing.assert_allclose(
                np.asarray(pa), np.asarray(pb), rtol=2e-4, atol=1e-6,
                err_msg=f"param {jax.tree_util.keystr(path)}")
        # batch_stats merged from the three forward programs
        for (path, pa), pb in zip(
                jax.tree_util.tree_leaves_with_path(s_a.batch_stats),
                jax.tree_util.tree_leaves(s_b.batch_stats)):
            np.testing.assert_allclose(
                np.asarray(pa), np.asarray(pb), rtol=2e-4, atol=1e-6,
                err_msg=f"batch_stat {jax.tree_util.keystr(path)}")

        # cached ground normals are DROPPED by the backbone split (they
        # fault the libtpu as runtime args of the einsum program — round-4
        # bisect): a batch carrying them must produce the same losses as
        # one without (in-graph RANSAC either way)
        with_cache = dict(batch,
                          ground_normal=jnp.tile(
                              jnp.asarray([0.0, 1.0, 0.0]), (2, 1)),
                          ground_normal_valid=jnp.ones((2,), bool))
        # the step donates its input state — feed each call a fresh copy
        _, logs_plain = step_b(jax.tree_util.tree_map(jnp.copy, s_b),
                               batch, jax.random.PRNGKey(9))
        _, logs_cache = step_b(jax.tree_util.tree_map(jnp.copy, s_b),
                               with_cache, jax.random.PRNGKey(9))
        for k in logs_plain:
            np.testing.assert_array_equal(
                np.asarray(logs_plain[k]), np.asarray(logs_cache[k]),
                err_msg=f"normals-drop log {k}")


class TestSplitStepParity:
    def test_split_matches_monolithic(self):
        # the two-program split (round-3 worker-crash workaround) must be
        # bit-identical to the monolithic step over several updates,
        # including a skip step (non-finite batch)
        model = ToyModel()
        tx = optax.sgd(0.01)
        batch = {"x": jnp.ones((4,)), "y": jnp.asarray(2.0)}
        bad = {"x": jnp.full((4,), jnp.nan), "y": jnp.asarray(2.0)}
        s_a = make_state(model, tx, batch)
        s_b = jax.tree_util.tree_map(jnp.copy, s_a)
        step_a = make_train_step(model, tx, split=False)
        step_b = make_train_step(model, tx, split=True)
        for i, b in enumerate([batch, bad, batch, batch]):
            rng = jax.random.PRNGKey(i)
            s_a, logs_a = step_a(s_a, b, rng)
            s_b, logs_b = step_b(s_b, b, rng)
            assert set(logs_a) == set(logs_b)
            for k in logs_a:
                np.testing.assert_array_equal(
                    np.asarray(logs_a[k]), np.asarray(logs_b[k]),
                    err_msg=f"log {k} step {i}")
        for pa, pb in zip(jax.tree_util.tree_leaves(s_a),
                          jax.tree_util.tree_leaves(s_b)):
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
