"""Multi-device (8 virtual CPU) sharding tests: mesh construction, batch
sharding, and one full weak-training step under jit over the mesh."""
import os
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weakcube_tpu.parallel import make_mesh, shard_batch
from weakcube_tpu.parallel.mesh import batch_sharding, replicate


class TestMesh:
    def test_make_mesh_all_devices(self):
        mesh = make_mesh([-1], ["data"])
        assert mesh.size == len(jax.devices())
        assert mesh.axis_names == ("data",)

    def test_shard_batch_places_leading_axis(self):
        mesh = make_mesh([-1], ["data"])
        batch = {"x": jnp.ones((8, 4)), "y": jnp.ones((8,))}
        sharded = shard_batch(batch, mesh)
        assert sharded["x"].sharding == batch_sharding(mesh)

    def test_psum_over_mesh(self):
        mesh = make_mesh([-1], ["data"])
        x = jax.device_put(jnp.arange(8.0), batch_sharding(mesh))
        total = jax.jit(jnp.sum)(x)
        assert float(total) == 28.0


class TestMultichipTrainStep:
    def test_dryrun_multichip(self):
        # the same path the driver validates
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        import __graft_entry__ as ge
        n = min(8, len(jax.devices()))
        ge.dryrun_multichip(n)

    def test_entry_compiles(self):
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        import __graft_entry__ as ge
        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        assert all(np.all(np.isfinite(np.asarray(o))) for o in out)


class TestShardingEquivalence:
    def test_sharded_step_matches_unsharded(self):
        """DP over the 8-device mesh must produce the same loss and updated
        params as the same batch on one device (SPMD is a layout, not a
        semantics, change)."""
        import numpy as np
        import optax
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        import __graft_entry__ as ge
        from weakcube_tpu.models.rcnn3d import build_model
        from weakcube_tpu.parallel import make_mesh, make_train_step, shard_batch
        from weakcube_tpu.parallel.train_step import TrainState
        from weakcube_tpu.solver import build_optimizer
        import jax.numpy as jnp

        cfg = ge._tiny_cfg(image_size=64, dla=False)
        priors = {"priors_dims_per_cat": np.tile(
            np.array([[[0.8, 0.8, 0.8], [0.3, 0.3, 0.3]]], np.float32), (5, 1, 1))}
        model = build_model(cfg, priors)
        batch = ge._tiny_batch(8, 64, 64)
        rng = jax.random.PRNGKey(0)
        variables = model.init({"params": rng}, batch, train=True,
                               rng=jax.random.fold_in(rng, 1))
        tx = build_optimizer(cfg, variables["params"])

        host_params = jax.device_get(variables["params"])
        host_stats = jax.device_get(variables.get("batch_stats", {}))

        def fresh_state():
            # fresh device buffers each time: the train step donates its
            # input state, which would delete shared arrays
            p = jax.tree_util.tree_map(jnp.asarray, host_params)
            return TrainState(
                step=jnp.zeros((), jnp.int32), params=p,
                batch_stats=jax.tree_util.tree_map(jnp.asarray, host_stats),
                opt_state=tx.init(p),
                loss_ema=jnp.zeros(()), ema_init=jnp.zeros((), bool),
                skipped=jnp.zeros((), jnp.int32), applied=jnp.zeros((), jnp.int32))

        step = make_train_step(model, tx)
        s_single, logs_single = step(fresh_state(), batch, jax.random.PRNGKey(7))
        w_single = jax.device_get(s_single.params)

        mesh = make_mesh([-1], ["data"])
        sharded = shard_batch(ge._tiny_batch(8, 64, 64), mesh)
        s_mesh, logs_mesh = step(fresh_state(), sharded, jax.random.PRNGKey(7))
        w_mesh = jax.device_get(s_mesh.params)

        np.testing.assert_allclose(float(logs_single["total_loss"]),
                                   float(logs_mesh["total_loss"]),
                                   rtol=2e-4)
        flat_s = jax.tree_util.tree_leaves(w_single)
        flat_m = jax.tree_util.tree_leaves(w_mesh)
        for a, b in zip(flat_s, flat_m):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=2e-3)


def test_multihost_entry_single_process():
    """maybe_initialize_distributed with an explicit coordinator on a
    1-process 'cluster' (fresh subprocess: jax.distributed is global).
    Reference equivalent: launch(num_machines=1), train_net.py:529-536."""
    import subprocess
    import sys

    repo = os.path.join(os.path.dirname(__file__), "..")
    env = dict(os.environ,
               WEAKCUBE_COORDINATOR="127.0.0.1:8476",
               WEAKCUBE_NUM_PROCESSES="1", WEAKCUBE_PROCESS_ID="0",
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from weakcube_tpu.parallel import (maybe_initialize_distributed,\n"
        "                                   is_main_process, make_mesh)\n"
        "assert maybe_initialize_distributed()\n"
        "assert is_main_process()\n"
        "assert jax.process_count() == 1\n"
        "mesh = make_mesh([-1], ['data'])\n"
        "assert mesh.size == 4\n"
        "print('multihost-entry ok')\n" % os.path.abspath(repo))
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "multihost-entry ok" in r.stdout


def test_multihost_entry_two_processes():
    """A real 2-process jax.distributed 'cluster' on CPU: 2 processes x 2
    virtual devices = 4 global devices; a cross-process collective (global
    sum over a 'data'-sharded array) must see every shard. This is the
    multi-controller path the reference reaches with launch(num_machines=2)
    (reference tools/train_net.py:529-536) — here it is
    maybe_initialize_distributed (parallel/distributed.py:32) driven purely
    by WEAKCUBE_* env vars."""
    import subprocess
    import sys

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import numpy as np\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import jax.numpy as jnp\n"
        "from jax.sharding import NamedSharding, PartitionSpec as P\n"
        "from weakcube_tpu.parallel import (maybe_initialize_distributed,\n"
        "                                   make_mesh)\n"
        "assert maybe_initialize_distributed()\n"
        "assert jax.process_count() == 2, jax.process_count()\n"
        "assert jax.device_count() == 4, jax.device_count()\n"
        "mesh = make_mesh([-1], ['data'])\n"
        "assert mesh.size == 4\n"
        "sh = NamedSharding(mesh, P('data'))\n"
        "x = jax.make_array_from_callback(\n"
        "    (8,), sh, lambda idx: np.arange(8.0, dtype=np.float32)[idx])\n"
        "total = jax.jit(jnp.sum,\n"
        "                out_shardings=NamedSharding(mesh, P()))(x)\n"
        "assert float(total) == 28.0, float(total)\n"
        "print('rank %%d ok' %% jax.process_index())\n" % repo)

    def spawn(rank):
        env = dict(os.environ,
                   WEAKCUBE_COORDINATOR="127.0.0.1:8497",
                   WEAKCUBE_NUM_PROCESSES="2",
                   WEAKCUBE_PROCESS_ID=str(rank),
                   JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=2")
        return subprocess.Popen([sys.executable, "-c", code], env=env,
                                stdout=subprocess.PIPE,
                                stderr=subprocess.PIPE, text=True)

    procs = [spawn(0), spawn(1)]
    outs = []
    for rank, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rank, (rc, out, err) in enumerate(outs):
        assert rc == 0, (rank, out[-2000:], err[-2000:])
        assert f"rank {rank} ok" in out


class TestPackedUpload:
    def test_pack_unpack_roundtrip(self):
        """pack -> device unpack must be bit-exact for a mixed-dtype batch
        pytree (the tunnel's flat-uint8 fast path, parallel/packed.py)."""
        import numpy as np
        from weakcube_tpu.parallel.packed import (make_unpack, pack,
                                                  pack_spec)
        rng = np.random.default_rng(0)
        batch = {
            "image": rng.integers(0, 256, (2, 16, 16, 3)).astype(np.uint8),
            "depth": rng.normal(size=(2, 16, 16)).astype(np.float16),
            "K": rng.normal(size=(2, 3, 3)).astype(np.float32),
            "gt": {"classes": rng.integers(0, 9, (2, 5)).astype(np.int32),
                   "valid": rng.integers(0, 2, (2, 5)).astype(bool)},
            "wh": np.full((2, 2), 16.0, np.float32),
        }
        spec = pack_spec(batch)
        buf = pack(batch, spec)
        assert buf.dtype == np.uint8 and buf.ndim == 1
        out = jax.device_get(make_unpack(spec)(jnp.asarray(buf)))
        flat_in, td_in = jax.tree_util.tree_flatten(batch)
        flat_out, td_out = jax.tree_util.tree_flatten(out)
        assert td_in == td_out
        for a, b in zip(flat_in, flat_out):
            assert a.dtype == b.dtype and a.shape == b.shape
            np.testing.assert_array_equal(a, b)
