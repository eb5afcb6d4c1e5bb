"""Multi-device (8 virtual CPU) sharding tests: mesh construction, batch
sharding, and one full weak-training step under jit over the mesh."""
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
