"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfpnp_tpu.parallel.mesh import batch_sharder, make_mesh, replicate


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


class TestMesh:
    def test_batch_sharded_over_dp(self, mesh):
        shard = batch_sharder(mesh)
        x = shard(jnp.zeros((16, 4, 4)))
        assert len(x.sharding.device_set) == 8

    def test_indivisible_batch_replicated(self, mesh):
        shard = batch_sharder(mesh)
        x = shard(jnp.zeros((7, 4, 4)))
        assert x.sharding.is_fully_replicated

    def test_sharded_mean_matches_single_device(self, mesh):
        shard = batch_sharder(mesh)
        x = np.random.RandomState(0).randn(16, 8).astype(np.float32)
        f = jax.jit(lambda a: jnp.mean(a ** 2))
        np.testing.assert_allclose(float(f(shard(jnp.asarray(x)))),
                                   float(np.mean(x ** 2)), rtol=1e-6)

    def test_replicate(self, mesh):
        p = replicate(mesh, {"w": jnp.ones((3, 3))})
        assert p["w"].sharding.is_fully_replicated

    def test_batchnorm_stats_are_global(self, mesh):
        # the sync-BN guarantee: batch statistics computed under jit over a
        # dp-sharded batch equal the full-batch statistics
        import flax.linen as nn

        shard = batch_sharder(mesh)
        bn = nn.BatchNorm(use_running_average=False, momentum=0.9)
        x = np.random.RandomState(0).randn(16, 4, 4, 3).astype(np.float32) * 5 + 2
        variables = bn.init(jax.random.PRNGKey(0), x)

        @jax.jit
        def stats(x):
            _, mut = bn.apply(variables, x, mutable=["batch_stats"])
            return mut["batch_stats"]["mean"]

        got = np.asarray(stats(shard(jnp.asarray(x))))
        want = (1 - 0.9) * x.mean(axis=(0, 1, 2))  # EMA from zero init
        np.testing.assert_allclose(got, want, rtol=1e-4)


class TestDryrunMultichip:
    def test_dryrun(self):
        import sys
        from pathlib import Path
        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)
