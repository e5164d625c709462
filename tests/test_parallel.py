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


class TestSpatialSharding:
    """Image rows sharded over 'mp': GSPMD must produce the same numbers
    as the unsharded program (halo exchange for convs, collectives for
    the FFT data-consistency step are inserted automatically)."""

    @pytest.fixture(scope="class")
    def mesh_2x4(self):
        return make_mesh(2, 4)

    def test_spatial_spec_layouts(self, mesh_2x4):
        from tfpnp_tpu.parallel.spatial import spatial_spec
        from jax.sharding import PartitionSpec as P
        assert spatial_spec(jnp.zeros((4, 64, 64)), 2, 4) == P("dp", "mp", None)
        assert spatial_spec(jnp.zeros((4, 3, 64, 64)), 2, 4) == P("dp", None, "mp", None)
        assert spatial_spec(jnp.zeros((4,)), 2, 4) == P("dp")
        # indivisible row axis stays unsharded
        assert spatial_spec(jnp.zeros((4, 30, 30)), 2, 4) == P("dp", None, None)
        assert spatial_spec(jnp.zeros(()), 2, 4) == P()

    def test_sharded_admm_restore_matches_single_device(self, mesh_2x4,
                                                        monkeypatch):
        from tfpnp_tpu.data.synthetic import random_images
        from tfpnp_tpu.ops import fft as fft_mod
        from tfpnp_tpu.parallel.spatial import spatial_sharder
        from tfpnp_tpu.pnp import get_solver, run_bundle
        from tfpnp_tpu.pnp.tv import TVDenoiser
        from tfpnp_tpu.tasks import csmri

        # the matmul-DFT backend (TPU default) shards cleanly; the XLA CPU
        # fft thunk rejects non-dim0-major sharded layouts
        monkeypatch.setattr(fft_mod, "_FFT_BACKEND", "matmul")

        n = 64
        masks = jnp.asarray(np.stack([csmri.radial_mask(n, 4)]))
        data = jax.jit(lambda k1, k2: csmri.make_data(
            k2, random_images(k1, 2, n), masks))(
                jax.random.PRNGKey(0), jax.random.PRNGKey(1))

        solver = get_solver("csmri_admm", TVDenoiser(n_iter=3))
        hyper = {"sigma_d": np.full((2, 6), 10 / 255, np.float32),
                 "mu": np.full((2, 6), 0.1, np.float32)}

        @jax.jit
        def restore(d):
            state = run_bundle(solver, solver.init(d), solver.filter_aux(d), hyper)
            return solver.get_output(state)

        ref = np.asarray(restore(data))
        sharded = spatial_sharder(mesh_2x4)(data)
        out = restore(sharded)
        # rows really are distributed over 'mp'
        shards = out.sharding if hasattr(out, "sharding") else None
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-5)

    def test_sharded_denoiser_conv_halo(self, mesh_2x4):
        """UNet convs across row shards == unsharded (halo correctness)."""
        from tfpnp_tpu.parallel.spatial import spatial_sharder
        from tfpnp_tpu.pnp.denoiser import UNetDenoiser, init_denoiser_params

        params = init_denoiser_params(jax.random.PRNGKey(0), 32)
        den = UNetDenoiser(params=params)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64))
        sigma = jnp.full((2,), 10 / 255)

        f = jax.jit(lambda a, s: den(a, s))
        ref = np.asarray(f(x, sigma))
        xs = spatial_sharder(mesh_2x4)({"x": x, "s": sigma})
        out = np.asarray(f(xs["x"], xs["s"]))
        np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


class TestOrbaxShardedCheckpoint:
    def test_sharded_save_restore_preserves_sharding(self, mesh, tmp_path):
        """The orbax backend must round-trip dp-sharded arrays AND restore
        them with the template's sharding (the multi-host story: each host
        writes/reads its own shards; utils/checkpoint.py)."""
        import numpy as np
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tfpnp_tpu.utils.checkpoint import load_state, save_state

        sharding = NamedSharding(mesh, P("dp"))
        big = jax.device_put(
            jnp.arange(8 * 16, dtype=jnp.float32).reshape(8, 16), sharding)
        state = {"step": 5,
                 "params": {"w": big, "b": jnp.ones((3,))},
                 "np_rng": {"state": 123}}
        path = tmp_path / "ckpt.orbax"
        save_state(path, state)

        template = {"step": 0,
                    "params": {"w": jax.device_put(jnp.zeros((8, 16)), sharding),
                               "b": jnp.zeros((3,))},
                    "np_rng": None}
        back = load_state(path, template=template)
        assert back["step"] == 5 and back["np_rng"] == {"state": 123}
        np.testing.assert_array_equal(np.asarray(back["params"]["w"]),
                                      np.asarray(big))
        # restored with the dp sharding, not gathered to one device
        assert back["params"]["w"].sharding.is_equivalent_to(sharding, 2)
