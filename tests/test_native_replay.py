"""C++ replay engine: build, semantics-equivalence vs numpy buffer, perf."""

import numpy as np
import pytest

from tfpnp_tpu._native import load_replay_lib
from tfpnp_tpu.rl.replay import NativeReplayBuffer, ReplayBuffer, make_replay_buffer


def _tree(rng, b):
    return {"solver": {"x": rng.rand(b, 8, 6).astype(np.float32),
                       "z": rng.rand(b, 8, 6).astype(np.float32)},
            "T": rng.rand(b).astype(np.float32)}


class TestNativeReplay:
    def setup_method(self):
        lib = load_replay_lib()
        if lib is None:
            pytest.skip("g++ toolchain unavailable")
        self.lib = lib

    def test_matches_numpy_buffer(self):
        rng = np.random.RandomState(0)
        nat = NativeReplayBuffer(10, self.lib)
        ref = ReplayBuffer(10)
        # interleaved masked inserts incl. ring wraparound
        for step in range(7):
            tree = _tree(rng, 4)
            keep = rng.rand(4) > 0.3
            k1 = nat.store_batch(tree, keep)
            k2 = ref.store_batch(tree, keep)
            assert k1 == k2
            assert nat.size == ref.size
        # identical sampling given identical generator state
        g1 = np.random.default_rng(42)
        g2 = np.random.default_rng(42)
        s_nat = nat.sample(6, g1)
        s_ref = ref.sample(6, g2)
        for a, b in zip(np.asarray(s_nat["solver"]["x"]),
                        np.asarray(s_ref["solver"]["x"])):
            np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(np.asarray(s_nat["T"]),
                                      np.asarray(s_ref["T"]))

    def test_capacity_ring_semantics(self):
        rng = np.random.RandomState(1)
        nat = NativeReplayBuffer(5, self.lib)
        for _ in range(4):
            nat.store_batch(_tree(rng, 3), np.ones(3, bool))
        assert nat.size == 5  # saturated at capacity

    def test_factory_backends(self):
        from tfpnp_tpu.rl.replay import DeviceReplayBuffer
        assert isinstance(make_replay_buffer(8), DeviceReplayBuffer)
        assert isinstance(make_replay_buffer(8, "device"), DeviceReplayBuffer)
        assert isinstance(make_replay_buffer(8, "native"), NativeReplayBuffer)
        assert isinstance(make_replay_buffer(8, "host"), ReplayBuffer)


class TestDeviceReplay:
    def test_matches_host_buffer(self):
        import jax
        import jax.numpy as jnp
        from tfpnp_tpu.rl.replay import DeviceReplayBuffer

        rng = np.random.RandomState(0)
        dev = DeviceReplayBuffer(10)
        ref = ReplayBuffer(10)
        for step in range(7):
            tree = _tree(rng, 4)
            keep = rng.rand(4) > 0.3
            k1 = dev.store_batch(jax.tree.map(jnp.asarray, tree), keep)
            k2 = ref.store_batch(tree, keep)
            assert k1 == k2 and dev.size == ref.size
        g1 = np.random.default_rng(7)
        g2 = np.random.default_rng(7)
        s_dev = jax.device_get(dev.sample(6, g1))
        s_ref = ref.sample(6, g2)
        np.testing.assert_allclose(np.asarray(s_dev["solver"]["x"]),
                                   np.asarray(s_ref["solver"]["x"]))
        np.testing.assert_allclose(np.asarray(s_dev["T"]), np.asarray(s_ref["T"]))

    def test_trash_slot_isolation(self):
        """Dead rows must never land in live ring slots."""
        import jax
        import jax.numpy as jnp
        from tfpnp_tpu.rl.replay import DeviceReplayBuffer

        dev = DeviceReplayBuffer(4)
        tree = {"v": jnp.arange(12.0).reshape(3, 4)}
        dev.store_batch(tree, np.array([True, False, True]))
        assert dev.size == 2
        got = jax.device_get(dev.sample(2, np.random.default_rng(0)))
        for row in np.asarray(got["v"]):
            assert row.tolist() in ([0, 1, 2, 3], [8, 9, 10, 11])


class TestOversizedInsert:
    def test_trim_keeps_last_capacity_rows(self):
        import jax
        import jax.numpy as jnp
        from tfpnp_tpu.rl.replay import DeviceReplayBuffer

        for buf in (ReplayBuffer(3), DeviceReplayBuffer(3)):
            tree = {"v": jnp.arange(6.0).reshape(6, 1)}
            n = buf.store_batch(tree, np.ones(6, bool))
            assert n == 3 and buf.size == 3
            got = jax.device_get(buf.sample(9, np.random.default_rng(0)))
            assert set(np.asarray(got["v"]).ravel().tolist()) <= {3.0, 4.0, 5.0}
