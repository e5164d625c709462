"""Multi-host helpers (single-process behavior + slice math)."""

import jax

from tfpnp_tpu.parallel import init_distributed, is_multi_host, local_batch_slice


class TestDistributedHelpers:
    def test_noop_without_env(self, monkeypatch):
        monkeypatch.delenv("TFPNP_COORDINATOR", raising=False)
        monkeypatch.delenv("TFPNP_NUM_PROCESSES", raising=False)
        assert init_distributed() is False
        assert is_multi_host() is False

    def test_local_batch_slice_single_host(self):
        s = local_batch_slice(48)
        assert (s.start, s.stop) == (0, 48 // jax.process_count())
