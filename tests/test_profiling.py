"""Profiling utilities: trace context writes a profile; StepTimer stats."""

from pathlib import Path

import jax
import jax.numpy as jnp

from tfpnp_tpu.utils.profiling import StepTimer, trace


class TestProfiling:
    def test_trace_writes_profile(self, tmp_path):
        with trace(str(tmp_path)):
            jax.block_until_ready(jnp.ones((64, 64)) @ jnp.ones((64, 64)))
        assert list(Path(tmp_path).rglob("*.xplane.pb")), "no trace written"

    def test_trace_disabled_noop(self, tmp_path):
        with trace(str(tmp_path), enabled=False):
            pass
        assert not list(Path(tmp_path).rglob("*"))

    def test_step_timer_summary(self):
        t = StepTimer()
        for _ in range(3):
            with t.section("step"):
                pass
        s = t.summary()
        assert s["step"]["n"] == 3 and s["step"]["total_s"] >= 0
