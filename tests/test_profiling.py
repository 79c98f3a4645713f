"""Profiling utilities (utils/profiling.py): stage timing semantics."""

import numpy as np
import pytest

import jax.numpy as jnp

from fccf_pcr_tpu.utils.profiling import StageTimer


def test_stage_timer_accumulates_and_synchronizes():
    t = StageTimer()
    with t.stage("a") as live:
        live.append(jnp.ones((256, 256)) @ jnp.ones((256, 256)))
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert set(t.times) == {"a", "b"}
    assert t.times["a"] > 0.0
    rep = t.report()
    assert "a" in rep and "total" in rep


def test_stage_timer_records_on_exception():
    t = StageTimer()
    with pytest.raises(RuntimeError):
        with t.stage("boom"):
            raise RuntimeError("x")
    assert "boom" in t.times  # recorded despite the raise


def test_stage_timer_entry_sync_args_still_accepted():
    x = jnp.arange(8.0)
    t = StageTimer()
    with t.stage("pre", x):
        y = np.asarray(x) * 2
    assert y[3] == 6.0 and t.times["pre"] >= 0.0
