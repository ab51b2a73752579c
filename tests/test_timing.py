"""utils/timing.device_time — the completion-barriered timer every
benchmark uses (block_until_ready returns at dispatch on the tunneled
TPU backend; see the module docstring)."""

import jax
import jax.numpy as jnp
import numpy as np

from duckdb_vss_tpu.utils.timing import device_time, measure_rtt


def test_device_time_positive_and_scales():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(512, 512)),
                    jnp.float32)

    @jax.jit
    def one(x):
        return x @ x

    @jax.jit
    def eight(x):
        y = x
        for _ in range(8):
            y = y @ x
        return y

    t1 = device_time(one, x, iters=5, warm=1, subtract_rtt=False)
    t8 = device_time(eight, x, iters=5, warm=1, subtract_rtt=False)
    assert t1 > 0 and t8 > 0
    assert t8 > t1  # more work takes longer


def test_device_time_tree_output():
    @jax.jit
    def pair(x):
        return {"a": x + 1, "b": (x * 2, x - 1)}

    x = jnp.ones((8,))
    t = device_time(pair, x, iters=2, warm=1, subtract_rtt=False)
    assert t > 0


def test_measure_rtt():
    assert measure_rtt(reps=2) >= 0
