"""Pallas prefix-sum kernel vs numpy (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from openglgaussiansplattingrenderer_tpu.ops.pallas import scan


@pytest.mark.parametrize("n", [1, 100, 2048, 5000, 70000])
def test_cumsum_int32(rng, n):
    x = rng.integers(0, 100, n).astype(np.int32)
    got = np.asarray(scan.cumsum(jnp.asarray(x)))
    np.testing.assert_array_equal(got, np.cumsum(x))


def test_cumsum_float32(rng):
    x = rng.random(10000).astype(np.float32)
    got = np.asarray(scan.cumsum(jnp.asarray(x)))
    np.testing.assert_allclose(got, np.cumsum(x), rtol=2e-5)
