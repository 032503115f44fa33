"""TPU-native 3-phase radix sort vs lax.sort (exactness + stability).

The component mirrors the reference's sort library contract
(``tests/sortTests.cpp``: exact agreement with std::sort on float keys,
stability through the index indirection): every test here is an exact
comparison, no tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openglgaussiansplattingrenderer_tpu.ops.pallas.radix_sort import (
    radix_sort,
    radix_sort_with_payload,
)


def _lax_reference(keys, values):
    idx = jnp.arange(keys.shape[0], dtype=jnp.int32)
    out = jax.lax.sort((keys, idx) + tuple(values), num_keys=1,
                       is_stable=True)
    return out[0], out[1], out[2:]


def test_radix_full_32bit_keys(rng):
    c = 3000
    keys = jnp.asarray(rng.integers(0, 2**32, c, dtype=np.uint32))
    vals = tuple(jnp.asarray(rng.standard_normal(c), jnp.float32)
                 for _ in range(3))
    sk, sv = radix_sort(keys, vals, key_bits=32)
    rk, _, rv = _lax_reference(keys, vals)
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(rk))
    for a, b in zip(sv, rv):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_radix_stability_duplicate_keys(rng):
    # many duplicate keys; the carried iota proves equal keys keep input
    # order (the reference's index-indirection contract)
    c = 2048
    keys = jnp.asarray(rng.integers(0, 7, c, dtype=np.uint32))
    iota = jnp.arange(c, dtype=jnp.float32)
    sk, (si,) = radix_sort(keys, (iota,), key_bits=4)
    rk, ri, _ = _lax_reference(keys, ())
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(si).astype(np.int32),
                                  np.asarray(ri))


def test_radix_key_bits_truncates_passes(rng):
    # 9-bit keys with key_bits=9 -> 3 passes; still exact
    c = 1500
    keys = jnp.asarray(rng.integers(0, 512, c, dtype=np.uint32))
    vals = (jnp.asarray(rng.standard_normal(c), jnp.float32),)
    sk, sv = radix_sort(keys, vals, key_bits=9)
    rk, _, rv = _lax_reference(keys, vals)
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(sv[0]), np.asarray(rv[0]))


def test_radix_extreme_keys_and_short_input(rng):
    # max-key records must stay ahead of the internal padding rows
    keys = jnp.asarray(
        np.array([0xFFFFFFFF, 0, 0xFFFFFFFF, 123456789, 0xFFFFFFFE],
                 dtype=np.uint32))
    iota = jnp.arange(5, dtype=jnp.float32)
    sk, (si,) = radix_sort(keys, (iota,), key_bits=32)
    np.testing.assert_array_equal(
        np.asarray(sk),
        np.array([0, 123456789, 0xFFFFFFFE, 0xFFFFFFFF, 0xFFFFFFFF],
                 dtype=np.uint32))
    np.testing.assert_array_equal(np.asarray(si), [1.0, 3.0, 4.0, 0.0, 2.0])


def test_radix_sort_with_payload_grad(rng):
    # payload gradients flow through the re-sort backward exactly like the
    # lax.sort path: d(loss)/d(field) is the cotangent un-permuted
    c = 640
    keys = jnp.asarray(rng.integers(0, 2**20, c, dtype=np.uint32))
    v = jnp.asarray(rng.standard_normal(c), jnp.float32)
    w = jnp.asarray(rng.standard_normal(c), jnp.float32)

    def loss(v):
        _, _, sf = radix_sort_with_payload(keys, (v,), 20)
        return jnp.sum(sf[0] * w)

    g = jax.grad(loss)(v)
    # analytic: permuting then weighting sums w[pos(sorted r)] * v[r]
    _, si, _ = radix_sort_with_payload(keys, (v,), 20)
    expect = np.zeros(c, np.float32)
    expect[np.asarray(si)] = np.asarray(w)
    np.testing.assert_allclose(np.asarray(g), expect, rtol=0, atol=0)


@pytest.mark.slow
def test_radix_in_render_pipeline():
    # cfg.record_sort="radix" on the packed-key fast path renders the
    # bit-identical image to the lax.sort default: both engines are stable
    # sorts of the same key, so the full record permutation agrees
    import dataclasses

    from openglgaussiansplattingrenderer_tpu.camera import Camera
    from openglgaussiansplattingrenderer_tpu.config import RenderConfig
    from openglgaussiansplattingrenderer_tpu.io import ply as ply_io
    from openglgaussiansplattingrenderer_tpu.render import (
        camera_args,
        render_arrays,
    )

    scene = ply_io.make_synthetic_scene(600, seed=11, extent=2.0)
    params = {k: jnp.asarray(v) for k, v in scene.items()}
    cam = Camera(0.0, 0.0, -6.0, width=64, height=64)
    a = camera_args(cam)
    args = (jnp.asarray(a["view"]), jnp.asarray(a["vp"]), a["focal_x"],
            a["focal_y"], a["tan_fovx"], a["tan_fovy"], 64, 64)
    cfg = RenderConfig(grid_x=2, grid_y=2, chunk=128,
                       depth_key="packed", capacity_records=2048)
    img_lax, stats_lax = render_arrays(params, *args, cfg)
    cfg_r = dataclasses.replace(cfg, record_sort="radix")
    img_rad, stats_rad = render_arrays(params, *args, cfg_r)
    np.testing.assert_array_equal(np.asarray(img_lax), np.asarray(img_rad))
    assert int(stats_lax["binned_records"]) == int(stats_rad["binned_records"])


def test_radix_sort_smem_ceiling_raises_clearly():
    """Past the hardware-validated scatter offset-table size the sort must
    raise a clear ValueError, not surface a Mosaic allocation failure."""
    import jax.numpy as jnp
    import pytest

    from openglgaussiansplattingrenderer_tpu.ops.pallas import radix_sort

    keys = jnp.zeros(2_500_000, jnp.uint32)  # > the 2M-key ceiling
    with pytest.raises(ValueError, match="SMEM offset table"):
        radix_sort.radix_sort(keys, (), key_bits=8)
