"""Pallas fused compositor vs the jnp compositor (interpret mode on CPU).

Forward images and full parameter gradients must match; the jnp path's
autodiff is the gradient oracle for the Pallas kernels' analytic backward.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openglgaussiansplattingrenderer_tpu.camera import Camera
from openglgaussiansplattingrenderer_tpu.config import RenderConfig
from openglgaussiansplattingrenderer_tpu.io import ply as ply_io
from openglgaussiansplattingrenderer_tpu.render import camera_args, render_arrays

BASE = RenderConfig(max_per_tile=1024, chunk=64, dup_capacity_factor=24.0)


def _run(scene, cam, cfg, width, height, grad=False, target=None):
    args = camera_args(cam)
    params = {k: jnp.asarray(v) for k, v in scene.items() if k != "sh_rest"}

    def fwd(p):
        img, stats = render_arrays(
            p, jnp.asarray(args["view"]), jnp.asarray(args["vp"]),
            args["focal_x"], args["focal_y"], args["tan_fovx"], args["tan_fovy"],
            width, height, cfg,
        )
        return img, stats

    if not grad:
        img, stats = fwd(params)
        return np.asarray(img), stats

    def loss(p):
        img, _ = fwd(p)
        return jnp.mean((img[..., :3] - target) ** 2) + 0.1 * jnp.mean(img[..., 3])

    val, grads = jax.value_and_grad(loss)(params)
    return float(val), {k: np.asarray(v) for k, v in grads.items()}


@pytest.mark.parametrize("seed,n,w,h", [(3, 150, 128, 128), (9, 400, 128, 64)])
def test_pallas_forward_matches_jnp(seed, n, w, h):
    scene = ply_io.make_synthetic_scene(n, seed=seed, extent=2.0)
    cam = Camera(0.0, 0.0, -6.0, width=w, height=h)
    cfg_j = dataclasses.replace(BASE, use_pallas=False)
    cfg_p = dataclasses.replace(BASE, use_pallas=True)
    img_j, stats_j = _run(scene, cam, cfg_j, w, h)
    img_p, stats_p = _run(scene, cam, cfg_p, w, h)
    assert int(stats_j["overflow"]) == 0 and int(stats_j["dropped_by_cap"]) == 0
    np.testing.assert_allclose(img_p, img_j, atol=2e-5)


def test_pallas_forward_single_splat():
    scene = ply_io.single_splat_scene()
    cam = Camera(0.0, 0.0, -3.0, width=256, height=256)
    cfg_j = RenderConfig(use_pallas=False, max_per_tile=256, chunk=64,
                         dup_capacity_factor=256.0)
    cfg_p = dataclasses.replace(cfg_j, use_pallas=True)
    img_j, _ = _run(scene, cam, cfg_j, 256, 256)
    img_p, _ = _run(scene, cam, cfg_p, 256, 256)
    assert img_p[..., 3].max() > 0.5
    np.testing.assert_allclose(img_p, img_j, atol=2e-5)


def test_pallas_backward_matches_jnp_autodiff():
    w = h = 64
    scene = ply_io.make_synthetic_scene(60, seed=21, extent=1.5)
    scene["opacities"] = np.clip(scene["opacities"], 0.2, 0.8)
    cam = Camera(0.0, 0.0, -5.0, width=w, height=h)
    target = jnp.full((h, w, 3), 0.2)
    cfg_j = dataclasses.replace(BASE, use_pallas=False)
    cfg_p = dataclasses.replace(BASE, use_pallas=True)
    loss_j, g_j = _run(scene, cam, cfg_j, w, h, grad=True, target=target)
    loss_p, g_p = _run(scene, cam, cfg_p, w, h, grad=True, target=target)
    assert np.isclose(loss_p, loss_j, rtol=1e-5)
    for k in g_j:
        np.testing.assert_allclose(
            g_p[k], g_j[k], rtol=2e-3, atol=1e-6,
            err_msg=f"gradient mismatch for {k}")


def test_pallas_backward_saturated_scene():
    """Heavy overdraw: the early-exit path and saturation masks in backward."""
    w = h = 32
    scene = ply_io.make_synthetic_scene(120, seed=4, extent=0.4)
    scene["opacities"] = np.full(120, 0.95, np.float32)  # saturate fast
    scene["scales"] = np.full((120, 3), 0.15, np.float32)
    cam = Camera(0.0, 0.0, -2.0, width=w, height=h)
    target = jnp.zeros((h, w, 3))
    # Big-splat overdraw: ~64 tiles/splat. Capacity must cover the expansion:
    # under overflow the two paths drop different records by design (array
    # order vs depth order; see ops/fastpath.py docstring).
    cfg_j = dataclasses.replace(BASE, use_pallas=False, max_per_tile=2048,
                                dup_capacity_factor=80.0)
    cfg_p = dataclasses.replace(BASE, use_pallas=True, dup_capacity_factor=80.0)
    img_p, stats_p = _run(scene, cam, cfg_p, w, h)
    assert int(stats_p["overflow"]) == 0
    loss_j, g_j = _run(scene, cam, cfg_j, w, h, grad=True, target=target)
    loss_p, g_p = _run(scene, cam, cfg_p, w, h, grad=True, target=target)
    assert np.isclose(loss_p, loss_j, rtol=1e-4)
    for k in g_j:
        np.testing.assert_allclose(
            g_p[k], g_j[k], rtol=5e-3, atol=2e-6,
            err_msg=f"gradient mismatch for {k}")


@pytest.mark.slow
@pytest.mark.parametrize("form,fwd_rows,bwd_rows,subc,gate", [
    ("sos", 8, 8, 1, True),
    ("direct", 8, None, 1, True),
    ("sos", None, 8, 1, True),
    ("sep", 8, 8, 1, True),
    ("sep", None, None, 1, True),
    ("direct", None, None, 4, True),
    ("sep", 8, 8, 4, True),
    ("sos", None, None, 2, True),
    ("sep", 8, 8, 4, False),
    ("direct", None, None, 8, False),
])
def test_pallas_knob_matrix_matches_jnp(monkeypatch, form, fwd_rows,
                                        bwd_rows, subc, gate):
    """The sweepable kernel knobs (POWER_FORM, FWD/BWD_EXIT_ROWS,
    SUB_CHUNKS, SUB_GATE) must all reproduce the oracle's forward AND
    backward regardless of which combination the hardware sweep eventually
    picks as default."""
    from openglgaussiansplattingrenderer_tpu.ops.pallas import composite as pc

    monkeypatch.setattr(pc, "POWER_FORM", form)
    monkeypatch.setattr(pc, "FWD_EXIT_ROWS", fwd_rows)
    monkeypatch.setattr(pc, "BWD_EXIT_ROWS", bwd_rows)
    monkeypatch.setattr(pc, "SUB_CHUNKS", subc)
    monkeypatch.setattr(pc, "SUB_GATE", gate)
    pc._make_composite_op.cache_clear()

    w = h = 64
    scene = ply_io.make_synthetic_scene(80, seed=33, extent=1.5)
    scene["opacities"] = np.clip(scene["opacities"], 0.2, 0.9)
    cam = Camera(0.0, 0.0, -5.0, width=w, height=h)
    target = jnp.full((h, w, 3), 0.3)
    cfg_j = dataclasses.replace(BASE, use_pallas=False)
    cfg_p = dataclasses.replace(BASE, use_pallas=True)
    img_j, _ = _run(scene, cam, cfg_j, w, h)
    img_p, _ = _run(scene, cam, cfg_p, w, h)
    np.testing.assert_allclose(img_p, img_j, atol=5e-5)
    loss_j, g_j = _run(scene, cam, cfg_j, w, h, grad=True, target=target)
    loss_p, g_p = _run(scene, cam, cfg_p, w, h, grad=True, target=target)
    assert np.isclose(loss_p, loss_j, rtol=1e-5)
    for k in g_j:
        scale = np.abs(g_j[k]).max() + 1e-12
        assert np.abs(g_p[k] - g_j[k]).max() / scale < 5e-3, k
    pc._make_composite_op.cache_clear()


def test_sep_power_form_bit_identical_to_sos(monkeypatch):
    """"sep" only amortizes subexpressions constant along a pixel axis;
    in exact arithmetic the operation order is unchanged, so in interpret
    mode (how this suite runs) images and gradients must equal the "sos"
    form EXACTLY. On hardware, FMA contraction may differ at the ulp level
    between the two expression shapes -- covered there by the knob-matrix
    oracle tolerances, not by this exact-equality check."""
    from openglgaussiansplattingrenderer_tpu.ops.pallas import composite as pc

    w = h = 64
    scene = ply_io.make_synthetic_scene(80, seed=33, extent=1.5)
    scene["opacities"] = np.clip(scene["opacities"], 0.2, 0.9)
    cam = Camera(0.0, 0.0, -5.0, width=w, height=h)
    target = jnp.full((h, w, 3), 0.3)
    cfg_p = dataclasses.replace(BASE, use_pallas=True)

    outs = {}
    for form in ("sos", "sep"):
        monkeypatch.setattr(pc, "POWER_FORM", form)
        pc._make_composite_op.cache_clear()
        img, _ = _run(scene, cam, cfg_p, w, h)
        loss, g = _run(scene, cam, cfg_p, w, h, grad=True, target=target)
        outs[form] = (np.asarray(img), float(loss),
                      {k: np.asarray(v) for k, v in g.items()})
    pc._make_composite_op.cache_clear()

    np.testing.assert_array_equal(outs["sep"][0], outs["sos"][0])
    assert outs["sep"][1] == outs["sos"][1]
    for k in outs["sos"][2]:
        np.testing.assert_array_equal(outs["sep"][2][k], outs["sos"][2][k],
                                      err_msg=k)


def test_no_hoist_depth_sort_matches_hoisted():
    """cfg.hoist_depth_sort=False (single lexicographic (tile, depth) record
    sort, no N-sized depth pre-sort) must reproduce the round-2 two-sort
    design exactly -- image AND gradients -- under zero overflow. Exactness
    holds because stable sorts resolve (tile, depth) ties to original splat
    order in both designs."""
    w = h = 96
    scene = ply_io.make_clustered_scene(500, seed=21, extent=2.0)
    cam = Camera(0.0, 0.0, -6.0, width=w, height=h)
    target = np.zeros((h, w, 3), np.float32)

    cfg_h = dataclasses.replace(BASE, use_pallas=True, hoist_depth_sort=True)
    cfg_n = dataclasses.replace(BASE, use_pallas=True, hoist_depth_sort=False)
    img_h, stats_h = _run(scene, cam, cfg_h, w, h)
    img_n, stats_n = _run(scene, cam, cfg_n, w, h)
    assert int(stats_h["overflow"]) == 0
    assert int(stats_n["num_records"]) == int(stats_h["num_records"])
    np.testing.assert_array_equal(img_n, img_h)

    loss_h, g_h = _run(scene, cam, cfg_h, w, h, grad=True, target=target)
    loss_n, g_n = _run(scene, cam, cfg_n, w, h, grad=True, target=target)
    assert np.isclose(loss_n, loss_h, rtol=1e-6)
    for k in g_h:
        np.testing.assert_allclose(g_n[k], g_h[k], rtol=1e-6, atol=1e-9,
                                   err_msg=f"gradient mismatch for {k}")


def test_packed_depth_key_matches_pair_mode():
    """depth_key="packed" (single u32 tile<<22|qdepth key) must reproduce
    the exact "pair" mode wherever same-tile depths don't collide within a
    2^-22 bucket -- which a random continuous scene never does."""
    w = h = 96
    scene = ply_io.make_clustered_scene(600, seed=13, extent=2.0)
    cam = Camera(0.0, 0.0, -6.0, width=w, height=h)
    cfg_pair = dataclasses.replace(BASE, use_pallas=True,
                                   hoist_depth_sort=False, depth_key="pair")
    cfg_pack = dataclasses.replace(cfg_pair, depth_key="packed")
    img_a, stats_a = _run(scene, cam, cfg_pair, w, h)
    img_b, stats_b = _run(scene, cam, cfg_pack, w, h)
    assert int(stats_a["overflow"]) == 0
    assert int(stats_b["binned_records"]) == int(stats_a["binned_records"])
    np.testing.assert_array_equal(img_b, img_a)

    # gradients ride the same sorted layout: also identical
    target = np.zeros((h, w, 3), np.float32)
    loss_a, g_a = _run(scene, cam, cfg_pair, w, h, grad=True, target=target)
    loss_b, g_b = _run(scene, cam, cfg_pack, w, h, grad=True, target=target)
    assert np.isclose(loss_b, loss_a, rtol=1e-6)
    for k in g_a:
        np.testing.assert_allclose(g_b[k], g_a[k], rtol=1e-6, atol=1e-9)
