"""Image losses for splat fitting (capability beyond the reference).

L1 + D-SSIM is the standard 3DGS training loss (Kerbl et al. sec. 5); the
reference renders only, so these exist to exercise and ship the gradient
path the north star demands.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax


def l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def l2(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim_map(pred: jnp.ndarray, target: jnp.ndarray, c1: float = 0.01 ** 2,
             c2: float = 0.03 ** 2) -> jnp.ndarray:
    """Per-window SSIM map over (..., H, W, C) images: VALID 11x11 Gaussian
    windows -> (..., H-10, W-10, C). ``ssim`` is this map's mean; the
    sharded training paths (parallel/mesh2d.py) evaluate the map on
    halo-padded tiles and mean the masked windows themselves, so both paths
    share one windowed-statistics implementation."""
    win = _gaussian_window()[:, :, None, None]                 # (11,11,1,1)

    def filt(x):
        # depthwise conv: batch everything onto N of an NHWC conv
        x4 = x.reshape((-1,) + x.shape[-3:])                   # (B,H,W,C)
        c = x4.shape[-1]
        w = jnp.tile(win, (1, 1, 1, c))                        # (11,11,1,C)
        y = jax.lax.conv_general_dilated(
            x4, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c, precision="highest")
        return y.reshape(x.shape[:-3] + y.shape[-3:])

    mu_p, mu_t = filt(pred), filt(target)
    mu_pp, mu_tt, mu_pt = mu_p * mu_p, mu_t * mu_t, mu_p * mu_t
    sig_p = filt(pred * pred) - mu_pp
    sig_t = filt(target * target) - mu_tt
    sig_pt = filt(pred * target) - mu_pt
    return ((2 * mu_pt + c1) * (2 * sig_pt + c2)) / (
        (mu_pp + mu_tt + c1) * (sig_p + sig_t + c2))


def ssim(pred: jnp.ndarray, target: jnp.ndarray, c1: float = 0.01 ** 2,
         c2: float = 0.03 ** 2) -> jnp.ndarray:
    """SSIM over (H, W, C) images in [0, 1], 11x11 Gaussian window."""
    return jnp.mean(ssim_map(pred, target, c1, c2))


def dssim(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return (1.0 - ssim(pred, target)) / 2.0


def gs_loss(pred: jnp.ndarray, target: jnp.ndarray,
            lambda_dssim: float = 0.2) -> jnp.ndarray:
    """(1 - lambda)*L1 + lambda*D-SSIM, the 3DGS paper's training loss."""
    return (1.0 - lambda_dssim) * l1(pred, target) + lambda_dssim * dssim(pred, target)


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((pred - target) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
