"""2-D mesh training: views x splats, both parallel axes composed.

``parallel/fast_sharded.py`` scales ONE frame across chips (splat-sharded
preprocess/expand, ragged all-to-all by tile owner, per-chip composite).
``parallel/data_parallel.py`` scales a BATCH of views (replicated params,
one pmean). Production 3DGS training at pod scale needs both at once:
splat counts that exceed one chip's HBM *and* multi-view batches. This
module runs the splat-sharded render under a 2-D
``Mesh(("view", "splat"))``:

- splat parameters are sharded over the ``splat`` axis and replicated over
  the ``view`` axis; each view-row of ``ds`` chips renders its own views
  with the unmodified ``_fast_shard_fn`` body (its collectives name only
  the ``splat`` axis, so the all-to-all exchange and stat psums stay
  row-local ICI traffic),
- the loss is computed per owned tile (no chip ever assembles a full
  image): each chip scores its round-robin tile stripe against the
  matching stripe of the tiled target, one ``psum`` over BOTH axes yields
  the replicated batch loss,
- the backward pass needs no hand-written cross-row sync: ``raw`` enters
  ``shard_map`` replicated over ``view``, so its cotangents are psummed
  over the view axis by the shard_map transpose itself; the optimizer
  update then runs on ``P("splat")``-sharded grads.

The reference is strictly single-GPU (SURVEY.md section 2.4); this layer is
north-star scaling capability with no reference counterpart.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from openglgaussiansplattingrenderer_tpu.config import RenderConfig
from openglgaussiansplattingrenderer_tpu.ops.compositing import padded_dims
from openglgaussiansplattingrenderer_tpu.ops.pallas import records as rk
from openglgaussiansplattingrenderer_tpu.parallel.fast_sharded import (
    _fast_shard_fn,
    exchange_capacity,
)
from openglgaussiansplattingrenderer_tpu.parallel.sharded import shard_map
from openglgaussiansplattingrenderer_tpu.train.trainer import (
    TrainConfig,
    make_optimizer,
    params_from_raw,
)

VIEW_AXIS = "view"
SPLAT_AXIS = "splat"

__all__ = ["make_mesh2d", "tile_target", "shard_raw_2d",
           "make_2d_train_step", "fit_scene_2d", "VIEW_AXIS", "SPLAT_AXIS"]


def make_mesh2d(dv: int, ds: int) -> Mesh:
    """(dv x ds) mesh: axis 0 = view batch, axis 1 = splat shard."""
    devices = np.asarray(jax.devices()[: dv * ds]).reshape(dv, ds)
    return Mesh(devices, (VIEW_AXIS, SPLAT_AXIS))


def tile_target(target, width: int, height: int, cfg: RenderConfig
                ) -> Tuple[np.ndarray, np.ndarray]:
    """(H, W, 3) target -> ((T, P, 3) tiles, (T, P) valid-pixel mask).

    Tile order matches ``compositing.assemble_image``'s layout (tile
    t = ty * grid_x + tx); the mask zeroes the pad pixels the compositor
    renders but ``assemble_image`` crops.
    """
    wp, hp = padded_dims(width, height, cfg)
    gx, gy = cfg.grid_x, cfg.grid_y
    pw, ph = wp // gx, hp // gy
    t = np.zeros((hp, wp, 3), np.float32)
    t[:height, :width] = np.asarray(target, np.float32)
    m = np.zeros((hp, wp), np.float32)
    m[:height, :width] = 1.0
    tiles = t.reshape(gy, ph, gx, pw, 3).transpose(0, 2, 1, 3, 4)
    mask = m.reshape(gy, ph, gx, pw).transpose(0, 2, 1, 3)
    return (tiles.reshape(gy * gx, ph * pw, 3),
            mask.reshape(gy * gx, ph * pw))


def shard_raw_2d(raw, mesh: Mesh):
    """Place a raw-param pytree P(splat)-sharded, view-replicated."""
    sharding = NamedSharding(mesh, P(SPLAT_AXIS))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), raw)


def make_2d_train_step(cfg: RenderConfig, tc: TrainConfig, width: int,
                       height: int, mesh: Mesh, *, batch: Optional[int] = None,
                       param_keys=None, exch_factor: float = 2.0):
    """Jitted train step on the (view x splat) mesh.

    ``batch`` views per optimizer step (default: one per view-row; must be
    a multiple of ``dv`` -- each row renders ``batch // dv`` views
    sequentially). The loss is the batch-mean pixel MSE over the rgb
    channels (matching ``train_step_fast_sharded``; D-SSIM is a windowed
    cross-tile stencil and stays on the single-chip/dp paths).

    Step signature::

        step(raw, opt_state,
             tgt_tiles (B, T, P, 3), view (B, 4, 4), vp (B, 4, 4),
             fx, fy, tfx, tfy (B,))
        -> (raw, opt_state, loss, psnr, overflow)

    ``raw`` leaves must be splat-axis divisible by ``ds``
    (``pad_scene_for_mesh``) and placed with ``shard_raw_2d``; targets come
    from ``tile_target``. A nonzero ``overflow`` means records were dropped
    (exchange buckets or local capacity) -- see
    ``fast_sharded.warn_on_sharded_overflow``.
    """
    dv = mesh.shape[VIEW_AXIS]
    ds = mesh.shape[SPLAT_AXIS]
    batch = batch or dv
    if batch % dv:
        raise ValueError(f"batch {batch} not a multiple of view rows {dv}")
    local_bs = batch // dv
    if cfg.num_tiles % ds:
        raise ValueError(
            f"{cfg.num_tiles} tiles not divisible by {ds} splat shards")
    tpd = cfg.num_tiles // ds
    optimizer = (make_optimizer(tc) if param_keys is None
                 else make_optimizer(tc, keys=param_keys))
    _, mask_np = tile_target(np.zeros((height, width, 3), np.float32),
                             width, height, cfg)
    npix_valid = float(mask_np.sum())
    bg = np.asarray(cfg.background, np.float32)

    def loss_body(raw_local, tgt, view, vp, fx, fy, tfx, tfy, mask):
        # raw_local: (n/ds, ...) leaves; tgt: (local_bs, T, P, 3) this row's
        # views; mask: (T, P) replicated
        n_local = raw_local["means"].shape[0]
        cap_exch = exchange_capacity(cfg, n_local, ds, exch_factor)
        params_local = params_from_raw(raw_local)
        d = jax.lax.axis_index(SPLAT_AXIS)
        my_tiles = d + ds * jnp.arange(tpd, dtype=jnp.int32)
        m_own = jnp.take(mask, my_tiles, axis=0)            # (tpd, P)

        se = 0.0
        over = jnp.int32(0)
        for j in range(local_bs):
            tiled, ov, _, _ = _fast_shard_fn(
                params_local, view[j], vp[j], fx[j], fy[j], tfx[j], tfy[j],
                width=width, height=height, cfg=cfg, axis=SPLAT_AXIS,
                ndev=ds, tiles_per_dev=tpd, cap_exch=cap_exch)
            # per-owned-tile final rgb, exactly assemble_image's math
            rgb = (tiled[:, :, 0:3] / cfg.color_scale
                   + tiled[:, :, 3:4] * jnp.asarray(bg)[None, None, :])
            tgt_own = jnp.take(tgt[j], my_tiles, axis=0)    # (tpd, P, 3)
            se = se + jnp.sum(((rgb - tgt_own) ** 2) * m_own[..., None])
            over = over + ov[0]
        # one psum over BOTH axes -> replicated batch SSE / overflow
        sse = jax.lax.psum(se, (VIEW_AXIS, SPLAT_AXIS))
        over = jax.lax.psum(over, VIEW_AXIS)  # ov already splat-psummed
        loss = sse / (batch * npix_valid * 3.0)
        return loss, over

    smapped = shard_map(
        loss_body, mesh,
        in_specs=(P(SPLAT_AXIS), P(VIEW_AXIS), P(VIEW_AXIS), P(VIEW_AXIS),
                  P(VIEW_AXIS), P(VIEW_AXIS), P(VIEW_AXIS), P(VIEW_AXIS),
                  P()),
        out_specs=(P(), P()))

    mask_j = jnp.asarray(mask_np)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(raw, opt_state, tgt, view, vp, fx, fy, tfx, tfy):
        def loss_fn(raw):
            loss, over = smapped(raw, tgt, view, vp, fx, fy, tfx, tfy,
                                 mask_j)
            return loss, over
        (loss, over), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(raw)
        # raw enters shard_map replicated over the view axis, so grads are
        # SUMMED over view rows by the transpose; the loss already divides
        # by the full batch, making this the batch-mean gradient.
        updates, opt_state = optimizer.update(grads, opt_state, raw)
        raw = jax.tree_util.tree_map(lambda a, u: a + u, raw, updates)
        psnr = -10.0 * jnp.log10(jnp.maximum(loss, 1e-12))
        return raw, opt_state, loss, psnr, over

    step.init = lambda raw: jax.jit(optimizer.init)(raw)
    return step


def fit_scene_2d(params, targets, cameras, cfg: RenderConfig,
                 tc: Optional[TrainConfig] = None, *, mesh: Mesh,
                 batch: Optional[int] = None, width: Optional[int] = None,
                 height: Optional[int] = None, exch_factor: float = 2.0,
                 log_every: int = 50, verbose: bool = True):
    """``trainer.fit_scene`` on the (view x splat) mesh.

    Splat parameters are padded to the splat-axis size and sharded; each
    optimizer step consumes ``batch`` views (default: one per view row),
    cycling through the view list. Returns (activated params, history)
    like ``fit_scene``; nonzero step overflow raises a warning through
    ``fast_sharded.warn_on_sharded_overflow``.
    """
    from openglgaussiansplattingrenderer_tpu.parallel.fast_sharded import (
        warn_on_sharded_overflow,
    )
    from openglgaussiansplattingrenderer_tpu.parallel.sharded import (
        pad_scene_for_mesh,
    )
    from openglgaussiansplattingrenderer_tpu.train.trainer import (
        camera_bundles,
        camera_dims,
        raw_from_params,
    )

    tc = tc or TrainConfig()
    dv = mesh.shape[VIEW_AXIS]
    ds = mesh.shape[SPLAT_AXIS]
    batch = batch or dv
    width = width or camera_dims(cameras[0])[0]
    height = height or camera_dims(cameras[0])[1]

    n_orig = params["means"].shape[0]
    params = pad_scene_for_mesh(
        {k: jnp.asarray(v) for k, v in params.items()}, ds)
    raw = shard_raw_2d(raw_from_params(params), mesh)
    step = make_2d_train_step(cfg, tc, width, height, mesh, batch=batch,
                              param_keys=tuple(sorted(raw.keys())),
                              exch_factor=exch_factor)
    opt_state = step.init(raw)
    bundles = camera_bundles(cameras)
    tgt_tiles = [jnp.asarray(tile_target(t, width, height, cfg)[0])
                 for t in targets]

    history = []
    nv = len(targets)
    for i in range(tc.steps):
        sel = [(i * batch + j) % nv for j in range(batch)]
        tgt = jnp.stack([tgt_tiles[s] for s in sel])
        bsel = [bundles[s] for s in sel]
        view = jnp.stack([b[0] for b in bsel])
        vp = jnp.stack([b[1] for b in bsel])
        sc = [jnp.stack([jnp.asarray(b[j], jnp.float32) for b in bsel])
              for j in (2, 3, 4, 5)]
        raw, opt_state, loss, p, over = step(raw, opt_state, tgt, view, vp,
                                             *sc)
        if i % log_every == 0 or i == tc.steps - 1:
            m = {"loss": float(loss), "psnr": float(p),
                 "overflow": int(over)}
            warn_on_sharded_overflow({"overflow": m["overflow"]},
                                     exch_factor, ds)
            history.append({"step": i, **m})
            if verbose:
                print(f"step {i}: loss {m['loss']:.5f} "
                      f"psnr {m['psnr']:.2f} (batch {batch}, "
                      f"mesh {dv}x{ds})")
    fitted = params_from_raw(raw)
    # strip the splat-axis padding (degenerate far-away splats) added above
    return {k: v[:n_orig] for k, v in fitted.items()}, history
