"""Worker process for the 2-process multi-host smoke test.

Launched by ``tests/test_multihost.py`` as ``python _multihost_worker.py
<rank> <port> <outdir>``. Each process owns 2 virtual CPU devices; the two
processes coordinate over localhost, form a 4-device global mesh, and render
the same scene with host-local parameter shards. Rank 0 writes the image.
"""

import os
import sys


def main() -> None:
    rank, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from openglgaussiansplattingrenderer_tpu.parallel import multihost

    multihost.initialize(f"localhost:{port}", num_processes=2,
                         process_id=rank)
    assert multihost.process_count() == 2
    assert len(jax.devices()) == 4, jax.devices()

    import functools

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from openglgaussiansplattingrenderer_tpu.camera import Camera
    from openglgaussiansplattingrenderer_tpu.config import RenderConfig
    from openglgaussiansplattingrenderer_tpu.io import ply as ply_io
    from openglgaussiansplattingrenderer_tpu.parallel import fast_sharded
    from openglgaussiansplattingrenderer_tpu.render import camera_args

    cfg = RenderConfig(chunk=32, dup_capacity_factor=16.0)
    width = height = 64
    scene = ply_io.make_synthetic_scene(64, seed=11, extent=1.5)
    scene = {k: np.asarray(v) for k, v in scene.items() if k != "sh_rest"}
    # each host loads only its own half of the (mesh-divisible) scene
    n = scene["means"].shape[0]
    lo, hi = rank * n // 2, (rank + 1) * n // 2
    local = {k: v[lo:hi] for k, v in scene.items()}

    mesh = multihost.global_mesh()
    params = multihost.host_local_params(local, mesh)
    cam = Camera(0.0, 0.0, -4.0, width=width, height=height)
    args = camera_args(cam)

    def f(params, view, vp, fx, fy, tfx, tfy):
        img, stats = fast_sharded.render_fast_sharded(
            params, view, vp, fx, fy, tfx, tfy, width, height, cfg, mesh)
        return img, stats["overflow"]

    fj = jax.jit(f, out_shardings=(NamedSharding(mesh, P()),
                                   NamedSharding(mesh, P())))
    img, overflow = fj(
        params, jnp.asarray(args["view"]), jnp.asarray(args["vp"]),
        jnp.float32(args["focal_x"]), jnp.float32(args["focal_y"]),
        jnp.float32(args["tan_fovx"]), jnp.float32(args["tan_fovy"]))
    img = np.asarray(img)
    assert np.all(np.isfinite(img))

    # ---- one 2-D (view x splat) TRAIN step across the process boundary --
    # view rows = processes, splat shards = each process's local devices;
    # the record-exchange all-to-all stays inside a process row, the
    # view-axis grad psum crosses hosts. The test compares this loss to a
    # single-process 2x2 mesh2d step on the same data.
    from jax.sharding import Mesh

    from openglgaussiansplattingrenderer_tpu.parallel import mesh2d
    from openglgaussiansplattingrenderer_tpu.train.trainer import (
        TrainConfig,
        raw_from_params,
    )

    m2 = Mesh(np.array(jax.devices()).reshape(2, 2),
              (mesh2d.VIEW_AXIS, mesh2d.SPLAT_AXIS))
    full = {k: np.asarray(v) for k, v in scene.items()}
    raw_np = {k: np.asarray(v) for k, v in raw_from_params(full).items()}

    def put(x, spec):
        sh = NamedSharding(m2, spec)
        return jax.make_array_from_process_local_data(sh, np.asarray(x),
                                                      np.shape(x))

    raw2 = {k: put(v, P(mesh2d.SPLAT_AXIS)) for k, v in raw_np.items()}
    tc = TrainConfig(lambda_dssim=0.0)
    step2 = mesh2d.make_2d_train_step(cfg, tc, width, height, m2, batch=2,
                                      param_keys=tuple(sorted(raw2.keys())))
    opt2 = step2.init(raw2)
    rng = np.random.default_rng(5)
    tgt_np = np.stack([
        mesh2d.tile_target(rng.uniform(0, 1, (height, width, 3))
                           .astype(np.float32), width, height, cfg)[0]
        for _ in range(2)])
    cam2 = Camera(0.3, 0.1, -4.2, width=width, height=height)
    a2 = camera_args(cam2)
    vvp = [(args, a2)[j] for j in range(2)]
    tgt = put(tgt_np, P(mesh2d.VIEW_AXIS))
    view2 = put(np.stack([np.asarray(b["view"], np.float32) for b in vvp]),
                P(mesh2d.VIEW_AXIS))
    vp2 = put(np.stack([np.asarray(b["vp"], np.float32) for b in vvp]),
              P(mesh2d.VIEW_AXIS))
    sc2 = [put(np.stack([np.float32(b[k]) for b in vvp]),
               P(mesh2d.VIEW_AXIS))
           for k in ("focal_x", "focal_y", "tan_fovx", "tan_fovy")]
    raw2, opt2, loss2, psnr2, over2 = step2(raw2, opt2, tgt, view2, vp2,
                                            *sc2)
    loss2 = float(np.asarray(loss2))
    assert np.isfinite(loss2) and int(np.asarray(over2)) == 0

    if rank == 0:
        np.save(os.path.join(outdir, "mh_img.npy"), img)
        np.save(os.path.join(outdir, "mh_loss2d.npy"),
                np.asarray(loss2, np.float64))
        with open(os.path.join(outdir, f"ok{rank}"), "w") as fh:
            fh.write(f"overflow={int(overflow)}\n")
    else:
        with open(os.path.join(outdir, f"ok{rank}"), "w") as fh:
            fh.write("ok\n")
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
