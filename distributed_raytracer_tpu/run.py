"""Command-line renderer: the analog of the reference's binaries.

The reference ships three binaries driven by positional argv
(master/main.go:189-215, worker/sequential/main.go:34-41,
worker/distributed/main.go:131-137). Here one CLI covers them:

  python -m distributed_raytracer_tpu SCENE.json WIDTH HEIGHT [options]

With no display available, the interactive SDL loop becomes a scripted
camera animation (default: orbit, the reference's benchmark motion); frames
can be written as PNGs, and the exit report reproduces the master's FPS
statistics (master/main.go:285-325) plus Mrays/s.

Modes map to the reference topology:
  sequential  - single-chip dense sweep (worker/sequential analog)
  culled      - single-chip block-BVH path (the production path)
  sharded     - SPMD over all local devices (master + workers analog)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="distributed_raytracer_tpu",
        description="TPU-native distributed raytracer",
    )
    p.add_argument("scene", help="JSON scene file (reference schema)")
    p.add_argument("width", type=int)
    p.add_argument("height", type=int)
    p.add_argument("--mode", choices=["sequential", "culled", "sharded"],
                   default="culled")
    p.add_argument("--frames", type=int, default=60,
                   help="animation frames to render")
    p.add_argument("--animation", choices=["orbit", "strafe", "none"],
                   default="orbit")
    p.add_argument("--radius", type=float, default=6.0,
                   help="orbit radius (distance to look-at point)")
    p.add_argument("--revolutions", type=float, default=1.0)
    p.add_argument("--out", default=None,
                   help="directory to write frame PNGs (omit to skip IO)")
    p.add_argument("--fps-target", type=int, default=30,
                   help="pace frames like the reference's 30 Hz loop; 0 = flat out")
    p.add_argument("--devices", type=int, default=None,
                   help="device count for --mode sharded")
    p.add_argument("--serve", metavar="HOST:PORT", default=None,
                   help="serve an interactive browser viewer instead of the "
                        "scripted animation (the SDL window analog)")
    return p


def main(argv=None) -> int:
    args = build_arg_parser().parse_args(argv)

    import jax

    from distributed_raytracer_tpu.utils.jaxtools import enable_compilation_cache
    enable_compilation_cache()

    from distributed_raytracer_tpu.models.scene import load_scene
    from distributed_raytracer_tpu.ops.render import render_frame
    from distributed_raytracer_tpu.ops.render_bvh import CulledRenderer
    from distributed_raytracer_tpu.parallel import render_sharded
    from distributed_raytracer_tpu.runtime import animation, framebuffer
    from distributed_raytracer_tpu.runtime.stats import FrameTimer

    scene = load_scene(args.scene)
    w, h = args.width, args.height

    if args.mode == "sequential":
        arrays = jax.device_put(scene.bake())
        render = lambda cam: render_frame(arrays, cam.to_arrays(), w, h)
        render_arrays = lambda c: render_frame(arrays, c, w, h)
    elif args.mode == "culled":
        culled = CulledRenderer(scene, w, h,
                                interpret=jax.default_backend() != "tpu")
        culled.render(scene.camera, block=True)
        culled.freeze(scene.camera)
        render = lambda cam: culled.render_fast(cam, verify=True)
        render_arrays = lambda c: culled.render_fast(c)
    else:
        arrays = jax.device_put(scene.bake())
        sharded = render_sharded.make_sharded_renderer(
            w, h, mesh=render_sharded.default_mesh(args.devices))
        render = lambda cam: sharded.device_fn(arrays, cam.to_arrays())
        render_arrays = lambda c: sharded.device_fn(arrays, c)

    if args.serve:
        from distributed_raytracer_tpu.runtime import viewer as viewer_mod

        host, _, port = args.serve.rpartition(":")
        cam, stats, dropped = viewer_mod.serve(
            None, scene.camera,
            lambda s, c: render_arrays(c), w, h,
            host=host or "127.0.0.1", port=int(port),
            on_ready=lambda v: print(f"viewer at {v.url}", flush=True))
        if stats is not None:
            print(stats.report())
        return 0

    if args.animation == "none":
        poses = [scene.camera] * args.frames
    elif args.animation == "strafe":
        poses = []
        cam = scene.camera
        for _ in range(args.frames):
            cam = cam.move(0.1, leftward=True)
            poses.append(cam)
    else:
        poses = animation.orbit_camera_path(scene.camera, args.frames,
                                            radius=args.radius,
                                            revolutions=args.revolutions)

    # Warm up compile outside the timed loop (the reference never counts
    # startup either — its first frame just runs slow).
    jax.block_until_ready(jax.tree.leaves(render(poses[0]))[0])

    if args.out:
        os.makedirs(args.out, exist_ok=True)

    timer = FrameTimer()
    ms_per_frame = 1000.0 / args.fps_target if args.fps_target else 0.0
    for k, cam in enumerate(poses):
        tick = time.monotonic()
        timer.frame_issued()
        img = render(cam)
        img_np = np.asarray(img)
        timer.frame_drawn()
        if args.out:
            framebuffer.write_png(os.path.join(args.out, f"frame_{k:05d}.png"),
                                  img_np[:h])
        if ms_per_frame:
            elapsed = (time.monotonic() - tick) * 1000.0
            if elapsed < ms_per_frame:
                time.sleep((ms_per_frame - elapsed) / 1000.0)

    stats = timer.stats()
    if stats is not None:
        print(stats.report())
        rays = w * h * (1 + scene.light_pos.shape[0])
        print(f"Throughput: {stats.mean_fps * w * h / 1e6:.2f} M primary rays/s "
              f"({stats.mean_fps * rays / 1e6:.2f} M total rays/s incl. shadows).")
    return 0


if __name__ == "__main__":
    sys.exit(main())
