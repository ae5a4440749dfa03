"""Per-config performance A/B on the real chip (configs 1, 3, 4).

Generalizes tools/config5_ab.py: the round-4 verdict asked for the
config-5 work-reduction recipe (squarer ray tiles, block-size and
cull-depth A/B) to be measured and adopted on the other block-sparse
configs. Variants are construction parameters (no traced-code edits, so
the persistent compile cache stays valid across runs).

Usage:  python -u tools/config_ab.py CONFIG [variant ...]
  CONFIG: 1 (example 640x480), 3 (62K tris 640x480), 4 (139K tris 4K)
  variants: base bs64 rt256sq rt256sq_bs64 rt256 cl3 exit16
            (default: base bs64 rt256sq rt256sq_bs64)
Prints one line per variant: frame ms, scheduled pairs, Gpairs/s, SOL.
For config 1 the batched (render_many) per-frame time is also reported —
the headline path since round 4.
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402

VARIANTS = {
    "base": {},
    "bs64": dict(block_size=64),
    "rt256": dict(ray_tile=256),
    "rt256sq": dict(ray_tile=256, tile_w=16),
    "rt256sq_bs64": dict(ray_tile=256, tile_w=16, block_size=64),
    "cl3": dict(cull_levels=3),
    "rt256sq_cl3": dict(ray_tile=256, tile_w=16, cull_levels=3),
    "exit16": dict(exit_every=16),
    "rt1024": dict(ray_tile=1024),
    "rt1024_bs64": dict(ray_tile=1024, block_size=64),
    "bs64_cl3": dict(block_size=64, cull_levels=3),
}


def build_scene(config: str):
    from distributed_raytracer_tpu.utils import scenes as S
    from __graft_entry__ import _example_scene

    if config == "1":
        return _example_scene(), 640, 480, dict(radius=6.0)
    if config == "3":
        return (S.instanced_grid(_example_scene(), 8), 640, 480,
                dict(radius=20.0))
    if config == "4":
        return (S.instanced_grid(_example_scene(), 12), 3840, 2160,
                dict(radius=30.0))
    raise SystemExit(f"unknown config {config}")


def main(argv) -> int:
    import jax

    from distributed_raytracer_tpu.utils.jaxtools import (
        enable_compilation_cache)
    enable_compilation_cache()

    from distributed_raytracer_tpu.ops.render_bvh import CulledRenderer
    from distributed_raytracer_tpu.runtime import animation
    from distributed_raytracer_tpu.utils import profiling

    config = argv[1]
    names = argv[2:] or ["base", "bs64", "rt256sq", "rt256sq_bs64"]
    scene, w, h, orbit = build_scene(config)
    n_bench = 4 if config == "4" else 10

    poses = animation.orbit_camera_path(scene.camera, 4,
                                        revolutions=0.02, **orbit)
    for v in names:
        kw = VARIANTS[v]
        t_setup = time.monotonic()
        r = CulledRenderer(scene, w, h, **kw)
        r.render(scene.camera, block=True)
        r.freeze(scene.camera)
        cams = [jax.device_put(p.to_arrays()) for p in poses]
        jax.block_until_ready(cams)
        out = r.render_fast(cams[0])
        jax.block_until_ready(out)
        setup_s = time.monotonic() - t_setup
        t0 = time.perf_counter()
        for k in range(n_bench):
            out = r.render_fast(cams[k % len(cams)])
        jax.block_until_ready(out)
        s = (time.perf_counter() - t0) / n_bench
        lc = r._last_counts
        work = profiling.FrameWork(
            primary_cells=int(lc[r.n_levels - 1]), shadow_cells=int(lc[-1]),
            rays=w * h, ray_tile=r.rt, tri_block=r.tb, seconds=s)
        line = (f"config{config} {v}: frame {s * 1e3:.2f} ms | "
                f"pairs {work.pairs / 1e9:.2f} G | "
                f"{work.gpairs_per_sec:.1f} Gpairs/s | "
                f"SOL {work.sol_fraction:.3f} | exit={r.exit_every} | "
                f"levels={r.n_levels} | setup {setup_s:.0f}s")
        if config == "1":
            # Batched path (the headline): one dispatch over the batch.
            imgs, counts = r.render_many(cams)
            jax.block_until_ready(imgs)
            reps, t0 = 3, time.perf_counter()
            for _ in range(reps):
                imgs, counts = r.render_many(cams)
            jax.block_until_ready(imgs)
            bs = (time.perf_counter() - t0) / (reps * len(cams))
            cnp = np.asarray(counts)
            bwork = profiling.FrameWork(
                primary_cells=float(cnp[:, r.n_levels - 1].mean()),
                shadow_cells=float(cnp[:, -1].mean()),
                rays=w * h, ray_tile=r.rt, tri_block=r.tb, seconds=bs)
            line += (f" | batched {bs * 1e3:.2f} ms "
                     f"SOL {bwork.sol_fraction:.3f}")
        print(line, flush=True)
        del r
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
