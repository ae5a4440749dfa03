"""Config-5 (5.2M-tri icosphere) performance experiments on the real chip.

Round-3 state: 218.9 ms/frame, 13.0 G pairs scheduled, 59.4 Gpairs/s
(0.71 of the all-VPU SOL) — the frame is kernel-bound on SCHEDULED pairs,
so the wins are (a) scheduling fewer pairs (tighter ray tiles -> tighter
interval hulls) and (b) shaving the non-kernel remainder (cull mask +
argsort + compaction). This script measures both:

  1. per-stage breakdown of the sync pipeline (cull vs kernel vs shade)
  2. A/B over ray-tile size/shape, early-exit cadence, and kernel family

Usage:  python -u tools/config5_ab.py [variant ...]
  variants: base rt256 rt256sq rt128 exit16 exit8 mxu   (default: all)
Run on the TPU; results print as one line per variant.
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402


def main(argv) -> int:
    import jax

    from distributed_raytracer_tpu.utils.jaxtools import (
        enable_compilation_cache)
    enable_compilation_cache()

    from distributed_raytracer_tpu.ops.render_bvh import CulledRenderer
    from distributed_raytracer_tpu.runtime import animation
    from tools.bake_cache import load_icosphere9

    got = load_icosphere9(build_if_missing=False)
    if got is None:
        print("no icosphere9 bake cache; run tools/bake_cache.py first")
        return 1
    arrays5, tree5, cam5 = got
    w, h = 640, 480

    def bench(r, n=6, label=""):
        t_setup = time.monotonic()
        r.render(cam5, block=True)
        r.freeze(cam5)
        poses = animation.orbit_camera_path(cam5, 3, radius=3.0,
                                            revolutions=0.01)
        cams = [jax.device_put(p.to_arrays()) for p in poses]
        jax.block_until_ready(cams)
        out = r.render_fast(cams[0])
        jax.block_until_ready(out)
        setup_s = time.monotonic() - t_setup
        t0 = time.perf_counter()
        for k in range(n):
            out = r.render_fast(cams[k % len(cams)])
        jax.block_until_ready(out)
        s = (time.perf_counter() - t0) / n
        lc = r._last_counts
        # Fine-level cells only: lc layout is [per-level primary counts
        # (n_levels), hit-tile count, per-level shadow counts]. At config-5
        # scale the renderer auto-selects cull_levels=3, so lc[1] is the
        # MID level, not the finest — index by n_levels as
        # bench._culled_extras and profiling.measure_culled do.
        pairs = (lc[r.n_levels - 1] + lc[-1]) * r.rt * r.tb
        print(f"{label}: frame {s * 1e3:.1f} ms | counts {lc} | "
              f"pairs {pairs / 1e9:.2f} G | {pairs / s / 1e9:.1f} Gpairs/s | "
              f"exit_every={r.exit_every} | setup {setup_s:.0f}s",
              flush=True)
        return s

    def breakdown(r):
        """Time the sync stages separately (indicative split)."""
        cam = cam5.to_arrays()
        out = r._stage_a(cam, r._perm, r.block_lo, r.block_hi, None)
        jax.block_until_ready(out)

        def t(f, n=4):
            o = f()
            jax.block_until_ready(o)
            t0 = time.perf_counter()
            for _ in range(n):
                o = f()
            jax.block_until_ready(o)
            return (time.perf_counter() - t0) / n, o

        sa, (rays, ti, mask1, entry1, c1) = t(
            lambda: r._stage_a(cam, r._perm, r.block_lo, r.block_hi, None))
        p_pads, p_counts = r._size_pads(ti, mask1, entry1, c1,
                                        r.block_lo, r.block_hi)
        cf, _ = t(lambda: r._count_next(p_pads[:-1])(
            r.block_lo, r.block_hi, ti, mask1, entry1, c1))
        sb1 = r._stage_b_cache[(p_pads, r.exit_every)]
        tb1, (hits, hcount, _) = t(lambda: sb1(
            r.arrays, r.tris_packed, r.tris_dirs, r.block_lo, r.block_hi,
            rays, ti, mask1, entry1, c1))
        print(f"  stage A (raygen+top mask)    {sa * 1e3:6.1f} ms  "
              f"(counts {p_counts})")
        print(f"  count (finest sizing pass)   {cf * 1e3:6.1f} ms")
        print(f"  stage B1 (descent + nearest) {tb1 * 1e3:6.1f} ms",
              flush=True)

    variants = argv[1:] or ["base", "rt256sq", "exit16", "mxu"]
    for v in variants:
        kw = dict(prebaked=(arrays5, tree5))
        if v == "base":
            pass
        elif v == "rt256":
            kw.update(ray_tile=256)                 # 32 x 8
        elif v == "rt256sq":
            kw.update(ray_tile=256, tile_w=16)      # 16 x 16
        elif v == "rt128":
            kw.update(ray_tile=128, tile_w=16)      # 16 x 8
        elif v == "exit16":
            kw.update(exit_every=16)
        elif v == "exit8":
            kw.update(exit_every=8)
        elif v == "mxu":
            kw.update(use_mxu=True)
        else:
            print(f"unknown variant {v}")
            continue
        r = CulledRenderer(None, w, h, **kw)
        bench(r, label=v)
        if v == "base":
            breakdown(r)
        del r
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
