"""Benchmark harness: renders BASELINE.json configs and reports Mrays/s.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline metric: primary Mrays/s per chip on config 1 (example scene,
640x480, primary + shadow rays, one chip), using the faster of the dense
and block-sparse paths. Baseline: the reference's best published
throughput — 25.16 FPS at 320x240 (final_report.pdf §3.2) = 1.93 M primary
rays/s aggregate over 96 vCPUs (BASELINE.md "Derived").

Extra fields carry the other configs measured this round, in priority
order: config 5 (5.2M-tri icosphere — the block-partitioned north star)
runs FIRST after the headline so a tight budget can never silently drop
it; then config 3 (62K-tri instancing), config 2 (1080p multi-bounce),
config 4 (139K tris at 4K). Every config that does not run emits an
explicit `configN_skipped` marker — silent absence reads as "covered"
when it wasn't (round-1 verdict, "What's weak" #2). The camera orbits
between frames (the reference's measurement motion), so per-frame state
updates are exercised without recompilation.

Work accounting: each block-sparse config also reports scheduled
(ray, triangle) pair throughput and its fraction of the hardware-derived
speed-of-light (utils/profiling.py ROOFLINE docstring for the derivation).

Robustness: a cold persistent-compilation cache can cost minutes per
config on this TPU setup (compiles go through a serialized remote helper).
The harness therefore (a) computes the headline config first, (b) checks a
wall-clock budget (BENCH_BUDGET_S, default 420s) before starting each
extra config, and (c) on SIGTERM/SIGINT prints whatever it has measured so
far before dying — the driver always gets its JSON line.
"""

import json
import os
import signal
import sys
import time

import numpy as np

BASELINE_MRAYS = 1.93  # reference aggregate primary rays/s (96 vCPUs)
T0 = time.monotonic()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "420"))

_result = None          # best-so-far JSON dict, printed on early termination
_printed = False


def _emit(code=0):
    global _printed
    if not _printed:
        _printed = True
        print(json.dumps(_result if _result is not None else {
            "metric": "error", "value": 0, "unit": "none", "vs_baseline": 0,
            "error": "terminated before the headline config finished"}))
        sys.stdout.flush()
    os._exit(code)


def _on_term(signum, frame):
    _emit(0)


def _budget_left():
    return BUDGET_S - (time.monotonic() - T0)


def _bench_frames(render, cams, n_frames):
    import jax

    out = render(cams[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for k in range(n_frames):
        out = render(cams[k % len(cams)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_frames


def _culled_extras(extras, key, renderer, seconds, w, h):
    """Per-config work accounting: scheduled pairs and SOL fraction."""
    from distributed_raytracer_tpu.utils import profiling

    if renderer._last_counts is None:
        return
    _, count, _, scount = renderer._last_counts   # fine-level cells
    work = profiling.FrameWork(
        primary_cells=int(count), shadow_cells=int(scount),
        rays=w * h, ray_tile=renderer.rt, tri_block=renderer.tb,
        seconds=seconds)
    extras[f"{key}_gpairs_per_s"] = round(work.gpairs_per_sec, 2)
    extras[f"{key}_sol_fraction"] = round(work.sol_fraction, 3)
    extras[f"{key}_pairs_scheduled"] = int(work.pairs)


def main():
    global _result
    import jax

    from distributed_raytracer_tpu.utils.jaxtools import enable_compilation_cache
    enable_compilation_cache()

    from distributed_raytracer_tpu.ops.render import render_frame
    from distributed_raytracer_tpu.ops.render_bvh import CulledRenderer
    from distributed_raytracer_tpu.runtime import animation
    from distributed_raytracer_tpu.utils import scenes as S
    from __graft_entry__ import _example_scene

    width, height = 640, 480
    n_frames = 20
    scene = _example_scene()
    n_lights = int(scene.light_pos.shape[0])

    poses = animation.orbit_camera_path(scene.camera, 8, radius=6.0,
                                        revolutions=0.05)
    cams = [p.to_arrays() for p in poses]

    extras = {}

    # Config 1 — block-sparse path first (it is the production path and the
    # usual winner; if the budget dies early we still have a headline).
    culled = CulledRenderer(scene, width, height)
    culled.render(scene.camera, block=True)
    culled.freeze(scene.camera)
    culled_s = _bench_frames(lambda c: culled.render_fast(c), cams, n_frames)
    extras["frame_ms_culled"] = round(culled_s * 1e3, 2)
    _culled_extras(extras, "config1", culled, culled_s, width, height)

    def headline(best_s):
        mrays = width * height / best_s / 1e6
        return {
            "metric": "primary_mrays_per_sec_per_chip",
            "value": round(mrays, 3),
            "unit": "Mrays/s",
            "vs_baseline": round(mrays / BASELINE_MRAYS, 2),
            "fps": round(1.0 / best_s, 2),
            "resolution": f"{width}x{height}",
            "n_tris": int(scene.num_tris),
            "n_lights": n_lights,
            "total_rays_per_frame_incl_shadow": width * height * (1 + n_lights),
            "device": str(jax.devices()[0]),
            **extras,
        }

    best_s = culled_s
    _result = headline(best_s)

    # Config 1 — dense path (968 tris fits the brute-force sweep).
    if _budget_left() > 30:
        arrays = jax.device_put(scene.bake())
        dense_s = _bench_frames(
            lambda c: render_frame(arrays, c, width, height), cams, n_frames)
        extras["frame_ms_dense"] = round(dense_s * 1e3, 2)
        best_s = min(dense_s, culled_s)
    else:
        extras["config1_dense_skipped"] = "budget"
    _result = headline(best_s)

    # Config 5 — multi-million-triangle scene (5.24M-tri icosphere) through
    # the same block-sparse path, geometry device-resident. Runs FIRST among
    # the extras: it is the north-star config and was silently dropped in
    # round 1. (The block-partitioned multi-host schedules are
    # parallel/halo_bvh.py and parallel/ring_bvh.py, validated on the
    # virtual mesh — a single chip holds this scene whole.)
    # The bake itself takes minutes at 5.2M tris, so the baked bundle is
    # cached on disk (tools/bake_cache.py); without a cache the config is
    # honestly skipped rather than blowing the whole budget.
    if _budget_left() > 150:
        try:
            from tools.bake_cache import load_icosphere9

            prebaked_cam = load_icosphere9(build_if_missing=
                                           _budget_left() > 400)
            if prebaked_cam is None:
                extras["config5_skipped"] = ("no bake cache; run "
                                             "tools/bake_cache.py first")
            else:
                arrays5, tree5, cam5 = prebaked_cam
                r5 = CulledRenderer(None, width, height,
                                    prebaked=(arrays5, tree5))
                r5.render(cam5, block=True)
                r5.freeze(cam5)
                p5 = animation.orbit_camera_path(cam5, 3, radius=3.0,
                                                 revolutions=0.01)
                s5 = _bench_frames(lambda c: r5.render_fast(c),
                                   [p.to_arrays() for p in p5], 4)
                extras["config5_5.2m_frame_ms"] = round(s5 * 1e3, 2)
                extras["config5_5.2m_mrays"] = round(
                    width * height / s5 / 1e6, 3)
                _culled_extras(extras, "config5", r5, s5, width, height)
                del r5, arrays5
        except Exception as e:  # keep the headline metric alive
            extras["config5_error"] = repr(e)[:200]
    else:
        extras["config5_skipped"] = "budget"
    _result = headline(best_s)

    # Config 3 — 64x instanced Suzanne (~62K tris), block-sparse only.
    if _budget_left() > 60:
        try:
            big = S.instanced_grid(scene, 8)
            big_r = CulledRenderer(big, width, height)
            big_r.render(big.camera, block=True)
            big_r.freeze(big.camera)
            big_poses = animation.orbit_camera_path(big.camera, 4,
                                                    radius=20.0,
                                                    revolutions=0.02)
            big_s = _bench_frames(lambda c: big_r.render_fast(c),
                                  [p.to_arrays() for p in big_poses], 8)
            extras["config3_62k_frame_ms"] = round(big_s * 1e3, 2)
            extras["config3_62k_mrays"] = round(width * height / big_s / 1e6, 3)
            _culled_extras(extras, "config3", big_r, big_s, width, height)
            del big_r, big
        except Exception as e:
            extras["config3_error"] = repr(e)[:200]
    else:
        extras["config3_skipped"] = "budget"
    _result = headline(best_s)

    # Config 2 — example scene at 1920x1080 with multi-bounce specular
    # reflections (depth 2: primary + 2 reflection bounces).
    if _budget_left() > 60:
        try:
            w2, h2 = 1920, 1080
            r2 = CulledRenderer(scene, w2, h2)
            render2 = r2.freeze_bounced(scene.camera, depth=2)
            p2 = animation.orbit_camera_path(scene.camera, 4, radius=6.0,
                                             revolutions=0.02)
            s2 = _bench_frames(render2, [p.to_arrays() for p in p2], 8)
            extras["config2_1080p_bounce2_frame_ms"] = round(s2 * 1e3, 2)
            extras["config2_1080p_bounce2_mrays"] = round(
                w2 * h2 / s2 / 1e6, 3)
            del r2
        except Exception as e:
            extras["config2_error"] = repr(e)[:200]
    else:
        extras["config2_skipped"] = "budget"
    _result = headline(best_s)

    # Config 4 — bunny-class mesh (~139K tris: 144x instanced Suzanne) at 4K.
    # (Multi-chip tile partition = parallel/render_sharded_bvh; this chip
    # count is 1, so the single-chip number is the per-chip baseline.)
    if _budget_left() > 60:
        try:
            w4, h4 = 3840, 2160
            c4 = S.instanced_grid(scene, 12)
            r4 = CulledRenderer(c4, w4, h4)
            r4.render(c4.camera, block=True)
            r4.freeze(c4.camera)
            p4 = animation.orbit_camera_path(c4.camera, 3, radius=30.0,
                                             revolutions=0.015)
            s4 = _bench_frames(lambda c: r4.render_fast(c),
                               [p.to_arrays() for p in p4], 4)
            extras["config4_139k_4k_frame_ms"] = round(s4 * 1e3, 2)
            extras["config4_139k_4k_mrays"] = round(w4 * h4 / s4 / 1e6, 3)
            _culled_extras(extras, "config4", r4, s4, w4, h4)
            del r4, c4
        except Exception as e:
            extras["config4_error"] = repr(e)[:200]
    else:
        extras["config4_skipped"] = "budget"

    extras["bench_wall_s"] = round(time.monotonic() - T0, 1)
    _result = headline(best_s)


if __name__ == "__main__":
    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)
    try:
        main()
    except Exception as e:  # never leave the driver without a JSON line
        if _result is not None:
            _result["error"] = repr(e)[:200]
            _emit(0)
        print(json.dumps({"metric": "error", "value": 0, "unit": "none",
                          "vs_baseline": 0, "error": repr(e)}))
        sys.exit(1)
    _emit(0)
