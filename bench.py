"""Benchmark harness: renders the example scene and reports Mrays/s.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline: the reference's best published throughput — 25.16 FPS at 320x240
(final_report.pdf §3.2) = 1.93 M primary rays/s aggregate over 96 vCPUs
(BASELINE.md "Derived"). vs_baseline is our primary-ray throughput on ONE
chip divided by that aggregate number.

Config 1 of BASELINE.json: example scene (Suzanne, 968 tris), 640x480,
primary + shadow rays, single chip. The camera orbits the mesh between
frames (the reference's measurement motion), exercising real frame-to-frame
state updates without recompilation.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from distributed_raytracer_tpu.utils.jaxtools import enable_compilation_cache
    enable_compilation_cache()

    from distributed_raytracer_tpu.ops.render import render_frame
    from distributed_raytracer_tpu.runtime import animation
    from __graft_entry__ import _example_scene

    width, height = 640, 480
    n_frames = 30

    scene = _example_scene()
    arrays = jax.device_put(scene.bake())
    poses = animation.orbit_camera_path(scene.camera, n_frames, radius=6.0)
    cams = [p.to_arrays() for p in poses]

    # Warmup / compile.
    img = render_frame(arrays, cams[0], width, height)
    img.block_until_ready()

    t0 = time.perf_counter()
    for cam in cams:
        img = render_frame(arrays, cam, width, height)
    img.block_until_ready()
    elapsed = time.perf_counter() - t0

    n_lights = int(arrays.light_pos.shape[0])
    primary = width * height * n_frames
    mrays = primary / elapsed / 1e6
    frame_ms = elapsed / n_frames * 1e3

    baseline_mrays = 1.93  # reference aggregate primary rays/s (96 vCPU)
    result = {
        "metric": "primary_mrays_per_sec_per_chip",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / baseline_mrays, 2),
        "frame_ms": round(frame_ms, 3),
        "fps": round(1000.0 / frame_ms, 2),
        "resolution": f"{width}x{height}",
        "n_tris": int(arrays.num_tris),
        "n_lights": n_lights,
        "total_rays_per_frame_incl_shadow": width * height * (1 + n_lights),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # never leave the driver without a JSON line
        print(json.dumps({"metric": "error", "value": 0, "unit": "none",
                          "vs_baseline": 0, "error": repr(e)}))
        sys.exit(1)
