"""On-TPU kernel smoke gate — run before every snapshot that touches kernels.

Round 2 shipped MXU kernels that passed every CPU/interpret test and then
crashed on real hardware for every scene above 968 triangles: interpret mode
validates semantics, not Mosaic lowering or DMA bounds. This gate is the
structural fix (round-2 verdict, "Next round" #2): a ~2-minute script that
executes the BSR kernels and the culled pipeline ON THE REAL CHIP across the
regimes that differ from the unit tests:

  - bsr_nearest + bsr_any, VPU and MXU variants, exit_every 0 and 8
  - multi-segment work lists (w_pad > SEGMENT, the lax.scan chaining)
  - nb not a multiple of cull_group (the round-2 config-5 fault shape)
  - a full CulledRenderer.render_fast frame at 62K tris (config-3 scale)
  - culled vs dense image agreement at 968 tris

Usage:  python tools/tpu_smoke.py          (needs the TPU; fails loudly on CPU)
Exit status 0 = gate passed. Any exception or mismatch = fail.

README documents this as a pre-commit requirement for kernel changes.
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402


def main() -> int:
    t_start = time.monotonic()
    import jax
    import jax.numpy as jnp

    from distributed_raytracer_tpu.utils.jaxtools import (
        enable_compilation_cache)
    enable_compilation_cache()

    dev = jax.devices()[0]
    if dev.platform == "cpu":
        print("tpu_smoke: FAIL — running on CPU; this gate must execute on "
              "the real chip (JAX_PLATFORMS should select the TPU).")
        return 2

    from distributed_raytracer_tpu.ops.pallas import bsr_trace
    from distributed_raytracer_tpu.ops.render import render_frame
    from distributed_raytracer_tpu.ops.render_bvh import CulledRenderer
    from distributed_raytracer_tpu.utils import scenes as S
    from __graft_entry__ import _example_scene

    failures = []

    def check(name, ok, detail=""):
        print(f"  {'ok  ' if ok else 'FAIL'} {name} {detail}", flush=True)
        if not ok:
            failures.append(name)

    scene = _example_scene()
    arrays, tree = scene.bake_bvh(block_size=128)
    tris16 = np.asarray(bsr_trace.pack_tris(arrays))
    T = tris16.shape[0]
    nb = T // 128
    rt, tb = 512, 128

    # --- kernel-level: dense reference vs every kernel variant ------------
    rng = np.random.default_rng(0)
    R = rt * 4
    # Aim at the mesh (jittered toward the scene centroid) so the checks
    # exercise real hits, not a field of misses.
    centroid = np.asarray(arrays.p0, np.float64)[:scene.num_tris].mean(0)
    origin = np.asarray(scene.camera.pos, np.float32)
    aim = (centroid - origin)[:, None]
    dirs = (aim + 0.6 * rng.normal(size=(3, R))).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=0, keepdims=True)
    rays = bsr_trace.pack_rays_rows(jnp.asarray(origin), jnp.asarray(dirs))
    excl = jnp.full((R,), -1, jnp.int32)

    def worklist(w_pad):
        """Every tile visits every block, front-padded to w_pad slots."""
        cells = 4 * nb
        reps = -(-w_pad // cells)
        t_ids = np.repeat(np.arange(4, dtype=np.int32), nb)
        b_ids = np.tile(np.arange(nb, dtype=np.int32), 4)
        t_ids = np.tile(t_ids, reps)[:w_pad]
        b_ids = np.tile(b_ids, reps)[:w_pad]
        # keep tile-major ordering after the tiling
        order = np.argsort(t_ids, kind="stable")
        return (jnp.asarray(t_ids[order]), jnp.asarray(b_ids[order]),
                jnp.zeros((w_pad,), jnp.float32), jnp.int32(cells))

    # dense oracle on-device (brute force over all pairs)
    tris_cam = bsr_trace.pack_tris_origin(jnp.asarray(tris16), rays[0:3, 0])

    small = bsr_trace.bucket_w_pad(4 * nb)
    big = bsr_trace.SEGMENT * 2           # forces the multi-segment scan
    ref_t = None
    for w_pad in (small, big):
        t_ids, b_ids, entry, count = worklist(w_pad)
        for mxu in (False, True):
            if mxu:
                tris_arg = (jnp.asarray(bsr_trace.pack_dirs(tris16, tb)),
                            bsr_trace.fold_origin_scal(jnp.asarray(tris16),
                                                       rays[0:3, 0]))
            else:
                tris_arg = tris_cam
            for ee in (0, 8):
                bt, bi = bsr_trace.bsr_nearest(
                    rays, excl, tris_arg, t_ids, b_ids, entry, count,
                    rt=rt, tb=tb, w_pad=w_pad, shared_origin=True,
                    exit_every=ee)
                bt = np.asarray(bt)
                if ref_t is None:
                    ref_t = bt
                tag = (f"bsr_nearest w_pad={w_pad} mxu={int(mxu)} "
                       f"exit={ee}")
                finite = np.isfinite(ref_t)
                agree = (np.isfinite(bt) == finite).all() and np.allclose(
                    bt[finite], ref_t[finite], rtol=1e-4, atol=1e-4)
                check(tag, agree,
                      f"hits={int(np.isfinite(bt).sum())}")
                hit = np.asarray(bsr_trace.bsr_any(
                    rays, excl, tris_arg, t_ids, b_ids, entry, count,
                    jnp.zeros((R,), jnp.int32),
                    rt=rt, tb=tb, w_pad=w_pad, shared_origin=True,
                    exit_every=ee))
                # any-hit with unbounded t_max == nearest-hit finiteness
                check(tag.replace("nearest", "any"),
                      ((hit == 1) == finite).all())

    # --- pipeline: culled vs dense image at 968 tris ----------------------
    w, h = 640, 480
    dense = np.asarray(render_frame(jax.device_put(scene.bake()),
                                    scene.camera.to_arrays(), w, h))
    r1 = CulledRenderer(scene, w, h)
    culled = np.asarray(r1.render(scene.camera, block=True))
    check("culled_vs_dense_968", np.abs(dense - culled).max() < 1e-3,
          f"maxdiff={np.abs(dense - culled).max():.2e}")
    r1.freeze(scene.camera)
    fast = np.asarray(r1.render_fast(scene.camera.to_arrays()))
    check("fast_vs_dense_968", np.abs(dense - fast).max() < 1e-3)

    # --- pipeline: one frame at config-3 scale (62K tris) -----------------
    big_scene = S.instanced_grid(scene, 8)
    r3 = CulledRenderer(big_scene, w, h)
    img = r3.render(big_scene.camera, block=True)
    r3.freeze(big_scene.camera)
    img = np.asarray(r3.render_fast(big_scene.camera.to_arrays()))
    check("render_fast_62k", np.isfinite(img).all() and img.max() > 0.0,
          f"counts={r3._last_counts}")

    # --- pipeline: one 1080p multi-bounce frame (config-2 shape) ----------
    # The uncompacted bounce path feeds ~2M rays through prepare_packed —
    # the exact shape where the one-hot table fetch must fall back to the
    # gather (shade.prepare_packed's product gate); exercise it on the chip
    # so an interpret-passes/chip-fails regression there cannot ship.
    r2 = CulledRenderer(scene, 1920, 1080)
    bounced = r2.freeze_bounced(scene.camera, depth=2)
    img2 = np.asarray(bounced(scene.camera.to_arrays()))
    check("bounce2_1080p", np.isfinite(img2).all() and img2.max() > 0.0)

    wall = time.monotonic() - t_start
    status = "PASSED" if not failures else f"FAILED ({failures})"
    print(f"tpu_smoke: {status} in {wall:.0f}s on {dev}")
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
