"""Multi-chip block-sparse rendering: the production scaling path.

Combines parallel/render_sharded.py's static row partition (the master's
tile dispatch analog) with ops/render_bvh.py's block-sparse pipeline: each
device owns a horizontal band of the frame and runs the full cull + BSR
traversal + shadow + shade pipeline on its own rays, with geometry
replicated (registrar.go:41-47's scene replication analog). No collectives
in the frame computation — scaling is bounded by the final framebuffer
gather, exactly like the reference's tile reassembly.

Work-list buckets must be static under shard_map (no host syncs inside a
traced computation), so they are sized by a per-band sizing pass on one
device at build time, maxed across bands and padded by `margin`. Every
frame ALSO returns its true per-band counts; render(cam, verify=True)
checks them against the frozen buckets and re-sizes + re-renders on
overflow — without this a camera outside the sizing margin would silently
drop candidate blocks, and the reference never displays a wrong tile
(master/main.go:153-161).
"""

from __future__ import annotations

import functools
import logging
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

_log = logging.getLogger(__name__)

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from distributed_raytracer_tpu.models.camera import Camera, CameraArrays
from distributed_raytracer_tpu.models.scene import Scene
from distributed_raytracer_tpu.ops.render_bvh import (CulledRenderer,
                                                      _bucket, _tile_bucket)
from distributed_raytracer_tpu.utils.config import RenderConfig, DEFAULT_CONFIG

AXIS = "bands"


def _make_band(scene: Scene, width: int, height: int, mesh: Optional[Mesh],
               cfg: RenderConfig, interpret: bool):
    """Shared band setup: mesh, band-height renderer, per-band sizing walk.

    Returns (mesh, n, h_band, band, size_bands) where size_bands(measure)
    runs `measure(band)` once per band with the band's ray permutation
    installed and returns the list of results — the sizing-pass skeleton
    both renderer builders share.
    """
    if mesh is None:
        mesh = jax.make_mesh((len(jax.devices()),), (AXIS,))
    n = mesh.devices.size
    h_band = -(-height // n)

    band = CulledRenderer(scene, width, h_band, cfg=cfg, interpret=interpret)
    band.raygen_height = height  # bands project with the full frame's fov

    def size_bands(measure: Callable):
        base_perm = np.asarray(band._perm)
        out = []
        for b in range(n):
            band._perm = jax.device_put(
                jnp.asarray(np.minimum(base_perm + b * h_band * width,
                                       width * height - 1)))
            out.append(measure(band))
        band._perm = jax.device_put(jnp.asarray(base_perm))
        return out

    return mesh, n, h_band, band, size_bands


def _band_perm(perm, me, h_band, width, height):
    return jnp.minimum(perm + me * (h_band * width), width * height - 1)


def _finish(mesh, n, h_band, band, shard_fn, height, refreeze):
    """Common tail: shard_map wiring + the verify/render wrappers.

    shard_fn(cam) -> (band image, counts row); counts stack to (n, K).
    refreeze(counts (n, K)) rebuilds the jit with bigger buckets; it
    returns the new shard_fn (state lives in the closure of the caller).
    """
    state = {"fn": shard_fn}

    def build(fn):
        sharded = shard_map(
            fn, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(), P(), P(), P()),
            out_specs=(P(AXIS), P(AXIS)),
            # Pallas out_shapes carry no varying-mesh-axes annotation; the
            # kernels touch no collectives, so skip the vma typecheck.
            check_vma=False,
        )
        return jax.jit(sharded)

    state["jit"] = build(shard_fn)

    def device_fn(cam: CameraArrays):
        return state["jit"](band.arrays, band.tris_packed, band.tris_dirs,
                            band.lights_scal, band.shade_tbl,
                            band.block_lo, band.block_hi, band._perm, cam)

    def render(cam, verify: bool = False) -> np.ndarray:
        c = cam.to_arrays() if isinstance(cam, Camera) else cam
        out, counts = device_fn(c)
        if verify:
            # Loop until every band's counts fit: a level-1 overflow makes
            # the reported level-2 counts undercounts, so a single
            # refreeze-from-reported-values could still truncate (see
            # CulledRenderer.render_fast's verify loop).
            fits = False
            for _ in range(8):
                new_fn = refreeze(np.asarray(counts))
                if new_fn is None:
                    fits = True
                    break
                state["jit"] = build(new_fn)
                out, counts = device_fn(c)
            if not fits:
                _log.warning(
                    "sharded verify did not converge in 8 rounds (counts "
                    "%s); image may drop blocks", np.asarray(counts).tolist())
        render.last_counts = np.asarray(counts)
        return np.asarray(out)[:height]          # (height_padded, W, 3)

    render.device_fn = device_fn
    render.band = band
    render.last_counts = None
    return render


def make_sharded_culled_renderer(scene: Scene, width: int, height: int,
                                 mesh: Optional[Mesh] = None,
                                 sizing_camera: Optional[Camera] = None,
                                 margin: float = 2.0,
                                 cfg: RenderConfig = DEFAULT_CONFIG,
                                 interpret: bool = False):
    """Build a (cam) -> (H, W, 3) numpy renderer sharded over `mesh`.

    Returns the render function; `.device_fn` gives the still-sharded
    (image, counts) device outputs for perf measurement without the host
    gather; render(cam, verify=True) re-sizes buckets on overflow.
    """
    mesh, n, h_band, band, size_bands = _make_band(
        scene, width, height, mesh, cfg, interpret)
    camera = sizing_camera if sizing_camera is not None else scene.camera

    def measure(b):
        b.render(camera, block=True)
        return b._last_counts               # (c1, c2, sc1, sc2)

    counts = size_bands(measure)
    n_counts = len(counts[0])          # (c1, c2, hit_tiles, sc1, sc2)
    pads0 = tuple(_bucket(max(c[k] for c in counts), margin)
                  for k in range(n_counts))
    # slot 2 is the band's hit-TILE bucket (capped at the band tile count)
    ht = max(c[2] for c in counts)
    buckets = {"pads": pads0[:2]
               + (_tile_bucket(int(ht * margin), band.n_tiles),)
               + pads0[3:]}

    def make_fn(pads):
        def shard_fn(scene_arrays, tris_packed, tris_dirs, lights_scal,
                     shade_tbl, block_lo, block_hi, perm, cam: CameraArrays):
            me = jax.lax.axis_index(AXIS)
            my_perm = _band_perm(perm, me, h_band, width, height)
            img, counts = band._full_fn(
                *pads, scene_arrays, tris_packed, tris_dirs,
                lights_scal, shade_tbl, block_lo, block_hi, my_perm, cam)
            return img, counts[None]            # (h_band, W, 3), (1, n_counts)
        return shard_fn

    def refreeze(got):                          # got: (n, n_counts)
        worst = got.max(axis=0)
        if all(int(worst[k]) <= buckets["pads"][k]
               for k in range(n_counts)):
            return None
        new = [max(p, _bucket(int(w), margin))
               for p, w in zip(buckets["pads"], worst)]
        new[2] = max(buckets["pads"][2],
                     _tile_bucket(int(worst[2] * margin), band.n_tiles))
        buckets["pads"] = tuple(new)
        return make_fn(buckets["pads"])

    render = _finish(mesh, n, h_band, band,
                     make_fn(buckets["pads"]), height, refreeze)
    render.buckets = lambda: buckets["pads"]
    return render


def make_sharded_bounced_renderer(scene: Scene, width: int, height: int,
                                  depth: int, mesh: Optional[Mesh] = None,
                                  sizing_camera: Optional[Camera] = None,
                                  margin: float = 2.0,
                                  cfg: RenderConfig = DEFAULT_CONFIG,
                                  interpret: bool = False):
    """Multi-chip Whitted multi-bounce rendering (the sharded sibling of
    CulledRenderer.freeze_bounced — BASELINE config 2 at scale).

    Same band decomposition as make_sharded_culled_renderer; per-bounce
    work-list buckets are sized from each band's RAW sync-render counts
    (never from already-rounded pads) and verified per frame like the
    culled variant. Reflection rays stay within their band's pipeline —
    geometry is replicated, so no cross-band exchange is needed (the
    geometry-sharded secondary-ray schedules are parallel/halo_bvh.py and
    parallel/ring_bvh.py).
    """
    mesh, n, h_band, band, size_bands = _make_band(
        scene, width, height, mesh, cfg, interpret)
    camera = sizing_camera if sizing_camera is not None else scene.camera

    def measure(b):
        b.render_bounced(camera, depth, block=True)
        return b._last_bounce_counts

    per_band = size_bands(measure)
    raw = tuple(tuple(max(band_counts[k][j] for band_counts in per_band)
                      for j in range(4)) for k in range(depth + 1))
    state = {"pads": tuple(tuple(_bucket(x, margin) for x in quad)
                           for quad in raw)}

    def make_fn(pads):
        def shard_fn(scene_arrays, tris_packed, tris_dirs, lights_scal,
                     shade_tbl, block_lo, block_hi, perm, cam: CameraArrays):
            me = jax.lax.axis_index(AXIS)
            my_perm = _band_perm(perm, me, h_band, width, height)
            img, counts = band._full_bounced_fn(
                pads, scene_arrays, tris_packed, tris_dirs, lights_scal,
                shade_tbl, block_lo, block_hi, my_perm, cam)
            return img, counts[None]            # (h_band, W, 3), (1, B, 4)
        return shard_fn

    def refreeze(got):                          # got: (n, B, 4)
        worst = got.max(axis=0)                 # (B, 4)
        if all(int(worst[k, j]) <= state["pads"][k][j]
               for k in range(depth + 1) for j in range(4)):
            return None
        state["pads"] = tuple(
            tuple(max(p, _bucket(int(w), margin))
                  for p, w in zip(quad, worst_quad))
            for quad, worst_quad in zip(state["pads"], worst))
        return make_fn(state["pads"])

    render = _finish(mesh, n, h_band, band, make_fn(state["pads"]), height,
                     refreeze)
    render.buckets = lambda: state["pads"]
    return render
