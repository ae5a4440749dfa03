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
device at build time, maxed across bands and padded by `margin`. Bucket
overflow would drop candidate blocks; `sizing_camera` should be
representative (the verify loop of the single-chip path applies here too).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from distributed_raytracer_tpu.models.camera import Camera, CameraArrays
from distributed_raytracer_tpu.models.scene import Scene
from distributed_raytracer_tpu.ops.render_bvh import CulledRenderer, _bucket
from distributed_raytracer_tpu.utils.config import RenderConfig, DEFAULT_CONFIG

AXIS = "bands"


def make_sharded_culled_renderer(scene: Scene, width: int, height: int,
                                 mesh: Optional[Mesh] = None,
                                 sizing_camera: Optional[Camera] = None,
                                 margin: float = 2.0,
                                 cfg: RenderConfig = DEFAULT_CONFIG,
                                 interpret: bool = False):
    """Build a (cam) -> (H, W, 3) numpy renderer sharded over `mesh`.

    Returns the render function; `.device_fn` gives the still-sharded
    device output for perf measurement without the host gather.
    """
    if mesh is None:
        mesh = jax.make_mesh((len(jax.devices()),), (AXIS,))
    n = mesh.devices.size
    h_band = -(-height // n)
    height_padded = h_band * n

    # Band renderer: the single-chip pipeline at (width, h_band), reused on
    # every device with a per-band row offset.
    band = CulledRenderer(scene, width, h_band, cfg=cfg, interpret=interpret)
    band.raygen_height = height  # bands project with the full frame's fov
    camera = sizing_camera if sizing_camera is not None else scene.camera

    # Sizing pass: run each band's stages on one device, take the max
    # bucket over bands (static under shard_map).
    max_count, max_scount = 0, 0
    base_perm = np.asarray(band._perm)
    for b in range(n):
        band._perm = jax.device_put(
            jnp.asarray(np.minimum(base_perm + b * h_band * width,
                                   width * height - 1)))
        band.render(camera, block=True)
        c, sc = band._last_counts
        max_count = max(max_count, c)
        max_scount = max(max_scount, sc)
    band._perm = jax.device_put(jnp.asarray(base_perm))
    w_pad = _bucket(max_count, margin)
    w_pad_sh = _bucket(max_scount, margin)

    def shard_fn(scene_arrays, tris_packed, tris_lights, shade_tbl,
                 block_lo, block_hi, perm, cam: CameraArrays):
        me = jax.lax.axis_index(AXIS)
        my_perm = jnp.minimum(perm + me * (h_band * width),
                              width * height - 1)
        img, _, _ = band._full_fn(
            w_pad, w_pad_sh, scene_arrays, tris_packed, tris_lights,
            shade_tbl, block_lo, block_hi, my_perm, cam)
        return img  # (h_band, width, 3)

    sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=P(AXIS),
        # Pallas out_shapes carry no varying-mesh-axes annotation; the
        # kernels touch no collectives, so skip the vma typecheck.
        check_vma=False,
    )
    device_fn_jit = jax.jit(sharded)

    def device_fn(cam: CameraArrays):
        return device_fn_jit(band.arrays, band.tris_packed,
                             band.tris_lights, band.shade_tbl,
                             band.block_lo, band.block_hi, band._perm, cam)

    def render(cam) -> np.ndarray:
        c = cam.to_arrays() if isinstance(cam, Camera) else cam
        out = np.asarray(device_fn(c))          # (height_padded, W, 3)
        return out[:height]

    render.device_fn = device_fn
    render.band = band
    render.buckets = (w_pad, w_pad_sh)
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
    work-list buckets are sized by running the sync multi-bounce pipeline
    on every band once and maxing the buckets (static under shard_map).
    Reflection rays stay within their band's pipeline — geometry is
    replicated, so no cross-band exchange is needed (the geometry-sharded
    secondary-ray schedules are parallel/ring.py and parallel/halo.py).
    """
    if mesh is None:
        mesh = jax.make_mesh((len(jax.devices()),), (AXIS,))
    n = mesh.devices.size
    h_band = -(-height // n)

    band = CulledRenderer(scene, width, h_band, cfg=cfg, interpret=interpret)
    band.raygen_height = height
    camera = sizing_camera if sizing_camera is not None else scene.camera

    # Per-band sizing pass: max each bounce's buckets over all bands.
    pads = None
    base_perm = np.asarray(band._perm)
    for b in range(n):
        band._perm = jax.device_put(
            jnp.asarray(np.minimum(base_perm + b * h_band * width,
                                   width * height - 1)))
        band.render_bounced(camera, depth, block=True)
        cur = band._last_bounce_pads
        pads = cur if pads is None else tuple(
            (max(p, c), max(ps, cs))
            for (p, ps), (c, cs) in zip(pads, cur))
    band._perm = jax.device_put(jnp.asarray(base_perm))
    pads = tuple((_bucket(p, margin), _bucket(ps, margin)) for p, ps in pads)

    def shard_fn(scene_arrays, tris_packed, tris_lights, shade_tbl,
                 block_lo, block_hi, perm, cam: CameraArrays):
        me = jax.lax.axis_index(AXIS)
        my_perm = jnp.minimum(perm + me * (h_band * width),
                              width * height - 1)
        return band._full_bounced_fn(
            pads, scene_arrays, tris_packed, tris_lights, shade_tbl,
            block_lo, block_hi, my_perm, cam)  # (h_band, width, 3)

    sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=P(AXIS),
        check_vma=False,
    )
    device_fn_jit = jax.jit(sharded)

    def device_fn(cam: CameraArrays):
        return device_fn_jit(band.arrays, band.tris_packed,
                             band.tris_lights, band.shade_tbl,
                             band.block_lo, band.block_hi, band._perm, cam)

    def render(cam) -> np.ndarray:
        c = cam.to_arrays() if isinstance(cam, Camera) else cam
        out = np.asarray(device_fn(c))          # (height_padded, W, 3)
        return out[:height]

    render.device_fn = device_fn
    render.band = band
    render.buckets = pads
    return render
