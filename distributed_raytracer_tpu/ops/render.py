"""Single-chip frame rendering: ray gen -> nearest hit -> shade.

The array-program replacement for the per-pixel double loop the reference
runs in both workers (worker/sequential/main.go:15-32 `draw` and
worker/distributed/main.go:67-88 `BulkTrace`): all pixels become one batched
program, chunked over rays with lax.map to bound the (rays x triangles)
intermediate memory, jitted once and replayed per frame.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from distributed_raytracer_tpu.models.camera import CameraArrays
from distributed_raytracer_tpu.models.scene import SceneArrays
from distributed_raytracer_tpu.ops import intersect, raygen, shade
from distributed_raytracer_tpu.utils.config import RenderConfig, DEFAULT_CONFIG


def trace_rays(scene: SceneArrays, cam_pos: jnp.ndarray, origins: jnp.ndarray,
               dirs: jnp.ndarray, cfg: RenderConfig = DEFAULT_CONFIG) -> jnp.ndarray:
    """Trace + shade a flat batch of rays (C, 3) -> colours (C, 3)."""
    hits = intersect.nearest_hit(scene, origins, dirs)
    return shade.shade(scene, cam_pos, origins, dirs, hits, cfg)


def _render_dirs(scene: SceneArrays, cam: CameraArrays, dirs_flat: jnp.ndarray,
                 ray_chunk: int, cfg: RenderConfig) -> jnp.ndarray:
    """Trace shared-origin rays in chunks of `ray_chunk` (memory bound)."""
    n = dirs_flat.shape[0]
    chunk = min(ray_chunk, n)
    n_pad = -(-n // chunk) * chunk
    dirs_flat = jnp.pad(dirs_flat, ((0, n_pad - n), (0, 0)),
                        constant_values=1.0)  # pad rays are traced, discarded

    def chunk_fn(d):
        return trace_rays(scene, cam.pos, cam.pos, d, cfg)

    colours = jax.lax.map(chunk_fn, dirs_flat.reshape(-1, chunk, 3))
    return colours.reshape(n_pad, 3)[:n]


@functools.partial(jax.jit, static_argnames=("width", "height", "cfg"))
def render_frame(scene: SceneArrays, cam: CameraArrays, width: int, height: int,
                 cfg: RenderConfig = DEFAULT_CONFIG) -> jnp.ndarray:
    """Render a full frame; returns (height, width, 3) float32 in [0, 1]."""
    dirs = raygen.ray_directions(cam, width, height)
    colours = _render_dirs(scene, cam, dirs.reshape(-1, 3), cfg.ray_chunk, cfg)
    return colours.reshape(height, width, 3)
