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


def trace_rays_bounced(scene: SceneArrays, origins: jnp.ndarray,
                       dirs: jnp.ndarray, depth: int,
                       cfg: RenderConfig = DEFAULT_CONFIG) -> jnp.ndarray:
    """Whitted-style multi-bounce specular tracing (capability extension;
    the reference stops at primary + shadow rays — BASELINE config 2 asks
    for multi-bounce specular).

    Radiance recursion I(p) = phong(p) + Ks(p) * I(reflect(p)) unrolled to
    `depth` bounces: colour = sum_b (prod_{i<b} Ks_i) * phong_b, clamped to
    [0, 1] at the end (consistent with the saturating colour algebra). Each
    bounce's specular viewer is the previous hit point; reflected rays leave
    the surface with the same normal-lift used for shadow rays and exclude
    their originating triangle (float32 robustness).
    """
    c = dirs.shape[0]
    colour = jnp.zeros((c, 3), jnp.float32)
    throughput = jnp.ones((c, 3), jnp.float32)
    view = origins
    o = origins
    d = dirs
    exclude = None

    for bounce in range(depth + 1):
        hits = intersect.nearest_hit(scene, o, d, exclude=exclude)
        prep = shade.prepare(scene, o, d, hits, cfg)

        def answer(q):
            q_origin, q_dir, q_tmax = q
            return jnp.logical_not(intersect.any_hit(
                scene, q_origin, q_dir, q_tmax, exclude=hits.tri))

        lit = jax.lax.map(answer, prep.queries)
        local = shade.shade_core(scene, view, prep, hits, lit)
        colour = colour + throughput * local  # local is 0 for misses

        if bounce == depth:
            break
        tri = jnp.maximum(hits.tri, 0)
        ks = prep.ks
        throughput = jnp.where(hits.valid[:, None], throughput * ks, 0.0)
        n = prep.normal
        d_dot_n = jnp.einsum("cd,cd->c", d, n)
        refl = d - 2.0 * d_dot_n[:, None] * n
        geo = prep.normal  # shading normal for the lift (smooth surfaces)
        side = jnp.where(jnp.einsum("cd,cd->c", geo, refl) >= 0.0, 1.0, -1.0)
        view = prep.x
        o = (prep.x + cfg.shadow_offset * refl
             + (cfg.shadow_normal_offset * side)[:, None] * geo)
        d = refl / jnp.linalg.norm(refl, axis=-1, keepdims=True)
        exclude = hits.tri

    return jnp.clip(colour, 0.0, 1.0)


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


@functools.partial(jax.jit, static_argnames=("width", "height", "depth", "cfg"))
def render_frame_bounced(scene: SceneArrays, cam: CameraArrays, width: int,
                         height: int, depth: int,
                         cfg: RenderConfig = DEFAULT_CONFIG) -> jnp.ndarray:
    """Multi-bounce render (see trace_rays_bounced); depth=0 == render_frame."""
    dirs = raygen.ray_directions(cam, width, height).reshape(-1, 3)
    n = dirs.shape[0]
    chunk = min(cfg.ray_chunk, n)
    n_pad = -(-n // chunk) * chunk
    dirs = jnp.pad(dirs, ((0, n_pad - n), (0, 0)), constant_values=1.0)

    def chunk_fn(d):
        return trace_rays_bounced(scene, cam.pos, d, depth, cfg)

    colours = jax.lax.map(chunk_fn, dirs.reshape(-1, chunk, 3))
    return colours.reshape(n_pad, 3)[:n].reshape(height, width, 3)
