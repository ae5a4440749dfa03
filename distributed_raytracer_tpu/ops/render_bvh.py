"""Block-sparse (BVH-culled) frame rendering.

The large-scene path: the dense sweep in ops/render.py does rays x ALL
triangles; this pipeline first culls (ray-tile, tri-block) pairs with the
conservative interval test (ops/cull.py) over the Morton block BVH
(models/bvh.py), then runs only surviving pairs through the Pallas BSR
kernels (ops/pallas/bsr_trace.py). Images are exact (culling is
conservative); only the work changes — the TPU equivalent of the
reference's two-level R-tree pruning (tracer.go:32, object.go:76).

Rays are laid out in 2D screen tiles (cull.tiled_ray_order): compact tiles
have tight interval hulls, which is what makes the cull effective (2-3%
retention on the 62K-tri benchmark vs ~50% with row strips).

The frame is computed in three jitted stages with two tiny host syncs that
size the work lists (power-of-two buckets, so recompiles are rare):
  stage A: primary rays + primary cull mask -> count
  stage B: BSR nearest hit + shadow queries + per-light cull masks -> counts
  stage C: per-light BSR any-hit + Phong accumulation -> frame
freeze()/render_fast() fuse all three into one dispatch with fixed buckets.

Implementation note: every big array (scene, packed triangles, block AABBs,
ray permutations) is passed as a jit *argument*, never closed over — jit
embeds closures as compile-time constants, which blew compile times from
seconds to minutes at 62K triangles.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from distributed_raytracer_tpu.models.camera import Camera, CameraArrays
from distributed_raytracer_tpu.models.scene import Scene, SceneArrays
from distributed_raytracer_tpu.ops import cull, intersect, raygen, shade
from distributed_raytracer_tpu.ops.pallas import bsr_trace
from distributed_raytracer_tpu.utils.config import RenderConfig, DEFAULT_CONFIG


def _next_pow2(n: int) -> int:
    return 1 << max(8, int(n - 1).bit_length())


class CulledRenderer:
    """Per-(scene, resolution) renderer instance with cached jit stages."""

    def __init__(self, scene: Scene, width: int, height: int,
                 cfg: RenderConfig = DEFAULT_CONFIG,
                 block_size: int = 128, ray_tile: int = 512,
                 interpret: bool = False):
        self.width, self.height, self.cfg = width, height, cfg
        self.rt, self.tb = ray_tile, block_size
        self.interpret = interpret
        # Full-frame height for ray projection; the multi-chip band renderer
        # overrides this so each band's global pixel indices project with
        # the whole frame's field of view (parallel/render_sharded_bvh.py).
        self.raygen_height = height

        arrays, tree = scene.bake_bvh(block_size=block_size)
        self.arrays: SceneArrays = jax.device_put(arrays)
        self.tris_packed = jax.device_put(bsr_trace.pack_tris(arrays))
        self.shade_tbl = jax.device_put(shade.pack_table(self.arrays))
        self.block_lo = jnp.asarray(tree.block_lo)
        self.block_hi = jnp.asarray(tree.block_hi)

        # 2D screen tiles (32 x rt/32 pixels): see module docstring.
        tile_w = 32
        perm, inv_real, n_slots = cull.tiled_ray_order(
            width, height, tile_w, ray_tile // tile_w)
        self._perm = jax.device_put(jnp.asarray(perm))
        self._inv_real = jax.device_put(jnp.asarray(inv_real))
        self.n_pad = n_slots
        self.n_tiles = self.n_pad // ray_tile

        self._stage_a = jax.jit(self._stage_a_fn)
        self._stage_b_cache = {}
        self._stage_c_cache = {}
        self._fused = None          # frozen-bucket fast path
        self._last_counts = None    # (count, scounts) from the last sync render

    # -- stage A: primary rays + cull ------------------------------------

    def _stage_a_fn(self, cam: CameraArrays, perm, block_lo, block_hi):
        dirs = raygen.ray_directions_flat(cam, self.width, self.raygen_height,
                                          perm)
        ti = cull.tile_intervals(cam.pos, dirs, self.rt)
        mask, entry = cull.block_mask_with_entry(ti, block_lo, block_hi)
        return dirs, mask, entry, mask.sum()

    # -- stage B: nearest hit + shadow masks -----------------------------

    def _visited(self, mask: jnp.ndarray) -> jnp.ndarray:
        """(n_pad,) bool: does this ray's tile appear in the work list at all?
        Pallas output blocks of unvisited tiles are never written (the grid
        skips them), so their memory is undefined — kernel results are only
        meaningful where the tile had work. Unvisited means the cull proved
        no block can be hit, so nearest=inf / any-hit=0 by construction."""
        return jnp.repeat(mask.any(axis=1), self.rt)

    def _stage_b_fn(self, w_pad: int, scene: SceneArrays, tris_packed,
                    shade_tbl, block_lo, block_hi, cam: CameraArrays,
                    dirs, mask, entry):
        wl = cull.compact_worklist(mask, w_pad, entry=entry)
        rays = bsr_trace.pack_rays(cam.pos, dirs)
        no_excl = jnp.full((self.n_pad,), -1, jnp.int32)
        best_t, best_i = bsr_trace.bsr_nearest(
            rays, no_excl, tris_packed, wl.tile_ids, wl.block_ids,
            wl.entry, wl.count, rt=self.rt, tb=self.tb, w_pad=w_pad,
            interpret=self.interpret)
        best_t = jnp.where(self._visited(mask), best_t, jnp.inf)
        hits = intersect.Hits(t=best_t,
                              tri=jnp.minimum(best_i, scene.p0.shape[0] - 1),
                              valid=jnp.isfinite(best_t))
        prep = shade.prepare(scene, cam.pos, dirs, hits, self.cfg,
                             table=shade_tbl)

        def light_mask(q_origin, q_dir, q_tmax):
            # Only rays that actually hit something cast shadow rays; dead
            # rays are masked out of the tile hulls (cull.tile_intervals
            # live=) so they never widen the work lists.
            ti = cull.tile_intervals(q_origin, q_dir, self.rt, t_max=q_tmax,
                                     live=hits.valid)
            return cull.block_mask_with_entry(ti, block_lo, block_hi)

        smasks, sentries = jax.vmap(light_mask)(
            prep.queries.origin, prep.queries.ldir, prep.queries.t_max)
        return hits, prep, smasks, sentries, smasks.sum(axis=(1, 2))

    # -- stage C: shadow queries + shading -------------------------------

    def _stage_c_fn(self, w_pads: tuple, scene: SceneArrays, tris_packed,
                    inv_real, cam: CameraArrays, hits, prep, smasks, sentries):
        lit = []
        n_lights = scene.light_pos.shape[0]
        for li in range(n_lights):
            wl = cull.compact_worklist(smasks[li], w_pads[li],
                                       entry=sentries[li])
            rays = bsr_trace.pack_rays(prep.queries.origin[li],
                                       prep.queries.ldir[li],
                                       prep.queries.t_max[li])
            hit = bsr_trace.bsr_any(
                rays, hits.tri, tris_packed, wl.tile_ids, wl.block_ids,
                wl.entry, wl.count, rt=self.rt, tb=self.tb, w_pad=w_pads[li],
                interpret=self.interpret)
            lit.append(jnp.where(self._visited(smasks[li]), hit == 0, True))
        lit = jnp.stack(lit) if lit else jnp.zeros((0, self.n_pad), bool)
        colours = shade.shade_core(scene, cam.pos, prep, hits, lit)
        # Un-permute tile-major ray slots back into the row-major frame.
        return colours[inv_real].reshape(self.height, self.width, 3)

    # -- multi-bounce stages ---------------------------------------------
    #
    # Whitted reflections on the block-sparse path (config 2 of
    # BASELINE.json; semantics identical to ops/render.py
    # trace_rays_bounced / the float64 oracle's _radiance). Each bounce is
    # one more BSR nearest query whose ray set is the previous bounce's
    # reflections, plus per-light BSR shadow queries; the radiance
    # accumulates as colour += throughput * phong_b with one final clamp.

    def _reflection_query(self, scene: SceneArrays, prep, hits, dirs):
        """Reflected rays from the current hits (+ their cull mask)."""
        cfg = self.cfg
        n = prep.normal
        d_dot_n = jnp.einsum("cd,cd->c", dirs, n)
        refl = dirs - 2.0 * d_dot_n[:, None] * n
        rlen = jnp.linalg.norm(refl, axis=-1, keepdims=True)
        refl = refl / jnp.where(rlen > 0, rlen, 1.0)
        side = jnp.where(jnp.einsum("cd,cd->c", n, refl) >= 0.0, 1.0, -1.0)
        o = (prep.x + cfg.shadow_offset * refl
             + (cfg.shadow_normal_offset * side)[:, None] * n)
        # Dead rays (miss or zero-Ks material) are masked out of the tile
        # hulls; their (finite, garbage) ray data still traverses with live
        # tiles but contributes nothing (throughput is zeroed).
        live = hits.valid & jnp.any(prep.ks > 0.0, axis=-1)
        ti = cull.tile_intervals(o, refl, self.rt, live=live)
        mask, entry = cull.block_mask_with_entry(ti, self.block_lo, self.block_hi)
        return o, refl, live, mask, entry, mask.sum()

    def _stage_bounce_fn(self, w_pad: int, scene: SceneArrays, tris_packed,
                         shade_tbl, block_lo, block_hi, origins, dirs,
                         exclude, mask, entry):
        """Nearest + shadow masks for an arbitrary ray set (origins per-ray
        or shared); also emits the next bounce's reflection query."""
        wl = cull.compact_worklist(mask, w_pad, entry=entry)
        rays = bsr_trace.pack_rays(origins, dirs)
        best_t, best_i = bsr_trace.bsr_nearest(
            rays, exclude, tris_packed, wl.tile_ids, wl.block_ids,
            wl.entry, wl.count, rt=self.rt, tb=self.tb, w_pad=w_pad,
            interpret=self.interpret)
        best_t = jnp.where(self._visited(mask), best_t, jnp.inf)
        hits = intersect.Hits(t=best_t,
                              tri=jnp.minimum(best_i, scene.p0.shape[0] - 1),
                              valid=jnp.isfinite(best_t))
        prep = shade.prepare(scene, origins, dirs, hits, self.cfg,
                             table=shade_tbl)

        def light_mask(q_origin, q_dir, q_tmax):
            ti = cull.tile_intervals(q_origin, q_dir, self.rt, t_max=q_tmax,
                                     live=hits.valid)
            return cull.block_mask_with_entry(ti, block_lo, block_hi)

        smasks, sentries = jax.vmap(light_mask)(
            prep.queries.origin, prep.queries.ldir, prep.queries.t_max)
        r_o, r_d, r_live, r_mask, r_entry, r_count = self._reflection_query(
            scene, prep, hits, dirs)
        return (hits, prep, smasks, sentries, smasks.sum(axis=(1, 2)),
                r_o, r_d, r_live, r_mask, r_entry, r_count)

    def _stage_shade_fn(self, w_pads: tuple, scene: SceneArrays, tris_packed,
                        view, hits, prep, smasks, sentries):
        """Per-light shadow queries + phong for one bounce -> (C, 3) local
        radiance (not yet throughput-weighted)."""
        lit = []
        for li in range(scene.light_pos.shape[0]):
            wl = cull.compact_worklist(smasks[li], w_pads[li],
                                       entry=sentries[li])
            rays = bsr_trace.pack_rays(prep.queries.origin[li],
                                       prep.queries.ldir[li],
                                       prep.queries.t_max[li])
            hit = bsr_trace.bsr_any(
                rays, hits.tri, tris_packed, wl.tile_ids, wl.block_ids,
                wl.entry, wl.count, rt=self.rt, tb=self.tb, w_pad=w_pads[li],
                interpret=self.interpret)
            lit.append(jnp.where(self._visited(smasks[li]), hit == 0, True))
        lit = jnp.stack(lit) if lit else jnp.zeros((0, self.n_pad), bool)
        return shade.shade_core(scene, view, prep, hits, lit)

    def render_bounced(self, camera, depth: int, block: bool = False):
        """Whitted multi-bounce render on the block-sparse path."""
        cam = camera.to_arrays() if isinstance(camera, Camera) else camera
        dirs, mask, entry, count = self._stage_a(
            cam, self._perm, self.block_lo, self.block_hi)

        def jit_for(cache, key, fn, *static):
            f = cache.get(key)
            if f is None:
                f = jax.jit(functools.partial(fn, *static))
                cache[key] = f
            return f

        colour = jnp.zeros((self.n_pad, 3), jnp.float32)
        throughput = jnp.ones((self.n_pad, 3), jnp.float32)
        origins = cam.pos
        view = cam.pos
        exclude = jnp.full((self.n_pad,), -1, jnp.int32)
        ks_cache = None
        pads_used = []

        for b in range(depth + 1):
            w_pad = _next_pow2(int(count))
            sb = jit_for(self._stage_b_cache, ("bounce", b > 0, w_pad),
                         self._stage_bounce_fn, w_pad)
            (hits, prep, smasks, sentries, scounts,
             r_o, r_d, r_live, r_mask, r_entry, r_count) = sb(
                self.arrays, self.tris_packed, self.shade_tbl,
                self.block_lo, self.block_hi,
                origins, dirs, exclude, mask, entry)
            w_pads = tuple(_next_pow2(int(c)) for c in np.asarray(scounts))
            pads_used.append((w_pad, w_pads))
            sc = jit_for(self._stage_c_cache, ("shade", b > 0, w_pads),
                         self._stage_shade_fn, w_pads)
            local = sc(self.arrays, self.tris_packed, view, hits, prep,
                       smasks, sentries)
            ks_cache = prep.ks
            colour = colour + throughput * local
            if b == depth:
                break
            throughput = jnp.where(hits.valid[:, None],
                                   throughput * ks_cache, 0.0)
            view = prep.x
            origins, dirs = r_o, r_d
            exclude = hits.tri
            mask, entry, count = r_mask, r_entry, int(r_count)

        colour = jnp.clip(colour, 0.0, 1.0)
        img = colour[self._inv_real].reshape(self.height, self.width, 3)
        self._last_bounce_pads = tuple(pads_used)
        if block:
            jax.block_until_ready(img)
        return img

    def _full_bounced_fn(self, pads: tuple, scene: SceneArrays, tris_packed,
                         shade_tbl, block_lo, block_hi, perm, inv_real,
                         cam: CameraArrays):
        """Fused multi-bounce pipeline with fixed buckets (no host syncs)."""
        dirs, mask, entry, _ = self._stage_a_fn(cam, perm, block_lo, block_hi)
        colour = jnp.zeros((self.n_pad, 3), jnp.float32)
        throughput = jnp.ones((self.n_pad, 3), jnp.float32)
        origins = cam.pos
        view = cam.pos
        exclude = jnp.full((self.n_pad,), -1, jnp.int32)
        for b, (w_pad, w_pads) in enumerate(pads):
            (hits, prep, smasks, sentries, _,
             r_o, r_d, _, r_mask, r_entry, _) = self._stage_bounce_fn(
                w_pad, scene, tris_packed, shade_tbl, block_lo, block_hi,
                origins, dirs, exclude, mask, entry)
            local = self._stage_shade_fn(w_pads, scene, tris_packed, view,
                                         hits, prep, smasks, sentries)
            ks = prep.ks
            colour = colour + throughput * local
            if b + 1 == len(pads):
                break
            throughput = jnp.where(hits.valid[:, None], throughput * ks, 0.0)
            view = prep.x
            origins, dirs = r_o, r_d
            exclude = hits.tri
            mask, entry = r_mask, r_entry
        colour = jnp.clip(colour, 0.0, 1.0)
        return colour[inv_real].reshape(self.height, self.width, 3)

    def freeze_bounced(self, camera, depth: int, margin: float = 2.0):
        """Fuse the multi-bounce pipeline with buckets sized from one sync
        render x margin. Returns the fused render function."""
        self.render_bounced(camera, depth, block=True)
        pads = tuple(
            (_next_pow2(int(w * margin)),
             tuple(_next_pow2(int(c * margin)) for c in wl))
            for (w, wl) in self._last_bounce_pads)
        fused = jax.jit(functools.partial(self._full_bounced_fn, pads))

        def render(cam):
            c = cam.to_arrays() if isinstance(cam, Camera) else cam
            return fused(self.arrays, self.tris_packed, self.shade_tbl,
                         self.block_lo, self.block_hi, self._perm,
                         self._inv_real, c)

        return render

    # -- public ----------------------------------------------------------

    def render(self, camera, block: bool = False):
        """Render a frame; returns a device array (H, W, 3) float32."""
        cam = camera.to_arrays() if isinstance(camera, Camera) else camera
        dirs, mask, entry, count = self._stage_a(
            cam, self._perm, self.block_lo, self.block_hi)
        w_pad = _next_pow2(int(count))

        stage_b = self._stage_b_cache.get(w_pad)
        if stage_b is None:
            stage_b = jax.jit(functools.partial(self._stage_b_fn, w_pad))
            self._stage_b_cache[w_pad] = stage_b
        hits, prep, smasks, sentries, scounts = stage_b(
            self.arrays, self.tris_packed, self.shade_tbl,
            self.block_lo, self.block_hi, cam, dirs, mask, entry)

        w_pads = tuple(_next_pow2(int(c)) for c in np.asarray(scounts))
        stage_c = self._stage_c_cache.get(w_pads)
        if stage_c is None:
            stage_c = jax.jit(functools.partial(self._stage_c_fn, w_pads))
            self._stage_c_cache[w_pads] = stage_c
        img = stage_c(self.arrays, self.tris_packed, self._inv_real,
                      cam, hits, prep, smasks, sentries)
        self._last_counts = (int(count), tuple(int(c) for c in np.asarray(scounts)))
        if block:
            jax.block_until_ready(img)
        return img

    # -- frozen fast path ------------------------------------------------
    #
    # The sync render pays two host round trips per frame to size the work
    # lists exactly. freeze() fixes the buckets (last observed counts x a
    # safety margin) and fuses all three stages into ONE jitted call with no
    # syncs — the interactive/benchmark path. Work-list overflow would drop
    # candidate blocks, so render_fast(verify=True) (or any sync render)
    # should be used periodically / during warmup to confirm margins hold;
    # on overflow freeze() is simply called again with the new counts.

    def _full_fn(self, w_pad: int, w_pads: tuple, scene: SceneArrays,
                 tris_packed, shade_tbl, block_lo, block_hi, perm, inv_real,
                 cam: CameraArrays):
        dirs, mask, entry, count = self._stage_a_fn(cam, perm, block_lo, block_hi)
        hits, prep, smasks, sentries, scounts = self._stage_b_fn(
            w_pad, scene, tris_packed, shade_tbl, block_lo, block_hi,
            cam, dirs, mask, entry)
        img = self._stage_c_fn(w_pads, scene, tris_packed, inv_real,
                               cam, hits, prep, smasks, sentries)
        return img, count, scounts

    def freeze(self, camera=None, margin: float = 2.0) -> None:
        """Fix work-list buckets from the last sync render (running one if
        needed) and compile the fused no-sync pipeline."""
        if self._last_counts is None:
            if camera is None:
                raise ValueError("freeze() needs a camera for the sizing render")
            self.render(camera, block=True)
        count, scounts = self._last_counts
        w_pad = _next_pow2(int(count * margin))
        w_pads = tuple(_next_pow2(int(c * margin)) for c in scounts)
        self._fused = jax.jit(functools.partial(self._full_fn, w_pad, w_pads))
        self._frozen_pads = (w_pad, w_pads)

    def render_fast(self, camera, verify: bool = False):
        """One fused dispatch, no host syncs. Returns a device array; with
        verify=True, blocks to check the frozen buckets still hold (and
        refreezes + rerenders if they overflowed)."""
        cam = camera.to_arrays() if isinstance(camera, Camera) else camera
        if self._fused is None:
            self.freeze(camera)
        img, count, scounts = self._fused(
            self.arrays, self.tris_packed, self.shade_tbl,
            self.block_lo, self.block_hi, self._perm, self._inv_real, cam)
        if verify:
            w_pad, w_pads = self._frozen_pads
            c = int(count)
            sc = tuple(int(x) for x in np.asarray(scounts))
            if c > w_pad or any(s > wp for s, wp in zip(sc, w_pads)):
                self._last_counts = (c, sc)
                self.freeze(camera)
                img, _, _ = self._fused(
                    self.arrays, self.tris_packed, self.shade_tbl,
                    self.block_lo, self.block_hi, self._perm,
                    self._inv_real, cam)
        return img
