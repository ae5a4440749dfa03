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

Data layout is row-native end to end: rays are (8, R) packed rows, per-ray
vectors (3, R) rows, shadow queries kernel-ready (L, 8, R). (R, 3) arrays
use 3 of 128 lanes per vector register and forced XLA into layout-copy
thrash + transposing fusions that dominated the frame profile; the rows
form removed ~40% of frame time. Frame assembly is a reshape/transpose
(tile-major -> row-major), not a gather.

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


# Work-list capacity rounding: 2048-granular (see bsr_trace.bucket_w_pad) —
# pow2 rounding wasted up to 2x of every kernel launch.
_bucket = bsr_trace.bucket_w_pad


def _slim_arrays(arrays: SceneArrays) -> SceneArrays:
    """Strip the per-triangle fields the culled pipeline never reads before
    the device transfer. Only shapes survive ((T, 0) placeholders keep
    `p0.shape[0]` meaningful for id clamping); lights and material tables
    stay real. The full host copy lives on as `renderer.arrays_host`."""
    t = arrays.p0.shape[0]
    e2 = np.zeros((t, 0), np.float32)
    e1 = np.zeros((0,), np.float32)
    return arrays._replace(
        p0=e2, e1=e2, e2=e2, geo_n=e2, n0=e2, n1=e2, n2=e2,
        k_u=e2, k_v=e2, plane_d=e1, c_u=e1, c_v=e1,
        mat_id=np.zeros((0,), np.int32))


class CulledRenderer:
    """Per-(scene, resolution) renderer instance with cached jit stages."""

    def __init__(self, scene: Optional[Scene], width: int, height: int,
                 cfg: RenderConfig = DEFAULT_CONFIG,
                 block_size: int = 128, ray_tile: int = 512,
                 interpret: bool = False, prebaked=None,
                 exit_every: int = 8):
        self.width, self.height, self.cfg = width, height, cfg
        self.rt, self.tb = ray_tile, block_size
        self.interpret = interpret
        # Amortized front-to-back early exit (bsr_trace kernels): refresh
        # the per-tile SMEM bound every `exit_every` work items; 0 = off.
        self.exit_every = exit_every
        # Full-frame height for ray projection; the multi-chip band renderer
        # overrides this so each band's global pixel indices project with
        # the whole frame's field of view (parallel/render_sharded_bvh.py).
        self.raygen_height = height

        # `prebaked` = (SceneArrays, BlockBVH) from a cached bake_bvh — the
        # multi-million-triangle configs take minutes to bake, so bench and
        # services cache the bundle on disk (bench.py config 5).
        if prebaked is not None:
            arrays, tree = prebaked
        else:
            arrays, tree = self._bake_scene(scene, block_size)
        # Packing happens on the HOST and only the packed forms ship:
        # the kernels consume tris_packed + shade_tbl + block AABBs, never
        # the raw per-triangle fields, and at 5M triangles shipping those
        # across a tunneled device link costs minutes for nothing.
        self.arrays_host: SceneArrays = arrays
        tris16_np = bsr_trace.pack_tris(arrays)
        table_np = shade.pack_table(arrays, xp=np)
        self.arrays: SceneArrays = jax.device_put(_slim_arrays(arrays))
        self.tris_packed = jax.device_put(tris16_np)
        self.shade_tbl = jax.device_put(table_np)
        self.block_lo = jnp.asarray(tree.block_lo)
        self.block_hi = jnp.asarray(tree.block_hi)
        # Per-light shared-origin triangle packs for the REVERSED shadow
        # kernels (bsr_trace.pack_tris_origin): (L*T, 16), light l's copy at
        # rows [l*T, (l+1)*T). Lights are static per bake (the dynamic
        # renderer refolds them per frame instead).
        n_lights = int(arrays.light_pos.shape[0])
        if n_lights:
            self.tris_lights = jax.device_put(jnp.concatenate(
                [bsr_trace.pack_tris_origin(self.tris_packed,
                                            self.arrays.light_pos[li])
                 for li in range(n_lights)], axis=0))
        else:
            self.tris_lights = self.tris_packed

        # 2D screen tiles (32 x rt/32 pixels): see module docstring.
        self.tile_w = 32
        self.tile_h = ray_tile // self.tile_w
        perm, inv_real, n_slots = cull.tiled_ray_order(
            width, height, self.tile_w, self.tile_h)
        self._perm = jax.device_put(jnp.asarray(perm))
        self._inv_real = jax.device_put(jnp.asarray(inv_real))
        self.n_pad = n_slots
        self.n_tiles = self.n_pad // ray_tile

        self._stage_a = jax.jit(self._stage_a_fn)
        self._stage_b_cache = {}
        self._stage_c_cache = {}
        self._fused = None          # frozen-bucket fast path
        self._last_counts = None    # (count, scounts) from the last sync render

    def _bake_scene(self, scene: Scene, block_size: int):
        """Bake hook: the dynamic renderer (ops/render_dynamic.py) overrides
        this to group leaf blocks per object for exact AABB shifts."""
        return scene.bake_bvh(block_size=block_size)

    # -- frame assembly ---------------------------------------------------

    def _assemble(self, rows: jnp.ndarray) -> jnp.ndarray:
        """(3, n_pad) tile-major colour rows -> (H, W, 3) row-major frame.

        Pure reshape/transpose (slot s = ((tj*tx + ti)*th + wj)*tw + wi, the
        cull.tiled_ray_order layout) — replaces the (R, 3) inv_real gather,
        which cost more than the intersection kernels.
        """
        tw, th = self.tile_w, self.tile_h
        tx, ty = -(-self.width // tw), -(-self.height // th)
        img = rows.reshape(3, ty, tx, th, tw).transpose(1, 3, 2, 4, 0)
        img = img.reshape(ty * th, tx * tw, 3)
        return img[:self.height, :self.width]

    # -- stage A: primary rays + cull ------------------------------------

    def _stage_a_fn(self, cam: CameraArrays, perm, block_lo, block_hi):
        d_rows = raygen.ray_rows_flat(cam, self.width, self.raygen_height,
                                      perm)
        rays = bsr_trace.pack_rays_rows(cam.pos, d_rows)
        ti = cull.tile_intervals_packed(rays, self.rt)
        mask, entry = cull.block_mask_with_entry(ti, block_lo, block_hi)
        return rays, mask, entry, mask.sum()

    # -- stage B: nearest hit + shadow masks -----------------------------

    def _visited(self, mask: jnp.ndarray) -> jnp.ndarray:
        """(n_pad,) bool: does this ray's tile appear in the work list at all?
        Pallas output blocks of unvisited tiles are never written (the grid
        skips them), so their memory is undefined — kernel results are only
        meaningful where the tile had work. Unvisited means the cull proved
        no block can be hit, so nearest=inf / any-hit=0 by construction."""
        return jnp.repeat(mask.any(axis=1), self.rt)

    def _nearest(self, w_pad, scene, tris_packed, rays, exclude, mask, entry,
                 shared_origin=False):
        wl = cull.compact_worklist(mask, w_pad, entry=entry)
        best_t, best_i = bsr_trace.bsr_nearest(
            rays, exclude, tris_packed, wl.tile_ids, wl.block_ids,
            wl.entry, wl.count, rt=self.rt, tb=self.tb, w_pad=w_pad,
            interpret=self.interpret, shared_origin=shared_origin,
            exit_every=self.exit_every)
        best_t = jnp.where(self._visited(mask), best_t, jnp.inf)
        return intersect.Hits(t=best_t,
                              tri=jnp.minimum(best_i, scene.p0.shape[0] - 1),
                              valid=jnp.isfinite(best_t))

    def _light_masks(self, prep, live_l, block_lo, block_hi):
        """Per-light conservative cull masks for the shadow queries. Dead
        rays (misses, and rays this light provably cannot colour —
        shade.light_gates) are masked out of the tile hulls
        (cull.tile_intervals_packed live=) so they never widen the work
        lists."""
        smasks, sentries = [], []
        for li in range(prep.q.shape[0]):
            ti = cull.tile_intervals_packed(prep.q_rev[li], self.rt,
                                            live=live_l[li], use_tmax=True)
            m, e = cull.block_mask_with_entry(ti, block_lo, block_hi)
            smasks.append(m)
            sentries.append(e)
        nb = block_lo.shape[0]
        smasks = (jnp.stack(smasks) if smasks
                  else jnp.zeros((0, self.n_tiles, nb), bool))
        sentries = (jnp.stack(sentries) if sentries
                    else jnp.zeros((0, self.n_tiles, nb), jnp.float32))
        return smasks, sentries

    def _stage_b_fn(self, w_pad: int, scene: SceneArrays, tris_packed,
                    shade_tbl, block_lo, block_hi, rays, mask, entry):
        no_excl = jnp.full((self.n_pad,), -1, jnp.int32)
        # Primary rays share the camera origin (rays rows 0..2 are a
        # broadcast of cam.pos): fold it into the triangle rows per frame
        # and run the cheaper shared-origin kernel.
        tris_cam = bsr_trace.pack_tris_origin(tris_packed, rays[0:3, 0])
        hits = self._nearest(w_pad, scene, tris_cam, rays, no_excl,
                             mask, entry, shared_origin=True)
        prep = shade.prepare_packed(scene, rays, hits, self.cfg,
                                    table=shade_tbl)
        live_l = shade.light_gates(scene, rays[0:3, 0], prep, hits.valid)
        smasks, sentries = self._light_masks(prep, live_l,
                                             block_lo, block_hi)
        return hits, prep, live_l, smasks, sentries, smasks.sum()

    # -- stage C: shadow queries + shading -------------------------------

    def _lit(self, w_pad_sh: int, tris_lights, prep, hits, live_l,
             smasks, sentries):
        """All lights' shadow queries in ONE bsr_any launch: the (light,
        tile) pairs become the tile axis of a single work list (one
        compaction sort, one kernel, one set of padding slots instead of
        one each per light). Dead rays (per-light: misses + zero-potential-
        contribution, shade.light_gates) pre-seed the accumulator as 'hit'
        so fully-occluded tiles early-exit on live rays alone."""
        n_lights = prep.q.shape[0]
        if n_lights == 0:
            return jnp.zeros((0, self.n_pad), bool)
        nb = smasks.shape[2]
        n_tris = tris_lights.shape[0] // max(n_lights, 1)
        mask = smasks.reshape(n_lights * self.n_tiles, -1)
        entry = sentries.reshape(n_lights * self.n_tiles, -1)
        wl = cull.compact_worklist(mask, w_pad_sh, entry=entry)
        q = prep.q_rev.transpose(1, 0, 2).reshape(8, n_lights * self.n_pad)
        # Each light's rays share its origin; the per-light origin-folded
        # triangle copies sit at block offset light*nb (column light*T).
        light_of = wl.tile_ids // self.n_tiles
        block_ids = light_of * nb + wl.block_ids
        excl = (hits.tri[None, :]
                + (jnp.arange(n_lights, dtype=jnp.int32) * n_tris)[:, None]
                ).reshape(-1)
        dead = (~live_l).reshape(-1).astype(jnp.int32)
        hit = bsr_trace.bsr_any(
            q, excl, tris_lights, wl.tile_ids, block_ids,
            wl.entry, wl.count, dead, rt=self.rt, tb=self.tb,
            w_pad=w_pad_sh, interpret=self.interpret, shared_origin=True,
            exit_every=self.exit_every)
        hit = hit.reshape(n_lights, self.n_pad)
        visited = jnp.repeat(smasks.any(axis=2), self.rt, axis=1)
        return jnp.where(visited, hit == 0, True)

    def _stage_c_fn(self, w_pad_sh: int, scene: SceneArrays, tris_lights,
                    cam: CameraArrays, hits, prep, live_l, smasks, sentries):
        lit = self._lit(w_pad_sh, tris_lights, prep, hits, live_l,
                        smasks, sentries)
        colours = shade.shade_core_packed(scene, cam.pos, prep, hits, lit)
        return self._assemble(colours)

    # -- multi-bounce stages ---------------------------------------------
    #
    # Whitted reflections on the block-sparse path (config 2 of
    # BASELINE.json; semantics identical to ops/render.py
    # trace_rays_bounced / the float64 oracle's _radiance). Each bounce is
    # one more BSR nearest query whose ray set is the previous bounce's
    # reflections, plus per-light BSR shadow queries; the radiance
    # accumulates as colour += throughput * phong_b with one final clamp.

    def _reflection_query(self, prep, hits, rays):
        """Reflected rays from the current hits (+ their cull mask)."""
        cfg = self.cfg
        n = prep.normal
        d = rays[3:6]
        d_dot_n = jnp.sum(d * n, axis=0)
        refl = d - 2.0 * d_dot_n[None, :] * n
        rlen = jnp.sqrt(jnp.sum(refl * refl, axis=0, keepdims=True))
        refl = refl / jnp.where(rlen > 0, rlen, 1.0)
        side = jnp.where(jnp.sum(n * refl, axis=0) >= 0.0, 1.0, -1.0)
        o = (prep.x + cfg.shadow_offset * refl
             + (cfg.shadow_normal_offset * side)[None, :] * n)
        r_rays = bsr_trace.pack_rays_rows(o, refl)
        # Dead rays (miss or zero-Ks material) are masked out of the tile
        # hulls; their (finite, garbage) ray data still traverses with live
        # tiles but contributes nothing (throughput is zeroed).
        live = hits.valid & jnp.any(prep.ks > 0.0, axis=0)
        ti = cull.tile_intervals_packed(r_rays, self.rt, live=live)
        mask, entry = cull.block_mask_with_entry(ti, self.block_lo,
                                                 self.block_hi)
        return r_rays, live, mask, entry, mask.sum()

    def _stage_bounce_fn(self, w_pad: int, scene: SceneArrays, tris_packed,
                         shade_tbl, block_lo, block_hi, rays, exclude,
                         mask, entry, view):
        """Nearest + shadow masks for an arbitrary packed ray set; also
        emits the next bounce's reflection query. `view` is the viewer the
        shading stage will use (the camera, or the previous hit points) —
        needed here so the light gates match the shading exactly."""
        hits = self._nearest(w_pad, scene, tris_packed, rays, exclude,
                             mask, entry)
        prep = shade.prepare_packed(scene, rays, hits, self.cfg,
                                    table=shade_tbl)
        live_l = shade.light_gates(scene, view, prep, hits.valid)
        smasks, sentries = self._light_masks(prep, live_l,
                                             block_lo, block_hi)
        r_rays, r_live, r_mask, r_entry, r_count = self._reflection_query(
            prep, hits, rays)
        return (hits, prep, live_l, smasks, sentries, smasks.sum(),
                r_rays, r_live, r_mask, r_entry, r_count)

    def _stage_shade_fn(self, w_pad_sh: int, scene: SceneArrays, tris_lights,
                        view, hits, prep, live_l, smasks, sentries):
        """Fused shadow query + phong for one bounce -> (3, C) local
        radiance rows (not yet throughput-weighted)."""
        lit = self._lit(w_pad_sh, tris_lights, prep, hits, live_l,
                        smasks, sentries)
        return shade.shade_core_packed(scene, view, prep, hits, lit)

    def render_bounced(self, camera, depth: int, block: bool = False):
        """Whitted multi-bounce render on the block-sparse path."""
        cam = camera.to_arrays() if isinstance(camera, Camera) else camera
        rays, mask, entry, count = self._stage_a(
            cam, self._perm, self.block_lo, self.block_hi)

        def jit_for(cache, key, fn, *static):
            f = cache.get(key)
            if f is None:
                f = jax.jit(functools.partial(fn, *static))
                cache[key] = f
            return f

        colour = jnp.zeros((3, self.n_pad), jnp.float32)
        throughput = jnp.ones((3, self.n_pad), jnp.float32)
        view = cam.pos
        exclude = jnp.full((self.n_pad,), -1, jnp.int32)
        pads_used = []
        counts_used = []

        for b in range(depth + 1):
            w_pad = _bucket(int(count))
            sb = jit_for(self._stage_b_cache, ("bounce", w_pad),
                         self._stage_bounce_fn, w_pad)
            (hits, prep, live_l, smasks, sentries, scount,
             r_rays, r_live, r_mask, r_entry, r_count) = sb(
                self.arrays, self.tris_packed, self.shade_tbl,
                self.block_lo, self.block_hi, rays, exclude, mask, entry,
                view)
            w_pad_sh = _bucket(int(scount))
            pads_used.append((w_pad, w_pad_sh))
            counts_used.append((int(count), int(scount)))
            sc = jit_for(self._stage_c_cache, ("shade", b > 0, w_pad_sh),
                         self._stage_shade_fn, w_pad_sh)
            local = sc(self.arrays, self.tris_lights, view, hits, prep,
                       live_l, smasks, sentries)
            colour = colour + throughput * local
            if b == depth:
                break
            throughput = jnp.where(hits.valid[None, :],
                                   throughput * prep.ks, 0.0)
            view = prep.x
            rays = r_rays
            exclude = hits.tri
            mask, entry, count = r_mask, r_entry, int(r_count)

        colour = jnp.clip(colour, 0.0, 1.0)
        img = self._assemble(colour)
        self._last_bounce_pads = tuple(pads_used)
        # Raw (unbucketed) counts: bucket sizing applies margins to these,
        # never to already-rounded pads (margin-on-rounded over-allocates
        # up to a granule and drifts from the culled path's discipline).
        self._last_bounce_counts = tuple(counts_used)
        if block:
            jax.block_until_ready(img)
        return img

    def _full_bounced_fn(self, pads: tuple, scene: SceneArrays, tris_packed,
                         tris_lights, shade_tbl, block_lo, block_hi, perm,
                         cam: CameraArrays):
        """Fused multi-bounce pipeline with fixed buckets (no host syncs).

        Also returns the true per-bounce work counts as a (B, 2) int32
        array [(primary cells, shadow cells) per bounce] so callers —
        including the sharded band renderer — can verify the frozen buckets
        still hold and refreeze on overflow instead of silently dropping
        candidate blocks.
        """
        rays, mask, entry, count = self._stage_a_fn(cam, perm, block_lo,
                                                    block_hi)
        colour = jnp.zeros((3, self.n_pad), jnp.float32)
        throughput = jnp.ones((3, self.n_pad), jnp.float32)
        view = cam.pos
        exclude = jnp.full((self.n_pad,), -1, jnp.int32)
        counts = []
        for b, (w_pad, w_pad_sh) in enumerate(pads):
            (hits, prep, live_l, smasks, sentries, scount,
             r_rays, _, r_mask, r_entry, r_count) = self._stage_bounce_fn(
                w_pad, scene, tris_packed, shade_tbl, block_lo, block_hi,
                rays, exclude, mask, entry, view)
            local = self._stage_shade_fn(w_pad_sh, scene, tris_lights, view,
                                         hits, prep, live_l, smasks, sentries)
            colour = colour + throughput * local
            counts.append(jnp.stack([count, scount]).astype(jnp.int32))
            if b + 1 == len(pads):
                break
            throughput = jnp.where(hits.valid[None, :],
                                   throughput * prep.ks, 0.0)
            view = prep.x
            rays = r_rays
            exclude = hits.tri
            mask, entry, count = r_mask, r_entry, r_count
        colour = jnp.clip(colour, 0.0, 1.0)
        return self._assemble(colour), jnp.stack(counts)

    def freeze_bounced(self, camera, depth: int, margin: float = 1.4):
        """Fuse the multi-bounce pipeline with buckets sized from one sync
        render's RAW counts x margin. Returns the fused render function;
        render(cam, verify=True) blocks to check the true per-bounce counts
        against the buckets and refreezes + rerenders on overflow (the
        multi-bounce analog of render_fast(verify=True))."""
        self.render_bounced(camera, depth, block=True)
        state = {}

        def freeze_from(counts):
            state["pads"] = tuple((_bucket(c, margin), _bucket(sc, margin))
                                  for (c, sc) in counts)
            state["fused"] = jax.jit(functools.partial(
                self._full_bounced_fn, state["pads"]))

        freeze_from(self._last_bounce_counts)

        def render(cam, verify: bool = False):
            c = cam.to_arrays() if isinstance(cam, Camera) else cam
            args = (self.arrays, self.tris_packed, self.tris_lights,
                    self.shade_tbl, self.block_lo, self.block_hi,
                    self._perm, c)
            img, counts = state["fused"](*args)
            if verify:
                got = np.asarray(counts)
                if any(g[0] > p[0] or g[1] > p[1]
                       for g, p in zip(got, state["pads"])):
                    freeze_from([tuple(g) for g in got])
                    img, _ = state["fused"](*args)
            return img

        render.pads = lambda: state["pads"]
        return render

    # -- public ----------------------------------------------------------

    def render(self, camera, block: bool = False):
        """Render a frame; returns a device array (H, W, 3) float32."""
        cam = camera.to_arrays() if isinstance(camera, Camera) else camera
        rays, mask, entry, count = self._stage_a(
            cam, self._perm, self.block_lo, self.block_hi)
        w_pad = _bucket(int(count))

        stage_b = self._stage_b_cache.get(w_pad)
        if stage_b is None:
            stage_b = jax.jit(functools.partial(self._stage_b_fn, w_pad))
            self._stage_b_cache[w_pad] = stage_b
        hits, prep, live_l, smasks, sentries, scount = stage_b(
            self.arrays, self.tris_packed, self.shade_tbl,
            self.block_lo, self.block_hi, rays, mask, entry)

        w_pad_sh = _bucket(int(scount))
        stage_c = self._stage_c_cache.get(w_pad_sh)
        if stage_c is None:
            stage_c = jax.jit(functools.partial(self._stage_c_fn, w_pad_sh))
            self._stage_c_cache[w_pad_sh] = stage_c
        img = stage_c(self.arrays, self.tris_lights, cam, hits, prep,
                      live_l, smasks, sentries)
        self._last_counts = (int(count), int(scount))
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

    def _full_fn(self, w_pad: int, w_pad_sh: int, scene: SceneArrays,
                 tris_packed, tris_lights, shade_tbl, block_lo, block_hi,
                 perm, cam: CameraArrays):
        rays, mask, entry, count = self._stage_a_fn(cam, perm, block_lo,
                                                    block_hi)
        hits, prep, live_l, smasks, sentries, scount = self._stage_b_fn(
            w_pad, scene, tris_packed, shade_tbl, block_lo, block_hi,
            rays, mask, entry)
        img = self._stage_c_fn(w_pad_sh, scene, tris_lights, cam, hits,
                               prep, live_l, smasks, sentries)
        return img, count, scount

    def freeze(self, camera=None, margin: float = 1.4) -> None:
        """Fix work-list buckets from the last sync render (running one if
        needed) and compile the fused no-sync pipeline."""
        if self._last_counts is None:
            if camera is None:
                raise ValueError("freeze() needs a camera for the sizing render")
            self.render(camera, block=True)
        count, scount = self._last_counts
        w_pad = _bucket(count, margin)
        w_pad_sh = _bucket(scount, margin)
        self._fused = jax.jit(functools.partial(self._full_fn, w_pad, w_pad_sh))
        self._frozen_pads = (w_pad, w_pad_sh)

    def render_fast(self, camera, verify: bool = False):
        """One fused dispatch, no host syncs. Returns a device array; with
        verify=True, blocks to check the frozen buckets still hold (and
        refreezes + rerenders if they overflowed)."""
        cam = camera.to_arrays() if isinstance(camera, Camera) else camera
        if self._fused is None:
            self.freeze(camera)
        img, count, scount = self._fused(
            self.arrays, self.tris_packed, self.tris_lights, self.shade_tbl,
            self.block_lo, self.block_hi, self._perm, cam)
        if verify:
            w_pad, w_pad_sh = self._frozen_pads
            c, sc = int(count), int(scount)
            if c > w_pad or sc > w_pad_sh:
                self._last_counts = (c, sc)
                self.freeze(camera)
                img, _, _ = self._fused(
                    self.arrays, self.tris_packed, self.tris_lights,
                    self.shade_tbl, self.block_lo, self.block_hi,
                    self._perm, cam)
        return img
