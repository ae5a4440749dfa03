"""Block-BVH-culled ring rendering: geometry rotation with per-step culling.

parallel/ring.py rotates triangle shards past resident rays with dense
matmuls — every resident ray against every rotating triangle, O(rays x T)
per device per frame. This module keeps the ring schedule (the
ring-attention analog: geometry blocks stream past pinned queries, nearest
hit folds as an online associative min) but culls each rotation step with
the interval test (ops/cull.py) and runs only surviving (tile, block) pairs
through the Pallas BSR kernels — pruning on *every* query, like the
reference's two-level R-trees (tracer.go:32, object.go:76).

Schedule per device (r_loc resident rays, T/N rotating triangles):
  phase 1 — N ring steps: cull resident ray tiles vs the CURRENT shard's
    block AABBs -> work list -> BSR nearest seeded with the carried
    (t, gid) accumulator (the kernels' min-gid tie-break makes the fold
    order-independent); gather the 32-wide shading row from the current
    shard's table where the candidate improved; ppermute the shard on.
  phase 2 — shadow: reversed per-light queries (light -> surface point) for
    resident rays; N more ring steps of cull -> BSR any-hit with the carried
    occlusion bits. Tile hulls are computed ONCE (queries are fixed during
    rotation); only the mask vs the rotating block AABBs changes per step.
  shade — local Phong from the carried rows (shade.shade_core_rows).

vs the halo schedule (parallel/halo_bvh.py): the ring moves GEOMETRY
(O(T/N x 50 f32) per step per device, N steps) and never moves rays; the
halo moves RAYS (O(rays) per frame) and never moves geometry. Halo wins
when rays << triangles (config 5); the ring wins when a frame's rays
outnumber resident triangles or when ray payloads are fat (many bounces).
Both must render identical images (the fold is exact).

Work-list buckets are static under shard_map; sized at build time from the
full-scene cull mask maxed over (ray-shard, geometry-shard) pairs — each
device meets every geometry shard during rotation, so the max over pairs
bounds every step.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from distributed_raytracer_tpu.models.camera import Camera, CameraArrays
from distributed_raytracer_tpu.models.scene import Scene
from distributed_raytracer_tpu.ops import cull, raygen, shade
from distributed_raytracer_tpu.ops.pallas import bsr_trace
from distributed_raytracer_tpu.parallel.halo_bvh import (
    DynGeometry, ShardedGeometry, _pad_to_shardable, apply_diff_sharded)
from distributed_raytracer_tpu.utils.config import RenderConfig, DEFAULT_CONFIG

AXIS = "ring"
_bucket = bsr_trace.bucket_w_pad


def _rotate(tree, n: int):
    perm = [(i, (i + 1) % n) for i in range(n)]
    return jax.tree.map(lambda a: jax.lax.ppermute(a, AXIS, perm), tree)


class RingCulledRenderer:
    """Geometry-rotation renderer with per-step block-BVH culling.

    Same bucket discipline as HaloCulledRenderer: static work lists sized
    from `sizing_camera` x `margin`; render(cam, verify=True) re-sizes on
    overflow instead of dropping candidate blocks.
    """

    def __init__(self, scene: Scene, width: int, height: int,
                 mesh: Optional[Mesh] = None,
                 sizing_camera: Optional[Camera] = None,
                 margin: float = 2.0, cfg: RenderConfig = DEFAULT_CONFIG,
                 block_size: int = 128, ray_tile: int = 512,
                 interpret: bool = False, dynamic: bool = False):
        if mesh is None:
            mesh = jax.make_mesh((len(jax.devices()),), (AXIS,))
        self.mesh = mesh
        self.n = int(mesh.devices.size)
        self.width, self.height, self.cfg = width, height, cfg
        self.rt, self.tb = ray_tile, block_size
        self.margin, self.interpret = margin, interpret

        # dynamic=True: per-object grouped bake for exact per-frame AABB
        # shifts under SceneDiff (render_dynamic below).
        if dynamic:
            (arrays, tree, obj_id, block_obj,
             obj_pos0) = scene.bake_bvh_grouped(block_size=block_size)
        else:
            arrays, tree = scene.bake_bvh(block_size=block_size)
        nb_orig = tree.num_blocks
        arrays, lo, hi = _pad_to_shardable(arrays, tree, self.n)
        self.nb_ext = lo.shape[0]
        self.nb_loc = self.nb_ext // self.n
        self.t_loc = self.nb_loc * block_size
        self.lights_pos = jnp.asarray(arrays.light_pos)
        self.lights_col = jnp.asarray(arrays.light_col)
        self.n_lights = int(self.lights_pos.shape[0])

        tris16 = np.asarray(bsr_trace.pack_tris(arrays))
        table32 = np.asarray(shade.pack_table(arrays))
        base = (np.arange(self.n, dtype=np.int32) * self.t_loc)

        sh = lambda spec: NamedSharding(mesh, spec)
        self.geom = ShardedGeometry(
            tris16=jax.device_put(tris16, sh(P(AXIS))),
            table32=jax.device_put(table32, sh(P(AXIS))),
            block_lo=jax.device_put(lo, sh(P(AXIS))),
            block_hi=jax.device_put(hi, sh(P(AXIS))),
            base=jax.device_put(base, sh(P(AXIS))),
        )
        if dynamic:
            pad_b = lo.shape[0] - nb_orig
            obj_id = np.pad(np.asarray(obj_id, np.int32),
                            (0, pad_b * block_size))
            block_obj = np.pad(np.asarray(block_obj, np.int32), (0, pad_b))
            self._dyn = DynGeometry(
                obj_id=jax.device_put(obj_id, sh(P(AXIS))),
                block_obj=jax.device_put(block_obj, sh(P(AXIS))),
                obj_pos0=jax.device_put(
                    np.asarray(obj_pos0, np.float32), sh(P())))
        else:
            self._dyn = None
        self._full = (jnp.asarray(tris16), jnp.asarray(table32),
                      jnp.asarray(lo), jnp.asarray(hi))

        self.tile_w = 32
        self.tile_h = ray_tile // self.tile_w
        perm, _, n_pad = cull.tiled_ray_order(width, height,
                                              self.tile_w, self.tile_h)
        self.n_pad = n_pad
        nt = n_pad // ray_tile
        nt_ext = -(-nt // self.n) * self.n
        self.n_pad_ext = nt_ext * ray_tile
        if self.n_pad_ext > n_pad:
            perm = np.concatenate([perm, np.full(
                (self.n_pad_ext - n_pad,), width * height - 1, np.int32)])
        self.r_loc = self.n_pad_ext // self.n
        self.nt_loc = self.r_loc // ray_tile
        self._perm = jax.device_put(jnp.asarray(perm), sh(P()))

        camera = sizing_camera if sizing_camera is not None else scene.camera
        counts = self._sizing_counts(camera)
        self._freeze(counts)
        self._full = None
        self.last_counts = counts   # (2,) max (primary, shadow) pair cells

    # -- sizing (build time, one device, full geometry) ---------------------
    #
    # Every device meets every geometry shard during rotation, so the
    # per-step work list for (ray-shard d, step k) is exactly the full-scene
    # mask restricted to d's tile rows and shard (d+k)'s block columns. The
    # max over all (d, s) pairs therefore bounds every step of every device.

    def _per_pair(self, mask):
        """(nt_ext, NB_ext) mask -> (n, n) kept cells per (ray, geom) shard."""
        nt = mask.shape[0]
        return mask.reshape(self.n, nt // self.n, self.n,
                            self.nb_loc).sum(axis=(1, 3))

    def _sizing_counts(self, camera) -> np.ndarray:
        cam = camera.to_arrays() if isinstance(camera, Camera) else camera
        tris16, table32, blo, bhi = self._full

        def size_a(cam, perm):
            d_rows = raygen.ray_rows_flat(cam, self.width, self.height, perm)
            rays = bsr_trace.pack_rays_rows(cam.pos, d_rows)
            ti = cull.tile_intervals_packed(rays, self.rt)
            mask, entry = cull.block_mask_with_entry(ti, blo, bhi)
            return rays, mask, entry

        rays, mask, entry = jax.jit(size_a)(cam, self._perm)
        max_p = int(np.asarray(self._per_pair(mask)).max())
        w_full = _bucket(int(mask.sum()))

        def size_b(w_full, cam, rays, mask, entry):
            wl = cull.compact_worklist(mask, w_full, entry=entry)
            tris_cam = bsr_trace.pack_tris_origin(tris16, cam.pos)
            no_excl = jnp.full((self.n_pad_ext,), -1, jnp.int32)
            bt, bi = bsr_trace.bsr_nearest(
                rays, no_excl, tris_cam, wl.tile_ids, wl.block_ids, wl.entry,
                wl.count, rt=self.rt, tb=self.tb, w_pad=w_full,
                interpret=self.interpret, shared_origin=True)
            visited = jnp.repeat(mask.any(axis=1), self.rt)
            bt = jnp.where(visited, bt, jnp.inf)
            valid = jnp.isfinite(bt)
            g = table32[jnp.clip(bi, 0, table32.shape[0] - 1)].T
            prep = shade.prepare_packed_rows(self.lights_pos, rays,
                                             jnp.where(valid, bt, 0.0), g,
                                             self.cfg)
            live_l = shade.light_gates_rows(self.lights_col, cam.pos, prep,
                                            valid)
            per_ls = []
            for li in range(self.n_lights):
                ti_s = cull.tile_intervals_packed(
                    prep.q_rev[li], self.rt, live=live_l[li], use_tmax=True)
                smask, _ = cull.block_mask_with_entry(ti_s, blo, bhi)
                per_ls.append(self._per_pair(smask))
            return (jnp.stack(per_ls) if per_ls
                    else jnp.zeros((0, self.n, self.n), jnp.int32))

        per_ls = np.asarray(jax.jit(functools.partial(size_b, w_full))(
            cam, rays, mask, entry))
        max_s = int(per_ls.max()) if per_ls.size else 0
        return np.asarray([max_p, max_s])

    # -- the sharded frame ---------------------------------------------------

    def _shard_fn(self, w_pad: int, w_pad_sh: int, cam: CameraArrays,
                  geom: ShardedGeometry, perm, lights_pos, lights_col,
                  dyn=None, diff=None):
        n, rt, tb = self.n, self.rt, self.tb
        if diff is not None:
            # Fold the frame's diff into the resident shard BEFORE the
            # rotation starts: every shard holds diffed rows, so every
            # rotation step streams already-updated geometry
            # (environment.go:73-98's every-worker-applies-every-diff).
            geom = apply_diff_sharded(geom, dyn, diff)
        me = jax.lax.axis_index(AXIS)

        # Resident rays: this device's contiguous run of screen tiles.
        idx = jax.lax.dynamic_slice(perm, (me * self.r_loc,), (self.r_loc,))
        d_rows = raygen.ray_rows_flat(cam, self.width, self.height, idx)
        rays = bsr_trace.pack_rays_rows(cam.pos, d_rows)    # (8, r_loc)
        ti = cull.tile_intervals_packed(rays, rt)
        no_excl = jnp.full((self.r_loc,), -1, jnp.int32)

        # (check_vma=False: no varying-axis typing, so plain constants can
        # seed the scan carries directly.)
        init = (
            jnp.full((self.r_loc,), jnp.inf, jnp.float32),           # t
            jnp.full((self.r_loc,), bsr_trace.BIG_IDX, jnp.int32),   # gid
            jnp.zeros((self.r_loc, 32), jnp.float32),                # rows
            jnp.int32(0),                                            # max cells
        )

        # Phase 1: rotate geometry N times, folding culled nearest hits.
        def step1(carry, _):
            (bt, bi, g, cmax), sh = carry
            mask, entry = cull.block_mask_with_entry(ti, sh.block_lo,
                                                     sh.block_hi)
            cmax = jnp.maximum(cmax, mask.sum().astype(jnp.int32))
            wl = cull.compact_worklist(mask, w_pad, entry=entry)
            tris_cam = bsr_trace.pack_tris_origin(sh.tris16, cam.pos)
            nt, ni = bsr_trace.bsr_nearest(
                rays, no_excl, tris_cam, wl.tile_ids, wl.block_ids, wl.entry,
                wl.count, init_t=bt, init_i=bi, gid_base=sh.base[0],
                rt=rt, tb=tb, w_pad=w_pad, interpret=self.interpret,
                shared_origin=True)
            visited = jnp.repeat(mask.any(axis=1), rt)
            nt = jnp.where(visited, nt, bt)
            ni = jnp.where(visited, ni, bi)
            improved = (nt < bt) | ((nt == bt) & (ni < bi))
            loc = jnp.clip(ni - sh.base[0], 0, sh.tris16.shape[0] - 1)
            g = jnp.where(improved[:, None], sh.table32[loc], g)
            return ((nt, ni, g, cmax), _rotate(sh, n)), None

        ((best_t, best_i, best_g, count_p), geom_back), _ = jax.lax.scan(
            step1, (init, geom), None, length=n)
        valid = jnp.isfinite(best_t)

        # Phase 2: shadow rotation. Queries fixed; hulls computed once.
        prep = shade.prepare_packed_rows(
            lights_pos, rays, jnp.where(valid, best_t, 0.0),
            best_g.T, self.cfg)
        live_l = shade.light_gates_rows(lights_col, cam.pos, prep, valid)
        excl = jnp.where(valid, best_i, -1)
        tis = [cull.tile_intervals_packed(prep.q_rev[li], rt,
                                          live=live_l[li], use_tmax=True)
               for li in range(self.n_lights)]

        def step2(carry, _):
            (hit, cmax), sh = carry
            new = []
            for li in range(self.n_lights):
                smask, sentry = cull.block_mask_with_entry(
                    tis[li], sh.block_lo, sh.block_hi)
                cmax = jnp.maximum(cmax, smask.sum().astype(jnp.int32))
                swl = cull.compact_worklist(smask, w_pad_sh, entry=sentry)
                tris_l = bsr_trace.pack_tris_origin(sh.tris16,
                                                    lights_pos[li])
                h = bsr_trace.bsr_any(
                    prep.q_rev[li], excl, tris_l, swl.tile_ids, swl.block_ids,
                    swl.entry, swl.count, init=hit[li], gid_base=sh.base[0],
                    rt=rt, tb=tb, w_pad=w_pad_sh, interpret=self.interpret,
                    shared_origin=True)
                new.append(jnp.where(jnp.repeat(smask.any(axis=1), rt),
                                     h, hit[li]))
            hit = jnp.stack(new) if new else hit
            return ((hit, cmax), _rotate(sh, n)), None

        hit0 = jnp.zeros((self.n_lights, self.r_loc), jnp.int32)
        ((hit, count_s), _), _ = jax.lax.scan(
            step2, ((hit0, jnp.int32(0)), geom_back), None, length=n)
        lit = hit == 0

        colour = shade.shade_core_rows(lights_col, cam.pos, prep,
                                       valid, lit)
        counts = jnp.stack([count_p, count_s])[None, :]     # (1, 2)
        return colour, counts

    def _freeze(self, counts: np.ndarray) -> None:
        from distributed_raytracer_tpu.models.scene import SceneDiff

        self.w_pad = _bucket(int(counts[0]), self.margin)
        self.w_pad_sh = _bucket(int(counts[1]), self.margin)
        fn = functools.partial(self._shard_fn, self.w_pad, self.w_pad_sh)
        geom_specs = ShardedGeometry(
            tris16=P(AXIS), table32=P(AXIS), block_lo=P(AXIS),
            block_hi=P(AXIS), base=P(AXIS))
        self._render_jit = jax.jit(shard_map(
            fn, mesh=self.mesh,
            in_specs=(P(), geom_specs, P(), P(), P()),
            out_specs=(P(None, AXIS), P(AXIS)),
            check_vma=False,
        ))
        if self._dyn is not None:
            dyn_specs = DynGeometry(obj_id=P(AXIS), block_obj=P(AXIS),
                                    obj_pos0=P())
            diff_specs = SceneDiff(*(P() for _ in SceneDiff._fields))
            self._render_dyn_jit = jax.jit(shard_map(
                fn, mesh=self.mesh,
                in_specs=(P(), geom_specs, P(), P(), P(), dyn_specs,
                          diff_specs),
                out_specs=(P(None, AXIS), P(AXIS)),
                check_vma=False,
            ))

    # -- public --------------------------------------------------------------

    def device_fn(self, cam: CameraArrays):
        return self._render_jit(cam, self.geom, self._perm,
                                self.lights_pos, self.lights_col)

    def _assemble(self, rows: jnp.ndarray) -> np.ndarray:
        tw, th = self.tile_w, self.tile_h
        tx, ty = -(-self.width // tw), -(-self.height // th)
        img = np.asarray(rows)[:, :self.n_pad]
        img = img.reshape(3, ty, tx, th, tw).transpose(1, 3, 2, 4, 0)
        img = img.reshape(ty * th, tx * tw, 3)
        return img[:self.height, :self.width]

    def render(self, camera, verify: bool = False) -> np.ndarray:
        cam = camera.to_arrays() if isinstance(camera, Camera) else camera
        rows, counts = self.device_fn(cam)
        if verify:
            c = np.asarray(counts)
            if int(c[:, 0].max()) > self.w_pad or \
                    int(c[:, 1].max()) > self.w_pad_sh:
                self._freeze(np.asarray([c[:, 0].max(), c[:, 1].max()]))
                rows, counts = self.device_fn(cam)
        c = np.asarray(counts)
        self.last_counts = np.asarray([c[:, 0].max(), c[:, 1].max()])
        return self._assemble(rows)

    def render_dynamic(self, camera, diff, verify: bool = False):
        """One sharded ring dispatch with the frame's SceneDiff folded
        into each shard before rotation (requires dynamic=True)."""
        from distributed_raytracer_tpu.models.scene import SceneDiff

        if self._dyn is None:
            raise ValueError("build with dynamic=True for render_dynamic")
        cam = camera.to_arrays() if isinstance(camera, Camera) else camera
        diff = SceneDiff(*(jnp.asarray(a, jnp.float32) for a in diff))
        args = (cam, self.geom, self._perm, diff.light_pos, diff.light_col,
                self._dyn, diff)
        rows, counts = self._render_dyn_jit(*args)
        if verify:
            c = np.asarray(counts)
            if int(c[:, 0].max()) > self.w_pad or \
                    int(c[:, 1].max()) > self.w_pad_sh:
                self._freeze(np.asarray([c[:, 0].max(), c[:, 1].max()]))
                rows, counts = self._render_dyn_jit(*args)
        c = np.asarray(counts)
        self.last_counts = np.asarray([c[:, 0].max(), c[:, 1].max()])
        return self._assemble(rows)
