"""Block-sparse ray-triangle traversal kernels (Pallas TPU).

The hot path of the renderer: given a flat work list of (ray-tile,
tri-block) pairs from ops/cull.py, each grid step DMAs one triangle block
and one ray tile into VMEM, evaluates the Baldwin–Weber intersection for all
(ray, tri) pairs on the VPU, and folds the result into an online per-ray
nearest-hit (or any-hit) accumulator — the SpMV/BSR schedule from
BASELINE.json, replacing the reference's per-ray R-tree recursion
(object.go:76, tracer.go:32).

Mechanics:
  - `PrefetchScalarGridSpec` prefetches the work list into SMEM; BlockSpec
    index maps read it to drive DMA (index-driven gather, no host control).
  - The work list is tile-major, so consecutive grid steps revisit the same
    output block and Pallas keeps the accumulator in VMEM, writing back once
    per tile run.
  - Accumulators are *carried*: the previous accumulator arrays are inputs,
    and the first grid step of each tile run combines with them instead of
    the (stale) output block. This makes every visit idempotent — work-list
    padding replays the last entry harmlessly, unvisited ray tiles keep
    their initial miss value, and long work lists can be split into
    SMEM-sized segments chained through the carry (jax.lax.scan).

Layouts (see pack helpers): rays [8, R] f32 rows (ox,oy,oz,dx,dy,dz,tmax,0);
triangles [16, T] f32 rows (nx,ny,nz,plane_d, ku.xyz,c_u, kv.xyz,c_v, 0...).
Boundary semantics identical to ops/intersect.py (same BARY_EPS expansion).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from distributed_raytracer_tpu.ops.intersect import BARY_EPS

BIG_IDX = 2 ** 30      # plain int: jnp scalars would be captured tracer constants
SEGMENT = 16384        # work items per pallas_call (3 x 64KB of SMEM prefetch)


# ---------------------------------------------------------------------------
# Packing helpers
# ---------------------------------------------------------------------------

def pack_tris(scene_arrays) -> np.ndarray:
    """[16, T] float32 triangle rows for the kernels (static per scene)."""
    a = scene_arrays
    rows = [
        a.geo_n[:, 0], a.geo_n[:, 1], a.geo_n[:, 2], a.plane_d,
        a.k_u[:, 0], a.k_u[:, 1], a.k_u[:, 2], a.c_u,
        a.k_v[:, 0], a.k_v[:, 1], a.k_v[:, 2], a.c_v,
    ]
    t = a.p0.shape[0]
    packed = np.zeros((16, t), dtype=np.float32)
    for i, r in enumerate(rows):
        packed[i] = np.asarray(r, np.float32)
    return packed


def pack_rays_rows(origins: jnp.ndarray, d_rows: jnp.ndarray,
                   t_max: jnp.ndarray | None = None) -> jnp.ndarray:
    """[8, R] rays from (3, R) direction rows. origins (3, R) rows or (3,)
    shared. The row-native sibling of pack_rays (no transposes)."""
    r = d_rows.shape[1]
    o = (jnp.broadcast_to(origins[:, None], (3, r))
         if origins.ndim == 1 else origins)
    tmax = (jnp.full((1, r), jnp.inf, jnp.float32)
            if t_max is None else t_max.reshape(1, r))
    zero = jnp.zeros((1, r), jnp.float32)
    return jnp.concatenate([o, d_rows, tmax, zero], axis=0)


def pack_rays(origins: jnp.ndarray, dirs: jnp.ndarray,
              t_max: jnp.ndarray | None = None) -> jnp.ndarray:
    """[8, R] float32 ray rows. origins (R,3) or (3,) shared."""
    r = dirs.shape[0]
    if origins.ndim == 1:
        origins = jnp.broadcast_to(origins[None, :], (r, 3))
    tmax = jnp.full((r,), jnp.inf, jnp.float32) if t_max is None else t_max
    zero = jnp.zeros((r,), jnp.float32)
    return jnp.stack([
        origins[:, 0], origins[:, 1], origins[:, 2],
        dirs[:, 0], dirs[:, 1], dirs[:, 2], tmax, zero,
    ])


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _pair_math(rays_ref, tris_ref):
    """Shared (TB, RT) intersection math; returns (t, valid, gid_local)."""
    def row(ref, r):  # [1, RT] lane vector
        return ref[r:r + 1, :]

    def col(r):       # [TB, 1] sublane vector from a triangle row
        return jnp.transpose(tris_ref[r:r + 1, :])

    ox, oy, oz = row(rays_ref, 0), row(rays_ref, 1), row(rays_ref, 2)
    dx, dy, dz = row(rays_ref, 3), row(rays_ref, 4), row(rays_ref, 5)

    nx, ny, nz, pd = col(0), col(1), col(2), col(3)
    kux, kuy, kuz, cu = col(4), col(5), col(6), col(7)
    kvx, kvy, kvz, cv = col(8), col(9), col(10), col(11)

    den = nx * dx + ny * dy + nz * dz            # (TB, RT)
    o_n = nx * ox + ny * oy + nz * oz
    t = (pd - o_n) / den
    u = (kux * ox + kuy * oy + kuz * oz + cu) + t * (kux * dx + kuy * dy + kuz * dz)
    v = (kvx * ox + kvy * oy + kvz * oz + cv) + t * (kvx * dx + kvy * dy + kvz * dz)

    eps = BARY_EPS
    valid = ((den != 0.0) & (t >= 0.0)
             & (u >= -eps) & (u <= 1.0 + eps)
             & (u + v >= -eps) & (u + v <= 1.0 + eps)
             & (v >= -eps))
    gid_local = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    return t, valid, gid_local


def _nearest_kernel(tile_ids, block_ids, first, entry, nreal, rays_ref,
                    excl_ref, tris_ref, prev_t_ref, prev_i_ref, out_t_ref,
                    out_i_ref, *, tb: int):
    w = pl.program_id(0)

    # First step of a tile run: seed the VMEM accumulator from the carry.
    # Always runs (the block is uninitialized memory before the first write).
    @pl.when(first[w] == 1)
    def _():
        out_t_ref[:, :] = prev_t_ref[:, :]
        out_i_ref[:, :] = prev_i_ref[:, :]

    # Padding slots (work-list replays past the real count) skip all compute;
    # their index maps repeat the previous block, so they trigger no DMA
    # either — a padded-to-pow2 work list costs ~nothing beyond its length.
    live = w < nreal[0]
    # Front-to-back early exit: the work list sorts each tile's blocks by
    # conservative entry distance, so once every ray's current-best hit is
    # closer than this block's entry, no later block can improve anything.
    # (1e-4 slack guards the f32 interval arithmetic of the bound.)
    worth_it = entry[w] <= jnp.max(out_t_ref[:, :]) + 1e-4

    @pl.when(live & worth_it)
    def _():
        t, valid, gid_local = _pair_math(rays_ref, tris_ref)
        gid = block_ids[w] * tb + gid_local
        valid = valid & (gid != excl_ref[0:1, :])
        cand = jnp.where(valid, t, jnp.inf)
        m = jnp.min(cand, axis=0, keepdims=True)                   # (1, RT)
        sel = jnp.min(jnp.where(cand == m, gid, BIG_IDX), axis=0, keepdims=True)
        better = m < out_t_ref[:, :]
        out_t_ref[:, :] = jnp.where(better, m, out_t_ref[:, :])
        out_i_ref[:, :] = jnp.where(better, sel, out_i_ref[:, :])


def _any_kernel(tile_ids, block_ids, first, entry, nreal, rays_ref, excl_ref,
                tris_ref, prev_ref, out_ref, *, tb: int):
    w = pl.program_id(0)

    @pl.when(first[w] == 1)
    def _():
        out_ref[:, :] = prev_ref[:, :]

    live = w < nreal[0]
    # Early exit: once every ray in the tile is shadowed, remaining blocks
    # are no-ops (front-to-back order makes this fire early — near blockers
    # are tested first).
    not_done = jnp.min(out_ref[:, :]) == 0

    @pl.when(live & not_done)
    def _():
        t, valid, gid_local = _pair_math(rays_ref, tris_ref)
        gid = block_ids[w] * tb + gid_local
        valid = valid & (gid != excl_ref[0:1, :])
        tmax = rays_ref[6:7, :]
        hit = jnp.max(jnp.where(valid & (t <= tmax), 1, 0), axis=0, keepdims=True)
        out_ref[:, :] = jnp.maximum(out_ref[:, :], hit)


def _grid_spec(w_seg: int, rt: int, tb: int, n_acc: int):
    def ray_map(w, t_ids, b_ids, first, entry, nreal):
        return (0, t_ids[w])

    def tri_map(w, t_ids, b_ids, first, entry, nreal):
        return (0, b_ids[w])

    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(w_seg,),
        in_specs=[
            pl.BlockSpec((8, rt), ray_map),      # rays
            pl.BlockSpec((1, rt), ray_map),      # exclude ids
            pl.BlockSpec((16, tb), tri_map),     # triangle block
        ] + [pl.BlockSpec((1, rt), ray_map) for _ in range(n_acc)],  # carries
        out_specs=tuple(pl.BlockSpec((1, rt), ray_map) for _ in range(n_acc)),
    )


def _segment_first(tile_ids: jnp.ndarray) -> jnp.ndarray:
    """First-occurrence flags within one segment. Marking a replayed entry
    'first' is safe (it folds into the carry, which already has its result),
    so segment boundaries need no global knowledge."""
    head = jnp.ones((1,), jnp.int32)
    rest = (tile_ids[1:] != tile_ids[:-1]).astype(jnp.int32)
    return jnp.concatenate([head, rest])


def _run_segments(kernel, n_acc, init, rays_packed, exclude, tris_packed,
                  tile_ids, block_ids, entry, count, *, rt, tb, w_pad,
                  interpret):
    r = rays_packed.shape[1]
    excl2 = exclude[None, :]
    out_shape = tuple(jax.ShapeDtypeStruct((1, r), a.dtype) for a in init)
    n_seg = -(-w_pad // SEGMENT)
    w_seg = min(w_pad, SEGMENT)
    grid_spec = _grid_spec(w_seg, rt, tb, n_acc)

    def one_segment(carry, seg_start):
        t_ids = jax.lax.dynamic_slice(tile_ids, (seg_start,), (w_seg,))
        b_ids = jax.lax.dynamic_slice(block_ids, (seg_start,), (w_seg,))
        ent = jax.lax.dynamic_slice(entry, (seg_start,), (w_seg,))
        first = _segment_first(t_ids)
        nreal = jnp.clip(count - seg_start, 0, w_seg).astype(jnp.int32)[None]
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(t_ids, b_ids, first, ent, nreal, rays_packed, excl2, tris_packed,
          *carry)
        return outs, None

    if n_seg == 1:
        carry, _ = one_segment(init, 0)
    else:
        starts = jnp.arange(n_seg, dtype=jnp.int32) * w_seg
        carry, _ = jax.lax.scan(one_segment, init, starts)
    return carry


@functools.partial(jax.jit, static_argnames=("rt", "tb", "w_pad", "interpret"))
def bsr_nearest(rays_packed, exclude, tris_packed, tile_ids, block_ids, entry,
                count=None, *, rt: int, tb: int, w_pad: int,
                interpret: bool = False):
    """Nearest hit over the work list: (best_t (R,), best_idx (R,)).

    Outputs are defined ONLY for ray tiles that appear in the work list —
    unvisited output blocks are never written (undefined memory). Callers
    mask by per-tile visited flags (the cull guarantees unvisited tiles hit
    nothing). `count` = number of real work items; padding slots past it are
    skipped in-kernel (None = treat all w_pad as real).
    """
    r = rays_packed.shape[1]
    if count is None:
        count = jnp.int32(w_pad)
    init = (jnp.full((1, r), jnp.inf, jnp.float32),
            jnp.full((1, r), BIG_IDX, jnp.int32))
    out_t, out_i = _run_segments(
        functools.partial(_nearest_kernel, tb=tb), 2, init,
        rays_packed, exclude, tris_packed, tile_ids, block_ids, entry, count,
        rt=rt, tb=tb, w_pad=w_pad, interpret=interpret)
    return out_t[0], out_i[0]


@functools.partial(jax.jit, static_argnames=("rt", "tb", "w_pad", "interpret"))
def bsr_any(rays_packed, exclude, tris_packed, tile_ids, block_ids, entry,
            count=None, *, rt: int, tb: int, w_pad: int,
            interpret: bool = False):
    """Any-hit (shadow) query with per-ray t_max. Returns int32 (R,) 0/1.

    Same visited-tiles-only output contract as bsr_nearest.
    """
    r = rays_packed.shape[1]
    if count is None:
        count = jnp.int32(w_pad)
    init = (jnp.zeros((1, r), jnp.int32),)
    (out,) = _run_segments(
        functools.partial(_any_kernel, tb=tb), 1, init,
        rays_packed, exclude, tris_packed, tile_ids, block_ids, entry, count,
        rt=rt, tb=tb, w_pad=w_pad, interpret=interpret)
    return out[0]
