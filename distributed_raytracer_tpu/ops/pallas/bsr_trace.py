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
triangles [T, 16] f32 columns (nx,ny,nz,plane_d, ku.xyz,c_u, kv.xyz,c_v,
0...) — triangles on the SUBLANE axis. The earlier [16, T] layout needed 12
(1,tb)->(tb,1) transposes per grid step to build the sublane vectors the
(TB, RT) pair math broadcasts from; those relayouts were ~0.6us of every
~1.7us step (measured on v5e). With [T, 16] each coefficient is a direct
(tb, 1) column slice and the step cost drops ~35%.
Boundary semantics identical to ops/intersect.py (same BARY_EPS expansion).

MXU offload (shared-origin kernels): when every ray of a launch shares one
origin (primary rays from the camera, shadow rays reversed from a point
light), the only per-(ray, tri) dot products left are the three direction
dots n.d, ku.d, kv.d — 15 of the ~46 VPU ops per pair. Those three dots are
ONE matmul: A (3*tb, 8) @ rays (8, RT), where A stacks [n; ku; kv] per
block with the xyz coefficients in columns 3:6 (aligned to the d rows of
the packed rays; all other columns zero, so the o/tmax rows contribute
nothing — which is why packed t_max is FINITE-big, never inf: 0*inf=NaN).
The matmul runs on the MXU *in parallel* with the VPU's remaining ~31
ops/pair, raising the theoretical pair-throughput roofline ~1.5x
(utils/profiling.SOL_GPAIRS_MXU_OFFLOAD) — though on real v5e the variant
measured SLOWER than all-VPU (K=8 underutilizes the systolic array), so it
ships behind CulledRenderer(use_mxu=True). A is STATIC per scene — it holds only
direction coefficients, which are translation-invariant — while the
origin-dependent scalars (num, a_u, a_v) ride a tiny (T, 8) side array
refolded per frame/per light (fold_origin_scal): the dynamic-diff path
(ops/render_dynamic.py) refolds only the scalars when objects move.
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
# "Unbounded" packed t_max. Finite on purpose: the MXU kernels multiply the
# whole (8, RT) ray block by a matrix whose t_max column is zero, and
# 0 * inf = NaN would poison every pair of the lane. All t <= t_max
# comparisons behave identically (t is at most scene-scale).
BIG_TMAX = 3.4e38


def bucket_w_pad(n: int, margin: float = 1.0) -> int:
    """Static work-list capacity for a measured count.

    Small counts round to a power of two (few recompiles while a scene
    warms up); larger ones to a 2048-multiple per segment — pow2 rounding
    wasted up to 2x of kernel grid at the 62K-tri benchmark's ~7K counts
    (skipped padding slots are cheap but not free, ~0.27us each on v5e).
    The result is always divisible by its segment count so _run_segments
    slices the work list exactly.
    """
    n = max(256, int(n * margin))
    if n <= 2048:
        return 1 << (n - 1).bit_length()
    n_seg = -(-n // SEGMENT)
    g = 2048 * n_seg
    return -(-n // g) * g


# ---------------------------------------------------------------------------
# Packing helpers
# ---------------------------------------------------------------------------

def pack_tris(scene_arrays) -> np.ndarray:
    """[T, 16] float32 triangle columns for the BSR kernels (static per
    scene). Triangles on the sublane axis: the kernels slice each
    coefficient as a (tb, 1) column with no per-step relayout. (The ring
    kernels use the transposed [16, T] layout, ops/pallas/ring_trace.py.)"""
    a = scene_arrays
    cols = [
        a.geo_n[:, 0], a.geo_n[:, 1], a.geo_n[:, 2], a.plane_d,
        a.k_u[:, 0], a.k_u[:, 1], a.k_u[:, 2], a.c_u,
        a.k_v[:, 0], a.k_v[:, 1], a.k_v[:, 2], a.c_v,
    ]
    t = a.p0.shape[0]
    packed = np.zeros((t, 16), dtype=np.float32)
    for i, c in enumerate(cols):
        packed[:, i] = np.asarray(c, np.float32)
    return packed


def pack_rays_rows(origins: jnp.ndarray, d_rows: jnp.ndarray,
                   t_max: jnp.ndarray | None = None) -> jnp.ndarray:
    """[8, R] rays from (3, R) direction rows. origins (3, R) rows or (3,)
    shared. The row-native sibling of pack_rays (no transposes)."""
    r = d_rows.shape[1]
    o = (jnp.broadcast_to(origins[:, None], (3, r))
         if origins.ndim == 1 else origins)
    tmax = (jnp.full((1, r), BIG_TMAX, jnp.float32)
            if t_max is None else t_max.reshape(1, r))
    zero = jnp.zeros((1, r), jnp.float32)
    return jnp.concatenate([o, d_rows, tmax, zero], axis=0)


@jax.jit
def pack_tris_origin(tris_packed: jnp.ndarray,
                     origin: jnp.ndarray) -> jnp.ndarray:
    """Per-frame triangle rows for the shared-origin kernels.

    When every ray in a launch has the SAME origin o (primary rays from the
    camera; shadow rays reversed to start at their point light), the
    origin-dependent dot products of Baldwin-Weber are per-triangle scalars:
        num  = plane_d - n.o        (t = num / n.d)
        a_u  = k_u.o + c_u          (u = a_u + t * k_u.d)
        a_v  = k_v.o + c_v
    Precomputing them here (one tiny dense op over all T triangles) removes
    ~25% of the per-(ray, tri) VPU work from the hot kernels.

    Input: the static (T, 16) pack_tris columns. Output columns:
      [nx, ny, nz, num, kux, kuy, kuz, a_u, kvx, kvy, kvz, a_v, 0...]
    """
    o = origin.reshape(1, 3)
    n, pd = tris_packed[:, 0:3], tris_packed[:, 3:4]
    ku, cu = tris_packed[:, 4:7], tris_packed[:, 7:8]
    kv, cv = tris_packed[:, 8:11], tris_packed[:, 11:12]
    num = pd - jnp.sum(n * o, axis=1, keepdims=True)
    au = jnp.sum(ku * o, axis=1, keepdims=True) + cu
    av = jnp.sum(kv * o, axis=1, keepdims=True) + cv
    pad = jnp.zeros((tris_packed.shape[0], 4), jnp.float32)
    return jnp.concatenate([n, num, ku, au, kv, av, pad], axis=1)


def pack_dirs(tris_packed, tb: int, xp=np):
    """Static MXU direction matrix A: (3T, 8) from the (T, 16) pack_tris
    columns (works on either layout — cols 0:3/4:7/8:11 are n/k_u/k_v in
    both). Per block b, rows [3b*tb, 3b*tb+tb) hold n, the next tb rows
    k_u, the next tb rows k_v, each with xyz in COLUMNS 3:6 (the d rows of
    the packed rays) and zeros elsewhere. A is translation-invariant, so
    the dynamic-diff renderer never refolds it."""
    t = tris_packed.shape[0]
    if t % tb:
        raise ValueError(f"triangle count {t} not a multiple of tb={tb}")
    nb = t // tb
    blk = tris_packed.reshape(nb, tb, 16)
    if xp is np:
        a = np.zeros((nb, 3, tb, 8), np.float32)
        a[:, 0, :, 3:6] = blk[:, :, 0:3]
        a[:, 1, :, 3:6] = blk[:, :, 4:7]
        a[:, 2, :, 3:6] = blk[:, :, 8:11]
    else:
        coeff = xp.stack([blk[:, :, 0:3], blk[:, :, 4:7], blk[:, :, 8:11]],
                         axis=1)                      # (nb, 3, tb, 3)
        a = xp.zeros((nb, 3, tb, 8), xp.float32)
        a = a.at[:, :, :, 3:6].set(coeff)
    return a.reshape(3 * t, 8)


@jax.jit
def fold_origin_scal(tris_packed: jnp.ndarray,
                     origin: jnp.ndarray) -> jnp.ndarray:
    """Per-origin scalar triple for the MXU shared-origin kernels: (T, 8)
    with columns [num, a_u, a_v, 0...] where
        num = plane_d - n.o, a_u = k_u.o + c_u, a_v = k_v.o + c_v
    (the origin-dependent parts of Baldwin-Weber; pack_tris_origin's math,
    shipped as a small side array instead of a full (T, 16) refold)."""
    o = origin.reshape(1, 3)
    n, pd = tris_packed[:, 0:3], tris_packed[:, 3]
    ku, cu = tris_packed[:, 4:7], tris_packed[:, 7]
    kv, cv = tris_packed[:, 8:11], tris_packed[:, 11]
    num = pd - jnp.sum(n * o, axis=1)
    au = jnp.sum(ku * o, axis=1) + cu
    av = jnp.sum(kv * o, axis=1) + cv
    zeros = jnp.zeros_like(num)
    return jnp.stack([num, au, av, zeros, zeros, zeros, zeros, zeros],
                     axis=1)


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

def _pair_math(rays_ref, tris_ref, shared_origin: bool):
    """Shared (TB, RT) intersection math; returns (t, valid, gid_local).

    shared_origin=True reads the pack_tris_origin layout (num/a_u/a_v
    pre-folded with the common ray origin); False reads the static
    pack_tris layout and per-ray origins from rays rows 0..2.
    """
    def row(ref, r):  # [1, RT] lane vector
        return ref[r:r + 1, :]

    def col(r):       # [TB, 1] sublane vector: direct column slice
        return tris_ref[:, r:r + 1]

    dx, dy, dz = row(rays_ref, 3), row(rays_ref, 4), row(rays_ref, 5)

    nx, ny, nz = col(0), col(1), col(2)
    kux, kuy, kuz = col(4), col(5), col(6)
    kvx, kvy, kvz = col(8), col(9), col(10)

    den = nx * dx + ny * dy + nz * dz            # (TB, RT)
    if shared_origin:
        t = col(3) / den                         # num / n.d
        u = col(7) + t * (kux * dx + kuy * dy + kuz * dz)
        v = col(11) + t * (kvx * dx + kvy * dy + kvz * dz)
    else:
        ox, oy, oz = row(rays_ref, 0), row(rays_ref, 1), row(rays_ref, 2)
        o_n = nx * ox + ny * oy + nz * oz
        t = (col(3) - o_n) / den
        u = ((kux * ox + kuy * oy + kuz * oz + col(7))
             + t * (kux * dx + kuy * dy + kuz * dz))
        v = ((kvx * ox + kvy * oy + kvz * oz + col(11))
             + t * (kvx * dx + kvy * dy + kvz * dz))

    eps = BARY_EPS
    valid = ((den != 0.0) & (t >= 0.0)
             & (u >= -eps) & (u <= 1.0 + eps)
             & (u + v >= -eps) & (u + v <= 1.0 + eps)
             & (v >= -eps))
    gid_local = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    return t, valid, gid_local


def _pair_math_mxu(rays_ref, trisA_ref, scal_ref, tb: int):
    """Shared-origin (TB, RT) intersection math with the three direction
    dots on the MXU: one (3tb, 8) @ (8, RT) matmul (runs concurrently with
    the VPU's remaining work). HIGHEST precision keeps the dots f32-exact
    (bf16x6 passes), matching the all-VPU kernels within 1 ulp."""
    dots = jax.lax.dot_general(
        trisA_ref[:, :], rays_ref[:, :],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)          # (3tb, RT)
    den = dots[0:tb]
    kud = dots[tb:2 * tb]
    kvd = dots[2 * tb:3 * tb]
    num = scal_ref[:, 0:1]
    au = scal_ref[:, 1:2]
    av = scal_ref[:, 2:3]
    t = num / den
    u = au + t * kud
    v = av + t * kvd
    eps = BARY_EPS
    valid = ((den != 0.0) & (t >= 0.0)
             & (u >= -eps) & (u <= 1.0 + eps)
             & (u + v >= -eps) & (u + v <= 1.0 + eps)
             & (v >= -eps))
    gid_local = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    return t, valid, gid_local


def _nearest_mxu_kernel(tile_ids, block_ids, ablock_ids, first, entry, nreal,
                        gid_base, rays_ref, excl_ref, trisA_ref, scal_ref,
                        prev_t_ref, prev_i_ref, out_t_ref, out_i_ref,
                        bound_ref, *, tb: int, exit_every: int = 0):
    w = pl.program_id(0)

    @pl.when(first[w] == 1)
    def _():
        out_t_ref[:, :] = prev_t_ref[:, :]
        out_i_ref[:, :] = prev_i_ref[:, :]
        if exit_every:
            bound_ref[0] = jnp.float32(jnp.inf)

    live = w < nreal[0]
    if exit_every:
        live = live & (entry[w] <= bound_ref[0] + 1e-4)

    @pl.when(live)
    def _():
        t, valid, gid_local = _pair_math_mxu(rays_ref, trisA_ref, scal_ref,
                                             tb)
        gid = gid_base[0] + block_ids[w] * tb + gid_local
        valid = valid & (gid != excl_ref[0:1, :])
        cand = jnp.where(valid, t, jnp.inf)
        m = jnp.min(cand, axis=0, keepdims=True)
        sel = jnp.min(jnp.where(cand == m, gid, BIG_IDX), axis=0,
                      keepdims=True)
        cur_t, cur_i = out_t_ref[:, :], out_i_ref[:, :]
        better = (m < cur_t) | ((m == cur_t) & (sel < cur_i))
        out_t_ref[:, :] = jnp.where(better, m, cur_t)
        out_i_ref[:, :] = jnp.where(better, sel, cur_i)
        if exit_every:
            @pl.when(jax.lax.rem(w, exit_every) == exit_every - 1)
            def _():
                bound_ref[0] = jnp.max(out_t_ref[:, :])


def _any_mxu_kernel(tile_ids, block_ids, ablock_ids, first, entry, nreal,
                    gid_base, rays_ref, excl_ref, trisA_ref, scal_ref,
                    prev_ref, out_ref, done_ref, *, tb: int,
                    exit_every: int = 0):
    w = pl.program_id(0)

    @pl.when(first[w] == 1)
    def _():
        out_ref[:, :] = prev_ref[:, :]
        if exit_every:
            done_ref[0] = jnp.int32(0)

    live = w < nreal[0]
    if exit_every:
        live = live & (done_ref[0] == 0)

    @pl.when(live)
    def _():
        t, valid, gid_local = _pair_math_mxu(rays_ref, trisA_ref, scal_ref,
                                             tb)
        gid = gid_base[0] + block_ids[w] * tb + gid_local
        valid = valid & (gid != excl_ref[0:1, :])
        tmax = rays_ref[6:7, :]
        hit = jnp.max(jnp.where(valid & (t <= tmax), 1, 0), axis=0,
                      keepdims=True)
        out_ref[:, :] = jnp.maximum(out_ref[:, :], hit)
        if exit_every:
            @pl.when(jax.lax.rem(w, exit_every) == exit_every - 1)
            def _():
                done_ref[0] = jnp.min(out_ref[:, :])


def _nearest_kernel(tile_ids, block_ids, first, entry, nreal, gid_base,
                    rays_ref, excl_ref, tris_ref, prev_t_ref, prev_i_ref,
                    out_t_ref, out_i_ref, bound_ref, *, tb: int,
                    shared_origin: bool, exit_every: int = 0):
    w = pl.program_id(0)

    # First step of a tile run: seed the VMEM accumulator from the carry.
    # Always runs (the block is uninitialized memory before the first write).
    @pl.when(first[w] == 1)
    def _():
        out_t_ref[:, :] = prev_t_ref[:, :]
        out_i_ref[:, :] = prev_i_ref[:, :]
        if exit_every:
            bound_ref[0] = jnp.float32(jnp.inf)

    # Padding slots (work-list replays past the real count) skip all compute;
    # their index maps repeat the previous block, so they trigger no DMA
    # either — a padded-to-pow2 work list costs ~nothing beyond its length.
    live = w < nreal[0]
    # Front-to-back early exit (exit_every=K): the work list sorts each
    # tile's blocks by conservative entry distance, so once every ray's
    # current-best hit is closer than this block's entry, no later block in
    # the tile can improve anything. A PER-STEP jnp.max(out_t) predicate
    # stalls the scalar core's DMA run-ahead on the vector core every step
    # (measured ~1.4us/step on v5e in round 1 — more than it saved), so the
    # bound lives in SMEM and refreshes only every K steps: the vector->
    # scalar sync amortizes K-fold while skipped steps still drop all pair
    # math. Correct for ANY work-list order (each item is tested against
    # its own exact entry; the bound only shrinks); the front-to-back sort
    # is what makes it effective. (1e-4 slack guards f32 interval math.)
    if exit_every:
        live = live & (entry[w] <= bound_ref[0] + 1e-4)

    @pl.when(live)
    def _():
        t, valid, gid_local = _pair_math(rays_ref, tris_ref, shared_origin)
        gid = gid_base[0] + block_ids[w] * tb + gid_local
        valid = valid & (gid != excl_ref[0:1, :])
        cand = jnp.where(valid, t, jnp.inf)
        m = jnp.min(cand, axis=0, keepdims=True)                   # (1, RT)
        sel = jnp.min(jnp.where(cand == m, gid, BIG_IDX), axis=0, keepdims=True)
        # Tie-break on min global id: matches the dense path's argmin
        # (first occurrence = lowest index) and makes cross-shard /
        # cross-rotation folds order-independent (parallel/ring.py,
        # parallel/halo.py fold shards in different orders per device).
        cur_t, cur_i = out_t_ref[:, :], out_i_ref[:, :]
        better = (m < cur_t) | ((m == cur_t) & (sel < cur_i))
        out_t_ref[:, :] = jnp.where(better, m, cur_t)
        out_i_ref[:, :] = jnp.where(better, sel, cur_i)
        if exit_every:
            @pl.when(jax.lax.rem(w, exit_every) == exit_every - 1)
            def _():
                bound_ref[0] = jnp.max(out_t_ref[:, :])


def _any_kernel(tile_ids, block_ids, first, entry, nreal, gid_base, rays_ref,
                excl_ref, tris_ref, prev_ref, out_ref, done_ref, *, tb: int,
                shared_origin: bool, exit_every: int = 0):
    w = pl.program_id(0)

    @pl.when(first[w] == 1)
    def _():
        out_ref[:, :] = prev_ref[:, :]
        if exit_every:
            done_ref[0] = jnp.int32(0)

    live = w < nreal[0]
    # Amortized early exit (see _nearest_kernel): once every ray of the
    # tile is occluded (dead rays are pre-seeded as hit), later blocks
    # cannot change anything. The done flag refreshes every K steps.
    if exit_every:
        live = live & (done_ref[0] == 0)

    @pl.when(live)
    def _():
        t, valid, gid_local = _pair_math(rays_ref, tris_ref, shared_origin)
        gid = gid_base[0] + block_ids[w] * tb + gid_local
        valid = valid & (gid != excl_ref[0:1, :])
        tmax = rays_ref[6:7, :]
        hit = jnp.max(jnp.where(valid & (t <= tmax), 1, 0), axis=0, keepdims=True)
        out_ref[:, :] = jnp.maximum(out_ref[:, :], hit)
        if exit_every:
            @pl.when(jax.lax.rem(w, exit_every) == exit_every - 1)
            def _():
                done_ref[0] = jnp.min(out_ref[:, :])


def _grid_spec(w_seg: int, rt: int, tb: int, n_acc: int, bound_dtype,
               mxu: bool = False):
    if mxu:
        # 7 prefetch args: tile, block (scal + gid), A-block, first, entry,
        # nreal, gid_base. The A matrix and the scalar triple have separate
        # index streams so per-light launches share ONE static A.
        def ray_map(w, t_ids, b_ids, a_ids, first, entry, nreal, gid_base):
            return (0, t_ids[w])

        def triA_map(w, t_ids, b_ids, a_ids, first, entry, nreal, gid_base):
            return (a_ids[w], 0)

        def scal_map(w, t_ids, b_ids, a_ids, first, entry, nreal, gid_base):
            return (b_ids[w], 0)

        tri_specs = [
            pl.BlockSpec((3 * tb, 8), triA_map),  # A = [n; ku; kv] per block
            pl.BlockSpec((tb, 8), scal_map),      # (num, a_u, a_v) scalars
        ]
        n_prefetch = 7
    else:
        def ray_map(w, t_ids, b_ids, first, entry, nreal, gid_base):
            return (0, t_ids[w])

        def tri_map(w, t_ids, b_ids, first, entry, nreal, gid_base):
            return (b_ids[w], 0)

        tri_specs = [pl.BlockSpec((tb, 16), tri_map)]  # triangle block
        n_prefetch = 6

    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(w_seg,),
        in_specs=[
            pl.BlockSpec((8, rt), ray_map),      # rays
            pl.BlockSpec((1, rt), ray_map),      # exclude ids
        ] + tri_specs
          + [pl.BlockSpec((1, rt), ray_map) for _ in range(n_acc)],  # carries
        out_specs=tuple(pl.BlockSpec((1, rt), ray_map) for _ in range(n_acc)),
        scratch_shapes=[pltpu.SMEM((1,), bound_dtype)],  # early-exit bound
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
                  interpret, gid_base=None, bound_dtype=jnp.float32,
                  ablock_ids=None):
    """`tris_packed` is either the (T, 16) column pack (all-VPU kernels) or
    an (A (3T, 8), scal (T, 8)) tuple (MXU shared-origin kernels).
    `ablock_ids` indexes A when it differs from block_ids (per-light
    launches: block_ids carry the light offset for scal/gid, A is shared)."""
    r = rays_packed.shape[1]
    excl2 = exclude[None, :]
    out_shape = tuple(jax.ShapeDtypeStruct((1, r), a.dtype) for a in init)
    n_seg = -(-w_pad // SEGMENT)
    if w_pad % n_seg:
        raise ValueError(f"w_pad={w_pad} not divisible into {n_seg} segments; "
                         "use bucket_w_pad()")
    w_seg = w_pad // n_seg
    mxu = isinstance(tris_packed, tuple)
    tris_in = tris_packed if mxu else (tris_packed,)
    grid_spec = _grid_spec(w_seg, rt, tb, n_acc, bound_dtype, mxu=mxu)
    if gid_base is None:
        gid_base = jnp.zeros((1,), jnp.int32)
    else:
        gid_base = jnp.asarray(gid_base, jnp.int32).reshape(1)
    if mxu and ablock_ids is None:
        ablock_ids = block_ids

    def one_segment(carry, seg_start):
        t_ids = jax.lax.dynamic_slice(tile_ids, (seg_start,), (w_seg,))
        b_ids = jax.lax.dynamic_slice(block_ids, (seg_start,), (w_seg,))
        ent = jax.lax.dynamic_slice(entry, (seg_start,), (w_seg,))
        first = _segment_first(t_ids)
        nreal = jnp.clip(count - seg_start, 0, w_seg).astype(jnp.int32)[None]
        if mxu:
            a_ids = jax.lax.dynamic_slice(ablock_ids, (seg_start,), (w_seg,))
            scalars = (t_ids, b_ids, a_ids, first, ent, nreal, gid_base)
        else:
            scalars = (t_ids, b_ids, first, ent, nreal, gid_base)
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(*scalars, rays_packed, excl2, *tris_in, *carry)
        return outs, None

    if n_seg == 1:
        carry, _ = one_segment(init, 0)
    else:
        starts = jnp.arange(n_seg, dtype=jnp.int32) * w_seg
        carry, _ = jax.lax.scan(one_segment, init, starts)
    return carry


@functools.partial(jax.jit, static_argnames=("rt", "tb", "w_pad", "interpret",
                                              "shared_origin", "exit_every"))
def bsr_nearest(rays_packed, exclude, tris_packed, tile_ids, block_ids, entry,
                count=None, init_t=None, init_i=None, gid_base=None,
                ablock_ids=None, *,
                rt: int, tb: int, w_pad: int, interpret: bool = False,
                shared_origin: bool = False, exit_every: int = 0):
    """Nearest hit over the work list: (best_t (R,), best_idx (R,)).

    Outputs are defined ONLY for ray tiles that appear in the work list —
    unvisited output blocks are never written (undefined memory). Callers
    mask by per-tile visited flags (the cull guarantees unvisited tiles hit
    nothing). `count` = number of real work items; padding slots past it are
    skipped in-kernel (None = treat all w_pad as real). With
    shared_origin=True, tris_packed must be the pack_tris_origin layout for
    the launch's common ray origin.

    `init_t`/`init_i` (R,) seed the accumulator — the geometry-rotation
    schedule (parallel/ring.py) chains steps through them. Ties fold by min
    global id, so chaining order does not affect the result. `gid_base`
    (traced scalar) offsets reported triangle ids — sharded geometry passes
    its shard's first global id (parallel/halo.py, parallel/ring.py).

    MXU mode: pass `tris_packed` as an (A (3T, 8), scal (T, 8)) tuple
    (pack_dirs + fold_origin_scal); implies a shared ray origin. `ablock_ids`
    indexes A when block_ids carry a per-light offset for scal/gid.
    """
    r = rays_packed.shape[1]
    if count is None:
        count = jnp.int32(w_pad)
    init = (jnp.full((1, r), jnp.inf, jnp.float32) if init_t is None
            else init_t.reshape(1, r).astype(jnp.float32),
            jnp.full((1, r), BIG_IDX, jnp.int32) if init_i is None
            else init_i.reshape(1, r).astype(jnp.int32))
    if isinstance(tris_packed, tuple):
        kernel = functools.partial(_nearest_mxu_kernel, tb=tb,
                                   exit_every=exit_every)
    else:
        kernel = functools.partial(_nearest_kernel, tb=tb,
                                   shared_origin=shared_origin,
                                   exit_every=exit_every)
    out_t, out_i = _run_segments(
        kernel, 2, init,
        rays_packed, exclude, tris_packed, tile_ids, block_ids, entry, count,
        rt=rt, tb=tb, w_pad=w_pad, interpret=interpret, gid_base=gid_base,
        ablock_ids=ablock_ids)
    return out_t[0], out_i[0]


@functools.partial(jax.jit, static_argnames=("rt", "tb", "w_pad", "interpret",
                                              "shared_origin", "exit_every"))
def bsr_any(rays_packed, exclude, tris_packed, tile_ids, block_ids, entry,
            count=None, init=None, gid_base=None, ablock_ids=None, *,
            rt: int, tb: int,
            w_pad: int, interpret: bool = False, shared_origin: bool = False,
            exit_every: int = 0):
    """Any-hit (shadow) query with per-ray t_max. Returns int32 (R,) 0/1.

    Same visited-tiles-only output contract as bsr_nearest. `init` (R,)
    int32 pre-seeds the accumulator: marking dead rays (misses, zero-Ks)
    as already-hit lets whole tiles early-exit as soon as every *live* ray
    is occluded — callers mask dead rays out of the result anyway. It also
    chains ring-rotation steps (parallel/ring.py). `gid_base` as in
    bsr_nearest (the self-exclusion ids stay global).
    """
    r = rays_packed.shape[1]
    if count is None:
        count = jnp.int32(w_pad)
    init = (jnp.zeros((1, r), jnp.int32) if init is None
            else init.reshape(1, r).astype(jnp.int32),)
    if isinstance(tris_packed, tuple):
        kernel = functools.partial(_any_mxu_kernel, tb=tb,
                                   exit_every=exit_every)
    else:
        kernel = functools.partial(_any_kernel, tb=tb,
                                   shared_origin=shared_origin,
                                   exit_every=exit_every)
    (out,) = _run_segments(
        kernel, 1, init,
        rays_packed, exclude, tris_packed, tile_ids, block_ids, entry, count,
        rt=rt, tb=tb, w_pad=w_pad, interpret=interpret, gid_base=gid_base,
        bound_dtype=jnp.int32, ablock_ids=ablock_ids)
    return out[0]
