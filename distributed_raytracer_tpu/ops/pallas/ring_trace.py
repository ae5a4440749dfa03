"""Pallas ring rotation with overlapped inter-chip RDMA.

parallel/ring.py expresses the geometry-rotation schedule with
`jax.lax.ppermute`, leaving overlap of transfer and intersection compute to
XLA's scheduler. This kernel owns the overlap explicitly: each device keeps
a double-buffered VMEM slot pair; at every ring step it *starts* an async
remote copy of the resident triangle shard to its right neighbor
(`pltpu.make_async_remote_copy` over ICI), intersects its resident rays
against the resident shard while the transfer flies, and only then waits on
the incoming shard — the ring-attention communication pattern with
nearest-hit min as the online reduction.

Flow control (the standard double-buffer handshake):
  - step s computes on slot  cur = s % 2  and receives into  nxt = 1 - cur;
  - the send of step s targets the right neighbor's `nxt`, which the
    neighbor last computed on in step s-1 — so before sending (s >= 1),
    wait on a capacity semaphore that the *right* neighbor signals after
    finishing its step s-1 compute;
  - symmetrically, after computing on `cur`, signal the *left* neighbor
    (the device about to send into our `cur`).
  - an initial neighborhood barrier (pltpu.get_barrier_semaphore) keeps a
    fast device from sending before a slow neighbor's kernel has even
    allocated its buffers.

Two online reductions over the same choreography:
  - ring_nearest: (min t, then min global id) with an exclusion id per ray
    (self-intersection masking for bounce rays);
  - ring_any: any-hit OR with per-ray t_max (rays row 6) and exclusion —
    the shadow phase. Together they make the RDMA transport a full
    trace+shadow pipeline (worker/shared/tracer/tracer.go:53-91's loop),
    consumed end-to-end by parallel/ring.make_ring_renderer(use_rdma=True).

Scope: the shading payload is fetched afterwards by the caller (a
psum_scatter of the owning shard's rows — parallel/ring.py). Grid is
(n_steps, ray_tiles, tri_blocks); accumulators live in VMEM scratch for the
whole kernel and flush to the output blocks on the final grid point.

Intersection math and boundary semantics are ops/pallas/bsr_trace._pair_math
(Baldwin-Weber, BARY_EPS-expanded inclusive bounds, den != 0, t >= 0) —
identical images to the dense and BSR paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from distributed_raytracer_tpu.ops.intersect import BARY_EPS

BIG_IDX = 2 ** 30


def _ring_kernel(rays_ref, excl_ref, tris_hbm, *refs, n: int, rt: int,
                 tb: int, t_loc: int, axis: str, any_hit: bool):
    if any_hit:
        (out_ref, buf, acc, local_sem, send_sem, recv_sem, cap_sem) = refs
    else:
        (out_t_ref, out_i_ref, buf, acc_t, acc_i,
         local_sem, send_sem, recv_sem, cap_sem) = refs
    s = pl.program_id(0)
    r = pl.program_id(1)
    b = pl.program_id(2)
    nb = pl.num_programs(2)
    me = jax.lax.axis_index(axis)
    right = jax.lax.rem(me + 1, n)
    left = jax.lax.rem(me + n - 1, n)
    cur = jax.lax.rem(s, 2)
    nxt = 1 - cur

    # First grid point: fetch the resident shard HBM -> slot 0 and barrier
    # with both neighbors so no RDMA lands in unallocated scratch.
    @pl.when((s == 0) & (r == 0) & (b == 0))
    def _():
        cp = pltpu.make_async_copy(tris_hbm, buf.at[0], local_sem)
        cp.start()
        cp.wait()
        if n > 1:
            bar = pltpu.get_barrier_semaphore()
            pltpu.semaphore_signal(bar, 1, device_id=left,
                                   device_id_type=pltpu.DeviceIdType.LOGICAL)
            pltpu.semaphore_signal(bar, 1, device_id=right,
                                   device_id_type=pltpu.DeviceIdType.LOGICAL)
            pltpu.semaphore_wait(bar, 2)

    def rdma(slot_src, slot_dst):
        return pltpu.make_async_remote_copy(
            src_ref=buf.at[slot_src], dst_ref=buf.at[slot_dst],
            send_sem=send_sem.at[slot_src], recv_sem=recv_sem.at[slot_dst],
            device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL)

    if n > 1:
        # Step start: launch the rotation of the resident shard, overlapping
        # it with this step's intersection work.
        @pl.when((r == 0) & (b == 0) & (s < n - 1))
        def _():
            @pl.when(s >= 1)
            def _():
                # Right neighbor must have finished computing on our target
                # slot (its step s-1).
                pltpu.semaphore_wait(cap_sem, 1)
            rdma(cur, nxt).start()

    # Seed this ray tile's accumulator on the first (step, tri-block) visit.
    @pl.when((s == 0) & (b == 0))
    def _():
        if any_hit:
            acc[r, :] = jnp.zeros((rt,), jnp.int32)
        else:
            acc_t[r, :] = jnp.full((rt,), jnp.inf, jnp.float32)
            acc_i[r, :] = jnp.full((rt,), BIG_IDX, jnp.int32)

    # --- intersection: rays tile x resident tri block (Baldwin-Weber) ---
    def rrow(i):
        return rays_ref[i:i + 1, :]

    def tcol(i):
        return jnp.transpose(buf[cur, i:i + 1, pl.ds(b * tb, tb)])

    dx, dy, dz = rrow(3), rrow(4), rrow(5)
    ox, oy, oz = rrow(0), rrow(1), rrow(2)
    nx, ny, nz = tcol(0), tcol(1), tcol(2)
    kux, kuy, kuz = tcol(4), tcol(5), tcol(6)
    kvx, kvy, kvz = tcol(8), tcol(9), tcol(10)

    den = nx * dx + ny * dy + nz * dz
    o_n = nx * ox + ny * oy + nz * oz
    t = (tcol(3) - o_n) / den
    u = (kux * ox + kuy * oy + kuz * oz + tcol(7)) \
        + t * (kux * dx + kuy * dy + kuz * dz)
    v = (kvx * ox + kvy * oy + kvz * oz + tcol(11)) \
        + t * (kvx * dx + kvy * dy + kvz * dz)
    eps = BARY_EPS
    valid = ((den != 0.0) & (t >= 0.0)
             & (u >= -eps) & (u <= 1.0 + eps)
             & (u + v >= -eps) & (u + v <= 1.0 + eps)
             & (v >= -eps))

    # Global ids: blocks flow rightward, so after s rotations the resident
    # shard originated s devices to the LEFT: device (me - s) mod n.
    origin_dev = jax.lax.rem(me + n - s, n)
    base = origin_dev * t_loc + b * tb
    gid = base + jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    valid = valid & (gid != excl_ref[0:1, :])

    if any_hit:
        tmax = rrow(6)
        hit = jnp.max(jnp.where(valid & (t <= tmax), 1, 0),
                      axis=0)                               # (RT,)
        acc[r, :] = jnp.maximum(acc[r, :], hit)
    else:
        cand = jnp.where(valid, t, jnp.inf)
        m = jnp.min(cand, axis=0)
        sel = jnp.min(jnp.where(cand == m[None, :], gid, BIG_IDX), axis=0)
        # Tie-break on global id: each device visits the shards in a
        # different rotation order, so "first hit wins" would not be
        # replica-consistent.
        better = (m < acc_t[r, :]) | ((m == acc_t[r, :]) & (sel < acc_i[r, :]))
        acc_t[r, :] = jnp.where(better, m, acc_t[r, :])
        acc_i[r, :] = jnp.where(better, sel, acc_i[r, :])

    # Last grid point: flush the full accumulator to the (single-block)
    # outputs. Outputs are whole-array blocks because Pallas forbids
    # revisiting a smaller per-tile output block across ring steps.
    @pl.when((s == n - 1) & (r == pl.num_programs(1) - 1) & (b == nb - 1))
    def _():
        if any_hit:
            out_ref[0, :] = acc[...].reshape(-1)
        else:
            out_t_ref[0, :] = acc_t[...].reshape(-1)
            out_i_ref[0, :] = acc_i[...].reshape(-1)

    if n > 1:
        # Step end (this device's LAST compute touching slot `cur`): tell
        # the left neighbor our cur slot is free for its next send, then
        # wait for our own incoming shard.
        @pl.when((r == pl.num_programs(1) - 1) & (b == nb - 1))
        def _():
            # Capacity signal pairs with the left neighbor's send at step
            # s+1, which only exists for s + 1 <= n - 2.
            @pl.when(s < n - 2)
            def _():
                pltpu.semaphore_signal(
                    cap_sem, 1, device_id=left,
                    device_id_type=pltpu.DeviceIdType.LOGICAL)

            @pl.when(s < n - 1)
            def _():
                rdma(cur, nxt).wait()


def _ring_call(rays_packed, exclude, tris_packed, *, n, rt, tb, axis,
               interpret, collective_id, any_hit):
    r_loc = rays_packed.shape[1]
    t_loc = tris_packed.shape[1]
    assert r_loc % rt == 0 and t_loc % tb == 0, (r_loc, rt, t_loc, tb)
    n_tiles = r_loc // rt
    n_blocks = t_loc // tb

    kernel = functools.partial(_ring_kernel, n=n, rt=rt, tb=tb, t_loc=t_loc,
                               axis=axis, any_hit=any_hit)
    grid = (n, n_tiles, n_blocks)
    if any_hit:
        out_shape = (jax.ShapeDtypeStruct((1, r_loc), jnp.int32),)
        out_specs = (pl.BlockSpec((1, r_loc), lambda s, r, b: (0, 0)),)
        accs = [pltpu.VMEM((n_tiles, rt), jnp.int32)]
    else:
        out_shape = (jax.ShapeDtypeStruct((1, r_loc), jnp.float32),
                     jax.ShapeDtypeStruct((1, r_loc), jnp.int32))
        out_specs = (pl.BlockSpec((1, r_loc), lambda s, r, b: (0, 0)),
                     pl.BlockSpec((1, r_loc), lambda s, r, b: (0, 0)))
        accs = [pltpu.VMEM((n_tiles, rt), jnp.float32),
                pltpu.VMEM((n_tiles, rt), jnp.int32)]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, rt), lambda s, r, b: (0, r)),
            pl.BlockSpec((1, rt), lambda s, r, b: (0, r)),
            pl.BlockSpec(memory_space=pl.ANY),       # resident shard in HBM
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, 16, t_loc), jnp.float32),   # rotating buffers
        ] + accs + [
            pltpu.SemaphoreType.DMA,                   # local HBM->VMEM
            pltpu.SemaphoreType.DMA((2,)),             # send per slot
            pltpu.SemaphoreType.DMA((2,)),             # recv per slot
            pltpu.SemaphoreType.REGULAR,               # capacity handshake
        ],
        compiler_params=pltpu.CompilerParams(collective_id=collective_id),
        interpret=interpret if interpret is not None else False,
    )(rays_packed, exclude[None, :], tris_packed)
    return outs


@functools.partial(jax.jit, static_argnames=("n", "rt", "tb", "axis",
                                             "interpret", "collective_id"))
def ring_nearest(rays_packed: jnp.ndarray, tris_packed: jnp.ndarray,
                 exclude: jnp.ndarray | None = None, *,
                 n: int, rt: int = 512, tb: int = 128, axis: str = "ring",
                 interpret=None, collective_id: int = 0):
    """Nearest hit of resident rays vs ALL shards via RDMA ring rotation.

    Must be called inside shard_map over `axis` with size `n`. Arguments
    are per-device values: rays_packed (8, R_loc) bsr_trace.pack_rays rows,
    tris_packed (16, T_loc) triangle rows (bsr_trace.pack_tris transposed —
    the ring kernel keeps triangles on the lane axis) of the RESIDENT shard
    (equal T_loc everywhere; pad with degenerate triangles). `exclude`
    (R_loc,) int32 global ids masked per ray (-1 = none). Returns
    (best_t (R_loc,), best_gid (R_loc,)) with gid global across shards
    (shard d owns [d*T_loc, (d+1)*T_loc)).

    `interpret`: pass pltpu.InterpretParams() to run on CPU (tests).
    """
    if exclude is None:
        exclude = jnp.full((rays_packed.shape[1],), -1, jnp.int32)
    out_t, out_i = _ring_call(rays_packed, exclude, tris_packed, n=n, rt=rt,
                              tb=tb, axis=axis, interpret=interpret,
                              collective_id=collective_id, any_hit=False)
    return out_t[0], out_i[0]


@functools.partial(jax.jit, static_argnames=("n", "rt", "tb", "axis",
                                             "interpret", "collective_id"))
def ring_any(rays_packed: jnp.ndarray, tris_packed: jnp.ndarray,
             exclude: jnp.ndarray | None = None, *,
             n: int, rt: int = 512, tb: int = 128, axis: str = "ring",
             interpret=None, collective_id: int = 0):
    """Any-hit (shadow) query vs ALL shards via RDMA ring rotation.

    rays row 6 is the per-ray t_max (blocker range); `exclude` masks the
    ray's own surface triangle (tracer.go:64's self-exclusion analog).
    Returns (R_loc,) int32 0/1.
    """
    if exclude is None:
        exclude = jnp.full((rays_packed.shape[1],), -1, jnp.int32)
    (out,) = _ring_call(rays_packed, exclude, tris_packed, n=n, rt=rt,
                        tb=tb, axis=axis, interpret=interpret,
                        collective_id=collective_id, any_hit=True)
    return out[0]
