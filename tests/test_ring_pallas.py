"""Pallas RDMA ring kernel vs brute force (TPU interpret mode on CPU).

ops/pallas/ring_trace.ring_nearest rotates triangle shards around the mesh
with make_async_remote_copy; interpret mode simulates the remote DMAs and
semaphores, so the full choreography (double buffering, capacity handshake,
neighborhood barrier) executes on the 8-device CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from distributed_raytracer_tpu.ops import raygen
from distributed_raytracer_tpu.ops.pallas import bsr_trace, ring_trace
from distributed_raytracer_tpu.parallel import ring as ring_mod


def _brute_nearest(rays, tris):
    """Reference nearest hit: (8, R) rays x (16, T) packed tris, f32."""
    o = rays[0:3].T[:, None, :]
    d = rays[3:6].T[:, None, :]
    n = tris[0:3].T[None, :, :]
    ku, cu = tris[4:7].T[None, :, :], tris[7][None, :]
    kv, cv = tris[8:11].T[None, :, :], tris[11][None, :]
    den = (n * d).sum(-1)
    # den == 0 rows (parallel rays, all-zero padding triangles) are masked
    # invalid below; divide by a safe value so no inf/NaN intermediate ever
    # forms (inf * 0 in the u/v FMAs raised RuntimeWarnings that would bury
    # a real NaN regression in noise).
    t = (tris[3][None, :] - (n * o).sum(-1)) / np.where(den != 0, den, 1.0)
    u = (ku * o).sum(-1) + cu + t * (ku * d).sum(-1)
    v = (kv * o).sum(-1) + cv + t * (kv * d).sum(-1)
    eps = float(ring_trace.BARY_EPS)
    valid = ((den != 0) & (t >= 0) & (u >= -eps) & (u <= 1 + eps)
             & (u + v >= -eps) & (u + v <= 1 + eps) & (v >= -eps))
    cand = np.where(valid, t, np.inf)
    best = cand.min(axis=1)
    gid = np.where(cand == best[:, None],
                   np.arange(tris.shape[1])[None, :], ring_trace.BIG_IDX
                   ).min(axis=1)
    return best, gid


@pytest.mark.parametrize("n_dev", [1, 4, 8])
def test_ring_pallas_matches_brute(suzanne_scene, n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip("needs virtual devices")
    mesh = jax.make_mesh((n_dev,), ("ring",), devices=jax.devices()[:n_dev])

    arrays = suzanne_scene.bake()
    tris = bsr_trace.pack_tris(arrays).T          # ring layout is (16, T)
    t = tris.shape[1]
    t_loc = -(-t // (n_dev * 128)) * 128
    tris_pad = np.zeros((16, t_loc * n_dev), np.float32)
    tris_pad[:, :t] = tris

    cam = suzanne_scene.camera.to_arrays()
    w, h = 64, 48
    r = w * h
    r_loc = r // n_dev
    idx = jnp.arange(r, dtype=jnp.int32)
    dirs = raygen.ray_directions_flat(cam, w, h, idx)
    rays = np.asarray(bsr_trace.pack_rays(jnp.asarray(cam.pos), dirs))

    want_t, want_i = _brute_nearest(rays, tris_pad)

    fn = functools.partial(
        ring_trace.ring_nearest, n=n_dev, rt=128, tb=128, axis="ring",
        interpret=pltpu.InterpretParams())
    sharded = jax.jit(shard_map(
        fn, mesh=mesh, in_specs=(P(None, "ring"), P(None, "ring")),
        out_specs=(P("ring"), P("ring")), check_vma=False))
    got_t, got_i = sharded(jnp.asarray(rays), jnp.asarray(tris_pad))
    got_t, got_i = np.asarray(got_t), np.asarray(got_i)

    hit = np.isfinite(want_t)
    assert hit.any()
    np.testing.assert_allclose(got_t[hit], want_t[hit], rtol=1e-6)
    assert (~np.isfinite(got_t[~hit])).all()
    # Ties broken identically (min global id among equal-t hits).
    assert (got_i[hit] == want_i[hit]).all()
