"""RDMA ring transport as a full renderer (interpret mode on CPU).

make_ring_renderer(use_rdma=True) must produce the same image as the
ppermute transport: one renderer, two interchangeable transports
(round-1 verdict item 6). The RDMA path runs the full trace+shadow pipeline
(worker/shared/tracer/tracer.go:53-91's loop) through the Pallas ring
kernels plus a psum_scatter payload fetch."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # RDMA transport: kernel-level tests in test_ring_pallas.py stay in the default gate

from distributed_raytracer_tpu.ops.render import render_frame
from distributed_raytracer_tpu.parallel import ring


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.make_mesh((8,), (ring.AXIS,))


def test_rdma_renderer_matches_ppermute(suzanne_scene, mesh8):
    arrays = ring.pad_for_ring(suzanne_scene.bake(), 8)
    w, h = 64, 48
    a = ring.make_ring_renderer(arrays, w, h, mesh=mesh8)
    b = ring.make_ring_renderer(arrays, w, h, mesh=mesh8, use_rdma=True)
    cam = suzanne_scene.camera
    img_a = a(cam)
    img_b = b(cam)
    # The RDMA path recomputes u, v from the hit point instead of carrying
    # them from the intersection; last-ulp differences may flip boundary
    # pixels only.
    diff = np.abs(img_a - img_b).max(-1)
    assert (diff > 2 / 255).mean() < 0.002
    assert np.abs(img_a - img_b).mean() < 1e-4


def test_rdma_renderer_matches_dense_tetra(tetra_scene, mesh8):
    arrays = ring.pad_for_ring(tetra_scene.bake(), 8)
    w, h = 64, 48
    dense = np.asarray(render_frame(
        jax.device_put(tetra_scene.bake()), tetra_scene.camera.to_arrays(),
        w, h))
    render = ring.make_ring_renderer(arrays, w, h, mesh=mesh8,
                                     use_rdma=True)
    out = render(tetra_scene.camera)
    diff = np.abs(out - dense).max(-1)
    assert (diff > 2 / 255).mean() < 0.002
    assert np.abs(out - dense).mean() < 1e-4
