"""Profiling and roofline accounting.

The reference's only instrumentation is exit-time FPS statistics
(master/main.go:285-325, reproduced in runtime/stats.py). This module adds
what a production TPU renderer needs (SURVEY.md §5 "Tracing/profiling"):
  - jax.profiler trace capture around frames,
  - per-frame work accounting for the block-sparse path (pairs tested,
    effective FLOPs) against a VPU speed-of-light estimate.

Intersection cost model: the Baldwin–Weber pair evaluation is ~47 f32 ops
(3 ray-dependent dots on the MXU + ~32 VPU elementwise ops + compares/
selects); the min/argmin fold adds ~4. Speed-of-light on one v5e core is
taken as the measured dense-sweep throughput ceiling (~11 Gpairs/s,
microbenchmarked in round 1) — a practical SOL that already accounts for
the mixed MXU/VPU issue pattern.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Optional

PAIR_FLOPS = 47.0
PRACTICAL_SOL_GPAIRS = 11.0  # measured dense ceiling, 1 x v5e core


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace over the enclosed block (view with TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class FrameWork:
    """Work accounting for one block-sparse frame."""

    primary_cells: int
    shadow_cells: int
    rays: int
    ray_tile: int
    tri_block: int
    seconds: float

    @property
    def pairs(self) -> float:
        return (self.primary_cells + self.shadow_cells) * self.ray_tile * self.tri_block

    @property
    def gpairs_per_sec(self) -> float:
        return self.pairs / self.seconds / 1e9

    @property
    def gflops(self) -> float:
        return self.pairs * PAIR_FLOPS / 1e9

    @property
    def sol_fraction(self) -> float:
        """Fraction of the practical pair-throughput ceiling achieved,
        counting scheduled (post-cull, pre-early-exit) pairs — early-exit
        skips push this above 1.0, which is the intent: >1 means the kernel
        beat the dense ceiling on the same nominal work."""
        return self.gpairs_per_sec / PRACTICAL_SOL_GPAIRS

    def report(self) -> str:
        return (f"{self.rays} rays, {self.primary_cells}+{self.shadow_cells} "
                f"work cells ({self.pairs / 1e9:.2f} G pairs scheduled) in "
                f"{self.seconds * 1e3:.1f} ms -> {self.gpairs_per_sec:.1f} "
                f"Gpairs/s ({self.sol_fraction:.0%} of practical SOL)")


def measure_culled(renderer, camera, frames: int = 10) -> FrameWork:
    """Time the frozen fast path of a CulledRenderer and account its work."""
    import jax

    renderer.render(camera, block=True)
    renderer.freeze(camera)
    out = renderer.render_fast(camera)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(frames):
        out = renderer.render_fast(camera)
    jax.block_until_ready(out)
    seconds = (time.perf_counter() - t0) / frames
    count, scounts = renderer._last_counts
    return FrameWork(
        primary_cells=int(count),
        shadow_cells=int(sum(scounts)),
        rays=renderer.width * renderer.height,
        ray_tile=renderer.rt,
        tri_block=renderer.tb,
        seconds=seconds,
    )
