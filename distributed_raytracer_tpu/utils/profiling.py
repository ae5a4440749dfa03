"""Profiling and roofline accounting.

The reference's only instrumentation is exit-time FPS statistics
(master/main.go:285-325, reproduced in runtime/stats.py). This module adds
what a production TPU renderer needs (SURVEY.md §5 "Tracing/profiling"):
  - jax.profiler trace capture around frames,
  - per-frame work accounting for the block-sparse path (pairs tested,
    effective FLOPs) against a VPU speed-of-light estimate.

Roofline derivation (hardware peak, NOT the code's own measured ceiling —
a ceiling defined as what the code already does cannot detect that the
code is slow):
  - One v5e TensorCore's VPU is an (8, 128)-lane vector unit with 4 ALUs
    per lane at ~0.94 GHz (public figures; jax-ml.github.io/scaling-book
    "TPU architecture"), i.e. 8*128*4*0.94e9 ≈ 3.85e12 f32 ops/s.
  - One shared-origin Baldwin–Weber pair evaluation needs ~46 VPU ops:
    den/u/v direction dots 15, t = num/den ≈ 4 (reciprocal sequence),
    u/v fma 4, seven compares + three ands ≈ 10, masked min + argmin
    fold ≈ 8, select/write ≈ 5. (The per-ray-origin variant adds ~12.)
  - SOL := 3.85e12 / 46 ≈ 84 Gpairs/s/core for the all-VPU shared-origin
    kernels — the production default (round 3: the MXU direction-dot
    offload measured 1.4-1.8x SLOWER on real v5e despite its higher
    theoretical ceiling of 3.85e12 / 31 ≈ 124 Gpairs/s, kept as
    SOL_GPAIRS_MXU_OFFLOAD for A/B accounting). The per-ray-origin
    variant (multi-bounce nearest queries) needs ~12 more ops/pair:
    SOL_GPAIRS_PER_RAY ≈ 66.
    `FrameWork.sol` picks the roofline matching the kernel variant the
    measured path actually ran, so reported fractions are comparable.
For context: the round-1 dense-sweep microbenchmark measured ~11 Gpairs/s
(13% of the all-VPU SOL) — the gap is the optimization budget, not noise.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Optional

PAIR_FLOPS = 47.0
VPU_OPS_PER_SEC = 8 * 128 * 4 * 0.94e9   # one v5e TensorCore, f32
PAIR_VPU_OPS = 46.0                      # all-VPU shared-origin pair eval
PAIR_VPU_OPS_MXU = 31.0                  # with the 3 direction dots on MXU
PAIR_VPU_OPS_PER_RAY = 58.0              # per-ray-origin (bounce) variant
SOL_GPAIRS_ALL_VPU = VPU_OPS_PER_SEC / PAIR_VPU_OPS / 1e9          # ≈ 84
SOL_GPAIRS_MXU_OFFLOAD = VPU_OPS_PER_SEC / PAIR_VPU_OPS_MXU / 1e9  # ≈ 124
SOL_GPAIRS_PER_RAY = VPU_OPS_PER_SEC / PAIR_VPU_OPS_PER_RAY / 1e9  # ≈ 66
# Default roofline = the production kernel family (all-VPU shared-origin).
SOL_GPAIRS = SOL_GPAIRS_ALL_VPU
# Round-1 measured dense-sweep throughput, kept for context only.
MEASURED_DENSE_GPAIRS_R1 = 11.0


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
    # Roofline for the kernel variant this frame actually ran: pass
    # SOL_GPAIRS_PER_RAY for multi-bounce (per-ray-origin) paths,
    # SOL_GPAIRS_MXU_OFFLOAD when use_mxu was on.
    sol_gpairs: float = SOL_GPAIRS

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
        """Fraction of the hardware-derived pair-throughput ceiling
        (`sol_gpairs`, module docstring) achieved, counting scheduled
        (post-cull, pre-early-exit) pairs. Frame time includes cull +
        compaction + shading, so this is an end-to-end fraction; the
        kernel-only fraction is higher."""
        return self.gpairs_per_sec / self.sol_gpairs

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
    lc = renderer._last_counts
    count = lc[renderer.n_levels - 1]   # finest primary cells
    scount = lc[-1]                     # finest shadow cells
    return FrameWork(
        primary_cells=int(count),
        shadow_cells=int(scount),
        rays=renderer.width * renderer.height,
        ray_tile=renderer.rt,
        tri_block=renderer.tb,
        seconds=seconds,
    )
