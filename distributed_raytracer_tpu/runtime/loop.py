"""Interactive frame loop with pipelined dispatch.

The TPU analog of the master's 30 Hz input loop + per-frame coordinator
goroutines (master/main.go:240-280, :94-187). The reference pipelines frames
by spawning one coordinator per frame and forcing in-order display with a
channel chain; here, JAX's asynchronous dispatch is the pipeline: each frame's
device computation is enqueued without blocking, a bounded deque of in-flight
frames (cfg.frames_in_flight) provides backpressure, and FIFO completion
guarantees in-order display. Input events come from a pluggable source
(scripted animation when headless); the display sink is a callback.

Fault-handling mapping: the reference drops whole frames when a tile fails
(main.go:119-125,:153-161) and relies on worker heartbeats/re-registration.
A TPU slice fails as a unit, so per-tile recovery does not apply; the loop
instead treats a failed device step as a dropped frame and continues
(drop accounting preserved so the §3 drop-rate metric remains reportable).
"""

from __future__ import annotations

import collections
import logging
import time
from typing import Callable, Iterable, Optional

_log = logging.getLogger(__name__)

import jax
import numpy as np

from distributed_raytracer_tpu.models.camera import Camera
from distributed_raytracer_tpu.models.scene import SceneArrays
from distributed_raytracer_tpu.runtime.controller import CameraController
from distributed_raytracer_tpu.runtime.stats import FrameTimer, FrameStats
from distributed_raytracer_tpu.utils.config import RenderConfig, DEFAULT_CONFIG


def run_loop(
    scene_arrays: SceneArrays,
    camera: Camera,
    render_fn: Callable,            # (scene, cam_arrays) -> device array (H, W, 3)
    width: int,
    height: int,
    events: Iterable,               # iterable of per-tick event lists
    display: Optional[Callable] = None,   # (frame_index, np image) -> None
    cfg: RenderConfig = DEFAULT_CONFIG,
    realtime: bool = False,         # pace ticks at cfg.target_fps (main.go:271-275)
    max_frames: Optional[int] = None,
):
    """Drive the interactive loop until events are exhausted or Esc.

    Each element of `events` is a list of (kind, *args) tuples with kinds
    "key_down"/"key_up"/"mouse" — the HandleInputs analog. Returns
    (final_camera, FrameStats).
    """
    controller = CameraController(width=width, height=height, cfg=cfg)
    timer = FrameTimer()
    in_flight = collections.deque()  # (frame_index, device_array)
    frames_dropped = 0
    consecutive_drops = 0
    ms_per_frame = 1000.0 / cfg.target_fps

    def drain_one():
        nonlocal frames_dropped, consecutive_drops
        idx, fut = in_flight.popleft()
        try:
            img = np.asarray(fut)  # blocks until the device finishes
        except Exception:          # device failure -> dropped frame
            frames_dropped += 1
            consecutive_drops += 1
            _log.warning("frame %d dropped (device failure)", idx)
            return
        consecutive_drops = 0
        timer.frame_drawn()
        if display is not None:
            display(idx, img)

    for tick_events in events:
        tick_start = time.monotonic()
        for ev in tick_events:
            kind = ev[0]
            if kind == "key_down":
                controller.key_down(ev[1])
            elif kind == "key_up":
                controller.key_up(ev[1])
            elif kind == "mouse":
                controller.mouse_motion(ev[1], ev[2])
        if not controller.running:
            break

        if controller.dirty:  # frames only on input change (main.go:246)
            camera = controller.apply(camera)
            frame_index = timer.frames_total
            timer.frame_issued()
            try:
                # Dispatch-time protection: render_fn may raise before any
                # device work is enqueued (bad buckets, host-side sizing,
                # compile errors) — contain it like a failed tile
                # (main.go:119-125), do not let it escape the loop.
                fut = render_fn(scene_arrays, camera.to_arrays())
            except Exception:
                frames_dropped += 1
                consecutive_drops += 1
                _log.warning("frame %d dropped (dispatch failure)",
                             frame_index)
            else:
                in_flight.append((frame_index, fut))
                while len(in_flight) > cfg.frames_in_flight:
                    drain_one()
            if consecutive_drops >= cfg.max_consecutive_drops:
                # Permanent failure: stop issuing instead of spinning at
                # target FPS forever with every frame a drop.
                _log.error("aborting after %d consecutive dropped frames",
                           consecutive_drops)
                break
            if max_frames is not None and timer.frames_total >= max_frames:
                break

        if realtime:
            elapsed_ms = (time.monotonic() - tick_start) * 1000.0
            if elapsed_ms < ms_per_frame:
                time.sleep((ms_per_frame - elapsed_ms) / 1000.0)

    while in_flight:
        drain_one()
    stats = timer.stats()
    return camera, stats, frames_dropped
