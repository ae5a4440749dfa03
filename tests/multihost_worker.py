"""Worker process for the multi-host test (tests/test_multihost.py).

One OS process per "host", each with 2 virtual CPU devices — the JAX analog
of the reference's GCE-VM workers (final_report.pdf §3.1). Process 0 plays
the master (worker registration -> jax.distributed.initialize barrier;
frame assembly -> multihost.gather_frame)."""

import os
import sys


def main() -> int:
    pid, nproc, port, scene_path, out_path = sys.argv[1:6]
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")

    # jax.distributed.initialize must run before anything touches the XLA
    # backend — including the package import (module-level jnp constants in
    # ops/). multihost.initialize documents the same constraint.
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=int(nproc), process_id=int(pid))

    from distributed_raytracer_tpu.parallel import multihost, render_sharded
    assert jax.process_count() == int(nproc), jax.process_count()
    assert len(jax.devices()) == 2 * int(nproc), len(jax.devices())

    from distributed_raytracer_tpu.models.scene import load_scene

    scene = load_scene(scene_path)
    arrays = scene.bake()
    w, h = 48, 36
    mesh = multihost.global_mesh("tiles")
    render = render_sharded.make_sharded_renderer(w, h, mesh=mesh)
    out = render.device_fn(arrays, scene.camera.to_arrays())
    frame = multihost.gather_frame(out)
    if multihost.is_master():
        assert frame is not None
        import numpy as np

        np.save(out_path, frame[:w * h].reshape(h, w, 3))
    else:
        assert frame is None
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
