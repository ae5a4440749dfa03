"""CLI entry point (the reference-binaries analog) driven end-to-end."""

import os
import subprocess
import sys

import numpy as np
import pytest

from distributed_raytracer_tpu.runtime import framebuffer


@pytest.fixture(scope="module")
def scene_path(tmp_path_factory):
    from tests.conftest import make_tetra_obj
    d = tmp_path_factory.mktemp("cli")
    make_tetra_obj(str(d / "tetra.obj"))
    p = d / "scene.json"
    p.write_text(
        '{"objs": [{"model": "tetra.obj", "pos": {"x": 0, "y": 0, "z": 0}}],'
        '"lights": [{"pos": {"x": 3, "y": 4, "z": 5},'
        '"col": {"r": 255, "g": 255, "b": 255}}],'
        '"cam": {"pos": {"x": 1.5, "y": 1.2, "z": 3.0},'
        '"dir": {"x": -0.35, "y": -0.3, "z": -1.0}, "fov": 1.0472}}')
    return str(p)


def run_cli(args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # jax.config override is needed because the harness re-selects the TPU;
    # do it via a sitecustomize-style -c wrapper.
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from distributed_raytracer_tpu.run import main;"
        f"import sys; sys.exit(main({args!r}))"
    )
    return subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=600,
                          cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_cli_sequential(scene_path, tmp_path):
    out = str(tmp_path / "frames")
    res = run_cli([scene_path, "48", "36", "--mode", "sequential",
                   "--frames", "4", "--fps-target", "0", "--out", out,
                   "--animation", "strafe"])
    assert res.returncode == 0, res.stderr[-2000:]
    assert "Mean FPS" in res.stdout and "Throughput" in res.stdout
    files = sorted(os.listdir(out))
    assert files == [f"frame_{k:05d}.png" for k in range(4)]


def test_cli_culled(scene_path, tmp_path):
    res = run_cli([scene_path, "48", "36", "--mode", "culled",
                   "--frames", "3", "--fps-target", "0",
                   "--animation", "orbit", "--radius", "3"])
    assert res.returncode == 0, res.stderr[-2000:]
    assert "Median FPS" in res.stdout


def test_cli_sharded(scene_path):
    res = run_cli([scene_path, "40", "30", "--mode", "sharded",
                   "--frames", "2", "--fps-target", "0",
                   "--animation", "none"])
    assert res.returncode == 0, res.stderr[-2000:]
    assert "Mean FPS" in res.stdout


def test_cli_sharded_bvh(scene_path):
    res = run_cli([scene_path, "48", "36", "--mode", "sharded-bvh",
                   "--frames", "2", "--fps-target", "0",
                   "--animation", "none", "--devices", "4"])
    assert res.returncode == 0, res.stderr[-2000:]
    assert "Mean FPS" in res.stdout


def test_cli_bounces(scene_path):
    res = run_cli([scene_path, "48", "36", "--mode", "culled",
                   "--bounces", "1", "--frames", "2", "--fps-target", "0",
                   "--animation", "none"])
    assert res.returncode == 0, res.stderr[-2000:]
    assert "Mean FPS" in res.stdout


def test_cli_halo(scene_path):
    res = run_cli([scene_path, "48", "36", "--mode", "halo",
                   "--frames", "2", "--fps-target", "0",
                   "--animation", "none", "--devices", "4"])
    assert res.returncode == 0, res.stderr[-2000:]
    assert "Mean FPS" in res.stdout


def test_cli_ring(scene_path):
    res = run_cli([scene_path, "48", "36", "--mode", "ring",
                   "--frames", "2", "--fps-target", "0",
                   "--animation", "none", "--devices", "4"])
    assert res.returncode == 0, res.stderr[-2000:]
    assert "Mean FPS" in res.stdout


def test_cli_bad_args(scene_path):
    res = run_cli(["nonexistent.json", "48", "36"])
    assert res.returncode != 0
