"""Multi-PROCESS distributed render: 2 processes x 4 virtual CPU devices
via jax.distributed (Gloo CPU collectives), driving the production CLI.

This is the multi-host story the reference never had (SURVEY.md §2
"Collective backend: none"): every process runs the same
`python -m flatmatch_tpu.cli render` command; the sharded engine psums over
all 8 global devices; only process 0 writes artifacts.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import FIXTURES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # keep the workers off any ambient TPU tunnel / cluster detection
    # (the axon sitecustomize registers its PJRT plugin — and overrides
    # the platform — whenever PALLAS_AXON_POOL_IPS is set)
    env.pop("TPU_WORKER_HOSTNAMES", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


def test_two_process_render(tmp_path):
    port = _free_port()
    outs = [tmp_path / "out0", tmp_path / "out1"]
    procs = []
    for pid in range(2):
        cmd = [
            sys.executable, "-m", "flatmatch_tpu.cli", "render",
            str(FIXTURES / "tiny.png"), "30",
            "--engine", "photon_xla",
            "--samples-per-area", "20000",
            "--photons-per-batch", "1024",
            "--seed", "11",
            "--coordinator", f"localhost:{port}",
            "--num-processes", "2",
            "--process-id", str(pid),
            "--out", str(outs[pid]),
        ]
        procs.append(
            subprocess.Popen(
                cmd, env=_worker_env(),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out.decode())
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"process {pid} failed:\n{log}"
    assert "process 0/2" in logs[0]
    assert "8 global devices" in logs[0]
    assert "sharded" in logs[0]

    # only the primary writes artifacts
    assert (outs[0] / "geometry.json").exists()
    assert (outs[0] / "collisionMap.json").exists()
    tiles = sorted(
        (outs[0] / "tiles").glob("tile_*.png"),
        key=lambda p: int(p.stem.split("_")[1]),
    )
    assert tiles, "primary wrote no tiles"
    assert not outs[1].exists() or not any(outs[1].iterdir()), (
        "non-primary process wrote artifacts"
    )

    # the 2x4-process render traces the EXACT same photons as a
    # single-process 8-device one (draws are keyed per (batch, GLOBAL
    # device index)); only the cross-process psum reduction order differs,
    # so tone-mapped tiles agree to 1 LSB per channel
    from flatmatch_tpu.config import PhotonConfig
    from flatmatch_tpu.io import tiles as tiles_io
    from flatmatch_tpu.ops.device_scene import (
        exposure_scale, pack_emitters, pack_rects,
    )
    from flatmatch_tpu.parallel.mesh import (
        photon_mesh, render_photons_sharded,
    )
    from flatmatch_tpu.scene import geometry, image as im, layout

    cfg = PhotonConfig(
        samples_per_area=20000.0, photons_per_batch=1024, seed=11
    )
    img = im.load_layout(str(FIXTURES / "tiny.png"))
    lay = layout.parse_layout(
        img, np.float32(1.0) / np.float32(30.0), 200.0
    )
    scene = geometry.Scene(lay)
    rects = pack_rects(scene.walls)
    emitters = pack_emitters(
        scene, cfg.samples_per_area, cfg.window_color, cfg.light_color
    )
    lightmap = np.asarray(
        render_photons_sharded(
            rects, emitters, scene.num_texels, cfg, photon_mesh()
        )
    )
    scale = exposure_scale(scene, cfg.samples_per_area, cfg.exposure)
    texels = lightmap * scale[:, None]
    ref_tiles = tiles_io.save_tiles(
        scene.walls, texels, str(tmp_path / "ref_tiles"), False
    )
    from PIL import Image

    assert len(ref_tiles) == len(tiles)
    for got, want in zip(tiles, ref_tiles):
        a = np.asarray(Image.open(got), np.int16)
        b = np.asarray(Image.open(want), np.int16)
        assert a.shape == b.shape
        diff = int(np.abs(a - b).max())
        assert diff <= 1, (
            f"{got.name} differs from single-process 8-device render "
            f"by {diff} LSB"
        )
