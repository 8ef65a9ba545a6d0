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


def _run_two_procs(args_extra, outs, env_extra=None, timeout=300):
    """Launch the same CLI command on 2 processes x 4 virtual devices;
    returns (returncodes, logs)."""
    port = _free_port()
    procs = []
    for pid in range(2):
        cmd = [
            sys.executable, "-m", "flatmatch_tpu.cli", *args_extra[pid],
            "--coordinator", f"localhost:{port}",
            "--num-processes", "2",
            "--process-id", str(pid),
        ]
        env = _worker_env()
        if env_extra:
            env.update(env_extra)
        procs.append(
            subprocess.Popen(
                cmd, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    logs, rcs = [], []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out.decode())
        rcs.append(p.returncode)
    return rcs, logs


def _render_args(out, ckpt, extra=()):
    return [
        "render", str(FIXTURES / "tiny.png"), "30",
        "--engine", "photon_xla",
        "--samples-per-area", "20000",
        "--photons-per-batch", "128",
        "--checkpoint-every", "1",
        "--seed", "11",
        "--checkpoint", str(ckpt),
        "--out", str(out),
        *extra,
    ]


def _tile_bytes(outdir):
    tiles = sorted(
        (outdir / "tiles").glob("tile_*.png"),
        key=lambda p: int(p.stem.split("_")[1]),
    )
    assert tiles, f"no tiles under {outdir}"
    return [t.read_bytes() for t in tiles]


@pytest.mark.slow
def test_two_process_checkpoint_kill_resume(tmp_path):
    """VERDICT r3 #4a: kill BOTH workers mid-render (fault injection after
    2 checkpoint rounds), relaunch the same command, and the resumed
    2-process render's tiles must be BYTE-identical to an uninterrupted
    2-process run's."""
    # uninterrupted reference run
    rcs, logs = _run_two_procs(
        [_render_args(tmp_path / "ref0", tmp_path / "ref.npz"),
         _render_args(tmp_path / "ref_nope", tmp_path / "ref.npz")],
        [tmp_path / "ref0"],
    )
    assert rcs == [0, 0], logs
    ref = _tile_bytes(tmp_path / "ref0")

    # killed run: both processes hard-exit(17) after 2 checkpoint rounds
    args = [_render_args(tmp_path / "out0", tmp_path / "kill.npz"),
            _render_args(tmp_path / "out_nope", tmp_path / "kill.npz")]
    rcs, logs = _run_two_procs(
        args, [tmp_path / "out0"],
        env_extra={"FLATMATCH_FAULT_EXIT_AFTER_CHECKPOINTS": "2"},
    )
    # both must die mid-render; the coordinator process (0) may be torn
    # down by the distributed runtime's peer-loss handler (rc 1) racing
    # its own fault exit (rc 17) — either way it is dead and un-exited
    assert all(rc != 0 for rc in rcs), (rcs, logs)
    assert 17 in rcs, (rcs, logs)
    assert (tmp_path / "kill.npz").exists(), "no checkpoint written"
    # which process's log carries the marker depends on who the runtime
    # tears down first
    assert any("FAULT INJECTION" in l for l in logs), logs

    # relaunch: resumes from the checkpoint and completes
    rcs, logs = _run_two_procs(args, [tmp_path / "out0"])
    assert rcs == [0, 0], logs
    assert "resuming" in logs[0].lower(), logs[0]
    got = _tile_bytes(tmp_path / "out0")
    assert len(got) == len(ref)
    for i, (a, b) in enumerate(zip(got, ref)):
        assert a == b, f"tile {i} differs after kill/resume"


@pytest.mark.slow
def test_checkpoint_refuses_different_device_count(tmp_path):
    """VERDICT r3 #4c: a checkpoint from a 2-process x 4-device run (8
    global devices) must REFUSE to resume on 4 global devices — the draws
    are keyed per (batch, global device), so a different mesh width would
    silently trace different photons."""
    args = [_render_args(tmp_path / "o0", tmp_path / "ck.npz"),
            _render_args(tmp_path / "o1", tmp_path / "ck.npz")]
    rcs, logs = _run_two_procs(
        args, [tmp_path / "o0"],
        env_extra={"FLATMATCH_FAULT_EXIT_AFTER_CHECKPOINTS": "2"},
    )
    assert all(rc != 0 for rc in rcs) and 17 in rcs, (rcs, logs)
    assert (tmp_path / "ck.npz").exists()

    # single process, 4 devices: fingerprint (xla-sharded, n_dev=4) differs
    env = _worker_env()
    p = subprocess.run(
        [sys.executable, "-m", "flatmatch_tpu.cli",
         *_render_args(tmp_path / "o4", tmp_path / "ck.npz")],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        timeout=300,
    )
    out = p.stdout.decode()
    assert p.returncode != 0, "resume with a different device count succeeded"
    assert "fingerprint" in out.lower() or "checkpoint" in out.lower(), out


@pytest.mark.slow
def test_two_process_package_matches_single_process(tmp_path):
    """VERDICT r3 #4b: `package` on 2 processes writes the REST tree from
    the primary only, byte-identical to a single-process 8-device run
    (same global mesh -> same photons -> same tiles -> same base64)."""
    pkg_args = lambda out: [
        "package", str(FIXTURES / "tiny.png"), "137", "30",
        "52.5", "13.4", "0.0", "2",
        "--engine", "photon_xla",
        "--samples-per-area", "20000",
        "--photons-per-batch", "1024",
        "--seed", "11",
        "--out", str(out),
    ]
    rcs, logs = _run_two_procs(
        [pkg_args(tmp_path / "p0"), pkg_args(tmp_path / "p1")],
        [tmp_path / "p0"],
    )
    assert rcs == [0, 0], logs
    assert not (tmp_path / "p1").exists() or not any(
        (tmp_path / "p1").iterdir()
    ), "non-primary wrote the REST tree"

    env = _worker_env()
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    p = subprocess.run(
        [sys.executable, "-m", "flatmatch_tpu.cli",
         *pkg_args(tmp_path / "single")],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        timeout=300,
    )
    assert p.returncode == 0, p.stdout.decode()

    multi = sorted(
        q.relative_to(tmp_path / "p0")
        for q in (tmp_path / "p0").rglob("*") if q.is_file()
    )
    single = sorted(
        q.relative_to(tmp_path / "single")
        for q in (tmp_path / "single").rglob("*") if q.is_file()
    )
    assert multi == single and multi, (multi, single)
    for rel in multi:
        a = (tmp_path / "p0" / rel).read_bytes()
        b = (tmp_path / "single" / rel).read_bytes()
        assert a == b, f"{rel} differs between 2-process and 1-process"
