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

# serialize every test in this file onto one xdist worker (pytest.ini
# --dist loadgroup): each spawns a 2-process x 4-device cluster of its own
pytestmark = pytest.mark.xdist_group("multiprocess")

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


@pytest.mark.slow
def test_two_process_fit_matches_single_process(tmp_path):
    """Round-4 VERDICT #4: the flagship fit (inverse-rendering) loop
    across a REAL process boundary. Render a --dump-raw target once,
    run `cli fit` on the 2-process x 4-device cluster, and compare the
    fitted albedo/power to a single-process 8-device fit: the global mesh
    is identical (8 devices) so the traced photons are identical and only
    the Gloo cross-process psum reduction order differs — the fits agree
    to float tolerance. The report is primary-only."""
    import json

    env8 = _worker_env()
    env8["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    tgt = tmp_path / "target"
    p = subprocess.run(
        [sys.executable, "-m", "flatmatch_tpu.cli", "render",
         str(FIXTURES / "tiny.png"), "30",
         "--engine", "photon_xla",
         "--samples-per-area", "8000", "--photons-per-batch", "1024",
         "--seed", "11", "--dump-raw", "--out", str(tgt)],
        env=env8, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        timeout=300,
    )
    assert p.returncode == 0, p.stdout.decode()

    fit_args = lambda out: [  # noqa: E731
        "fit", str(FIXTURES / "tiny.png"), str(tgt / "tiles"), "30",
        "--engine", "photon_xla",
        "--samples-per-area", "8000", "--photons-per-batch", "1024",
        "--seed", "11",
        "--fit-steps", "12", "--fit-lr", "0.2",
        "--fit-init-albedo", "0.5",
        "--out", str(out),
    ]
    rcs, logs = _run_two_procs(
        [fit_args(tmp_path / "f0"), fit_args(tmp_path / "f1")],
        [tmp_path / "f0"], timeout=600,
    )
    assert rcs == [0, 0], logs
    assert (tmp_path / "f0" / "fitted.json").exists()
    assert not (tmp_path / "f1" / "fitted.json").exists(), (
        "non-primary process wrote the fit report"
    )

    p = subprocess.run(
        [sys.executable, "-m", "flatmatch_tpu.cli",
         *fit_args(tmp_path / "fs")],
        env=env8, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        timeout=600,
    )
    assert p.returncode == 0, p.stdout.decode()

    multi = json.loads((tmp_path / "f0" / "fitted.json").read_text())
    single = json.loads((tmp_path / "fs" / "fitted.json").read_text())
    np.testing.assert_allclose(
        multi["albedo"], single["albedo"], rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        multi["power"], single["power"], rtol=2e-3, atol=2e-3
    )
    # the fit must actually have moved toward the target
    assert multi["final_loss"] < multi["initial_loss"] * 0.5, multi
    # truth is albedo 0.9 / power 1.0; from init 0.5 the 12 steps must
    # close most of the albedo gap on the well-lit walls (low-energy
    # walls carry little gradient at this tiny budget and move less)
    assert sum(a > 0.7 for a in multi["albedo"]) >= 4, multi["albedo"]
    assert max(multi["albedo"]) > 0.75, multi["albedo"]


_GRAD_WORKER = r'''
import json
import sys

sys.path.insert(0, "@REPO@")
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
from flatmatch_tpu.parallel import multihost

if len(sys.argv) > 1:
    multihost.initialize(
        coordinator=sys.argv[1],
        num_processes=int(sys.argv[2]),
        process_id=int(sys.argv[3]),
    )
import jax.numpy as jnp

from flatmatch_tpu.config import PhotonConfig
from flatmatch_tpu.diff.render import make_diff_renderer_sharded
from flatmatch_tpu.ops.device_scene import pack_emitters, pack_rects
from flatmatch_tpu.parallel.mesh import photon_mesh
from flatmatch_tpu.scene import geometry, image as im, layout

img = im.load_layout("@PNG@")
lay = layout.parse_layout(img, np.float32(1.0) / np.float32(30.0), 200.0)
scene = geometry.Scene(lay)
cfg = PhotonConfig(samples_per_area=4000.0, photons_per_batch=512, seed=3)
rects = pack_rects(scene.walls)
emitters = pack_emitters(
    scene, cfg.samples_per_area, cfg.window_color, cfg.light_color
)
render = make_diff_renderer_sharded(
    rects, emitters, scene.num_texels, cfg, photon_mesh()
)
albedo = jnp.full((len(scene.walls),), 0.7, jnp.float32)
power = jnp.full((emitters.pos.shape[0],), 1.3, jnp.float32)
ga, gp = jax.jit(
    jax.grad(lambda a, p: render(a, p).sum(), argnums=(0, 1))
)(albedo, power)
print("GRAD " + json.dumps(
    {"ga": np.asarray(ga).tolist(), "gp": np.asarray(gp).tolist()}
))
'''


@pytest.mark.slow
def test_two_process_sharded_grad_psum(tmp_path):
    """Round-4 VERDICT #4 (direct seam test): a sharded value_and_grad
    psums cotangents across the REAL process boundary. Both processes of
    a 2 x 4-device cluster compute the gradient of the sharded diff
    renderer; the [N]+[E] cotangents must be identical on both processes
    (the psum is a collective) and match a single-process 8-device run
    (same global mesh -> same photons) to float tolerance."""
    import json

    worker = tmp_path / "grad_worker.py"
    worker.write_text(
        _GRAD_WORKER.replace("@REPO@", REPO)
        .replace("@PNG@", str(FIXTURES / "tiny.png"))
    )

    def grads_from(log):
        for line in log.splitlines():
            if line.startswith("GRAD "):
                return json.loads(line[5:])
        raise AssertionError(f"no GRAD line in:\n{log}")

    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), f"localhost:{port}", "2",
             str(pid)],
            env=_worker_env(),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
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
    g0, g1 = grads_from(logs[0]), grads_from(logs[1])
    # the psum result is replicated: both processes hold the same grads
    np.testing.assert_allclose(g0["ga"], g1["ga"], rtol=1e-6)
    np.testing.assert_allclose(g0["gp"], g1["gp"], rtol=1e-6)

    env8 = _worker_env()
    env8["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    p = subprocess.run(
        [sys.executable, str(worker)], env=env8,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, timeout=300,
    )
    assert p.returncode == 0, p.stdout.decode()
    gs = grads_from(p.stdout.decode())
    assert np.abs(np.asarray(gs["ga"])).sum() > 0
    np.testing.assert_allclose(g0["ga"], gs["ga"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(g0["gp"], gs["gp"], rtol=1e-4, atol=1e-6)
