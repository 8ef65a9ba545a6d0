"""Multi-chip photon sharding on the 8-device virtual CPU mesh (SURVEY.md §4:
multi-host tests on CPU fakes)."""
import dataclasses

import jax
import numpy as np
import pytest

from flatmatch_tpu.config import PhotonConfig
from flatmatch_tpu.engines import photon
from flatmatch_tpu.ops.device_scene import pack_emitters, pack_rects
from flatmatch_tpu.parallel.mesh import photon_mesh, render_photons_sharded
from flatmatch_tpu.scene import geometry, image as im, layout
from tests.conftest import FIXTURES

f32 = np.float32

CFG = PhotonConfig(samples_per_area=20000.0, photons_per_batch=1024, seed=11)


@pytest.fixture(scope="module")
def tiny():
    img = im.load_layout(str(FIXTURES / "tiny.png"))
    lay = layout.parse_layout(img, f32(1.0) / f32(30.0), 200.0)
    scene = geometry.Scene(lay)
    rects = pack_rects(scene.walls)
    emitters = pack_emitters(
        scene, CFG.samples_per_area, CFG.window_color, CFG.light_color
    )
    return scene, rects, emitters


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_deterministic(tiny):
    scene, rects, emitters = tiny
    mesh = photon_mesh()
    a = np.asarray(
        render_photons_sharded(rects, emitters, scene.num_texels, CFG, mesh)
    )
    b = np.asarray(
        render_photons_sharded(rects, emitters, scene.num_texels, CFG, mesh)
    )
    np.testing.assert_array_equal(a, b)
    assert a.sum() > 0


def test_sharded_matches_single_chip_statistically(tiny):
    """Same photon budget, different RNG partition: the two estimates target
    the same integral, so aggregate energy must agree to MC tolerance."""
    scene, rects, emitters = tiny
    mesh = photon_mesh()
    sharded = np.asarray(
        render_photons_sharded(rects, emitters, scene.num_texels, CFG, mesh)
    )
    single = np.asarray(
        photon.render_photons(rects, emitters, scene.num_texels, CFG)
    )
    assert sharded.shape == single.shape
    np.testing.assert_allclose(sharded.sum(), single.sum(), rtol=0.02)
    # per-wall energy also agrees (coarser than per-texel, robust to noise)
    for r in scene.walls:
        from flatmatch_tpu.scene.rectangle import num_tiles

        s = sharded[r.base : r.base + num_tiles(r)].sum()
        t = single[r.base : r.base + num_tiles(r)].sum()
        if t > 1e3:  # skip nearly-unlit walls, pure noise
            np.testing.assert_allclose(s, t, rtol=0.15)


def test_sharded_wide_matches_sharded_xla(tiny):
    """The sharded wide-Pallas engine keys draws per (batch, device) exactly
    like the sharded XLA engine, so at the scatter splat the two trace
    identical photons (interpret mode on CPU)."""
    from jax.experimental.pallas import tpu as pltpu

    from flatmatch_tpu.ops.aa_scene import pack_aa
    from flatmatch_tpu.parallel.mesh import render_photons_sharded_wide

    scene, rects, emitters = tiny
    aa = pack_aa(scene.walls)
    assert aa is not None
    mesh = photon_mesh()
    # reduced budget: the keying property is per-photon, not statistical,
    # so a few batches of coverage gate it (interpret mode is ~1000x)
    cfg = dataclasses.replace(CFG, splat="scatter", samples_per_area=4000.0)
    ems = pack_emitters(
        scene, cfg.samples_per_area, cfg.window_color, cfg.light_color
    )
    xla = np.asarray(
        render_photons_sharded(rects, ems, scene.num_texels, cfg, mesh)
    )
    with pltpu.force_tpu_interpret_mode():
        wide = np.asarray(
            render_photons_sharded_wide(
                rects, ems, scene.num_texels, cfg, aa, mesh
            )
        )
    np.testing.assert_allclose(wide, xla, rtol=2e-5, atol=2e-3)


def test_sharded_wide_inkernel_matches_fused(tiny):
    """The sharded fused trace+splat path (cfg.splat='inkernel') bins the
    same deposits as the sharded separate fused-splat path — identical
    draws, identical bf16 quantization, only f32 accumulation order
    differs."""
    from jax.experimental.pallas import tpu as pltpu

    from flatmatch_tpu.ops.aa_scene import pack_aa
    from flatmatch_tpu.parallel.mesh import render_photons_sharded_wide

    scene, rects, emitters = tiny
    aa = pack_aa(scene.walls)
    # 2 devices + reduced budget: the property (two splat modes bin the
    # same deposits under sharding) is per-deposit; the 8-device mesh is
    # exercised by the other sharded tests
    mesh = photon_mesh(jax.devices()[:2])
    cfg = dataclasses.replace(CFG, samples_per_area=4000.0)
    ems = pack_emitters(
        scene, cfg.samples_per_area, cfg.window_color, cfg.light_color
    )
    with pltpu.force_tpu_interpret_mode():
        ref = np.asarray(
            render_photons_sharded_wide(
                rects, ems, scene.num_texels,
                dataclasses.replace(cfg, splat="fused"), aa, mesh,
            )
        )
        got = np.asarray(
            render_photons_sharded_wide(
                rects, ems, scene.num_texels,
                dataclasses.replace(cfg, splat="inkernel"), aa, mesh,
            )
        )
    assert got.sum() > 0
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    # the int8-rate variant under sharding: deterministic, unbiased
    # (energy to MC tolerance), per-texel within the 7-bit grid's noise
    from flatmatch_tpu.engines.photon_pallas_wide import splat_color_scale

    cfg_i8 = dataclasses.replace(cfg, splat="inkernel_i8")
    with pltpu.force_tpu_interpret_mode():
        i8 = np.asarray(
            render_photons_sharded_wide(
                rects, ems, scene.num_texels, cfg_i8, aa, mesh,
            )
        )
        i8b = np.asarray(
            render_photons_sharded_wide(
                rects, ems, scene.num_texels, cfg_i8, aa, mesh,
            )
        )
    np.testing.assert_array_equal(i8, i8b)
    np.testing.assert_allclose(i8.sum(), ref.sum(), rtol=2e-3)
    scale = splat_color_scale(cfg_i8)
    assert np.abs(i8 - ref).max() < scale * 40
    assert np.abs(i8 - ref).mean() < scale


def test_sharded_checkpoint_resume_bit_identical(tiny, tmp_path):
    """Sharded renders checkpoint/resume with the same bit-identity
    guarantee as single-device ones (fingerprint includes the mesh size)."""
    scene, rects, emitters = tiny
    mesh = photon_mesh()
    # bit-identity requires identical segmentation (the sharded engines
    # psum once per segment): pass the same every_batches to both
    straight = np.asarray(
        render_photons_sharded(
            rects, emitters, scene.num_texels, CFG, mesh, every_batches=2
        )
    )
    path = str(tmp_path / "ck.npz")
    chunked = np.asarray(
        render_photons_sharded(
            rects, emitters, scene.num_texels, CFG, mesh,
            checkpoint_path=path, every_batches=2,
        )
    )
    np.testing.assert_array_equal(straight, chunked)

    # the saved cursor resumes to the same result
    from flatmatch_tpu.utils import checkpoint as ckpt

    B = CFG.photons_per_batch
    fp = ckpt.config_fingerprint(
        CFG, scene.num_texels, np.asarray(emitters.counts),
        extra=("xla-sharded", 8, B, 2),
    )
    assert ckpt.load(path, fp) is not None


def test_pipeline_auto_selects_sharded_engine(tiny):
    """render.run_engine with mesh='auto' on the 8-device env dispatches the
    sharded engine and matches the single-device path statistically
    (VERDICT r1 #1: the dispatch IS the pipeline)."""
    from flatmatch_tpu.config import DEFAULT_CONFIG, Engine
    from flatmatch_tpu.render import run_engine

    scene, rects, emitters = tiny
    cfg = DEFAULT_CONFIG.replace(engine=Engine.PHOTON_XLA, photon=CFG)
    sharded = run_engine(scene, cfg, mesh="auto")
    single = run_engine(scene, cfg, mesh=None)
    np.testing.assert_allclose(
        sharded.sum(), single.sum(), rtol=0.02
    )


def test_sharded_ao_bit_identical(tiny):
    """AO sharded over the mesh is BIT-identical to the single-device
    Pallas engine (deterministic, texel-disjoint work, no collectives)."""
    from jax.experimental.pallas import tpu as pltpu

    from flatmatch_tpu.config import AoConfig
    from flatmatch_tpu.engines import ao_pallas
    from flatmatch_tpu.ops.aa_scene import pack_aa
    from flatmatch_tpu.parallel.mesh import render_ao_sharded

    scene, rects, emitters = tiny
    aa = pack_aa(scene.walls)
    # geosphere level 2 (19 rays/texel): same mechanism, 25x less
    # interpret-mode work than the production 481-ray table (whose
    # on-hardware parity is gated by tools/ao_hardware_gate.py)
    cfg = AoConfig(geosphere_level=2)
    # 2 devices: texel-disjoint bit-identity holds per shard; halves the
    # interpret-mode kernel count vs the full 8-device mesh
    with pltpu.force_tpu_interpret_mode():
        single = ao_pallas.render_ao(scene, aa, cfg)
        sharded = render_ao_sharded(
            scene, aa, cfg, photon_mesh(jax.devices()[:2])
        )
    np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=1e-6)


def test_sharded_fused_ao_bit_identical(tiny):
    """The fused-expansion AO (production default since round 5) sharded
    over the mesh is BIT-identical to the single-device fused pass: the
    per-wall texel blocks divide across devices (device padding replays
    block 0, discarded by the gather-back), zero collectives."""
    from jax.experimental.pallas import tpu as pltpu

    from flatmatch_tpu.config import AoConfig
    from flatmatch_tpu.engines import ao_pallas
    from flatmatch_tpu.ops.aa_scene import pack_aa
    from flatmatch_tpu.parallel.mesh import render_ao_fused_sharded

    scene, rects, emitters = tiny
    aa = pack_aa(scene.walls)
    cfg = AoConfig(geosphere_level=2)   # see test_sharded_ao_bit_identical
    with pltpu.force_tpu_interpret_mode():
        single = ao_pallas.render_ao_fused(scene, aa, cfg, sublanes=8)
        # 3 devices: exercises REAL block padding (block counts are not
        # a multiple of 3)
        sharded = render_ao_fused_sharded(
            scene, aa, cfg, photon_mesh(jax.devices()[:3]), sublanes=8
        )
    np.testing.assert_array_equal(sharded, single)


def test_sharded_radiosity_matches_statistically(tiny):
    """Radiosity with the ray axis sharded over the mesh targets the same
    integral as the single-device engine (different ray partition, so
    agreement is statistical)."""
    from flatmatch_tpu.config import RadiosityConfig
    from flatmatch_tpu.engines.radiosity import (
        render_radiosity, render_radiosity_sharded,
    )

    scene, rects, emitters = tiny
    cfg = RadiosityConfig(rays_per_texel=256, iterations=3, seed=4)
    single = render_radiosity(scene, cfg)
    sharded = render_radiosity_sharded(scene, cfg, photon_mesh())
    assert sharded.shape == single.shape
    np.testing.assert_allclose(sharded.sum(), single.sum(), rtol=0.03)
    corr = np.corrcoef(sharded.ravel(), single.ravel())[0, 1]
    # per-texel MC sigma at 256 rays is ~6%; 0.98 is the matching bar
    assert corr > 0.98, corr
    # deterministic for fixed (seed, mesh)
    again = render_radiosity_sharded(scene, cfg, photon_mesh())
    np.testing.assert_array_equal(sharded, again)


def test_sharded_respects_last_batch_mask(tiny):
    """A photon budget that is not a multiple of (batch x devices) must not
    trace padding photons: energy scales linearly with the budget."""
    scene, rects, emitters = tiny
    mesh = photon_mesh()
    half_cfg = dataclasses.replace(CFG, samples_per_area=CFG.samples_per_area / 2)
    half_emitters = pack_emitters(
        scene, half_cfg.samples_per_area, CFG.window_color, CFG.light_color
    )
    full = np.asarray(
        render_photons_sharded(rects, emitters, scene.num_texels, CFG, mesh)
    )
    half = np.asarray(
        render_photons_sharded(
            rects, half_emitters, scene.num_texels, half_cfg, mesh
        )
    )
    np.testing.assert_allclose(half.sum() * 2, full.sum(), rtol=0.05)


def test_sharded_fit_recovers_power():
    """Inverse rendering over the photon mesh: a power-only fit against a
    target rendered by the SAME sharded renderer recovers the true powers
    (the mesh path of diff/fit.py)."""
    import jax.numpy as jnp

    from flatmatch_tpu.config import PhotonConfig
    from flatmatch_tpu.diff.fit import fit_materials, make_renderer
    from flatmatch_tpu.ops.device_scene import pack_emitters, pack_rects
    from flatmatch_tpu.parallel.mesh import photon_mesh
    from flatmatch_tpu.scene import geometry, image as im, layout
    from tests.conftest import FIXTURES

    img = im.load_layout(str(FIXTURES / "tiny.png"))
    lay = layout.parse_layout(
        img, np.float32(1.0) / np.float32(30.0), 200.0
    )
    scene = geometry.Scene(lay)
    cfg = PhotonConfig(samples_per_area=2000.0, photons_per_batch=512,
                       seed=9)
    rects = pack_rects(scene.walls)
    emitters = pack_emitters(
        scene, cfg.samples_per_area, cfg.window_color, cfg.light_color
    )
    mesh = photon_mesh()
    render = make_renderer(rects, emitters, scene.num_texels, cfg,
                           mesh=mesh)
    n_em = len(np.asarray(emitters.counts))
    p_true = jnp.asarray(1.0 + 0.5 * (np.arange(n_em) + 1) / n_em,
                         jnp.float32)
    a0 = jnp.full((rects.pos.shape[0],), cfg.albedo, jnp.float32)
    target = np.asarray(render(a0, p_true))

    res = fit_materials(
        target, rects, emitters, scene.num_texels, cfg,
        mesh=mesh, steps=120, learning_rate=0.05, fit_albedo=False,
    )
    assert res.losses[-1] < 1e-4, res.losses[-1]
    np.testing.assert_allclose(res.power, np.asarray(p_true), rtol=0.02)


def test_sharded_segment_lowers_one_psum_and_local_batches(tiny):
    """Scaling regression guard (round-4 VERDICT #6): a sharded emitter
    segment must lower to exactly ONE all-reduce (the per-segment lightmap
    psum, mesh.py:100-103) and must draw uniforms at the SHARD-LOCAL batch
    size — a regression that psums per batch, or traces the global batch
    per device, would silently destroy scaling without failing any value
    test (virtual CPU devices share host cores, so timing tests can't see
    it either)."""
    import jax.numpy as jnp

    from flatmatch_tpu.engines.photon import uniforms_per_photon
    from flatmatch_tpu.engines.schedule import emitter_slice
    from flatmatch_tpu.parallel.mesh import _trace_emitter_sharded

    scene, rects, emitters = tiny
    cfg = CFG
    mesh = photon_mesh()
    n_dev = mesh.shape["photons"]
    B = 1024
    b_local = B // n_dev
    U = uniforms_per_photon(cfg.max_depth)
    lm = jnp.zeros((scene.num_texels, 3), jnp.float32)
    txt = _trace_emitter_sharded.lower(
        lm, rects, emitter_slice(emitters, 0), jax.random.PRNGKey(1),
        0, 0, 4, jnp.int32(4), jnp.int32(B), cfg, B, mesh,
    ).as_text()
    assert txt.count("all_reduce") == 1, txt.count("all_reduce")
    assert f"tensor<{b_local}x{U}xf32>" in txt, "shard-local uniforms"
    assert f"tensor<{B}x{U}xf32>" not in txt, "global-size uniforms leaked"


def test_sharded_wide_degrades_fused_splat(tiny, monkeypatch):
    """Past the fused-splat VMEM ceiling the SHARDED wide engine degrades
    to the deposit-stream tier exactly like the single-chip one (the
    replicated accumulator makes the per-chip footprint identical):
    forced by shrinking the limit; output equals an explicit scatter-tier
    sharded run."""
    import dataclasses
    import io
    from contextlib import redirect_stderr

    from jax.experimental.pallas import tpu as pltpu

    from flatmatch_tpu.engines import photon_pallas_wide as W
    from flatmatch_tpu.ops.aa_scene import pack_aa
    from flatmatch_tpu.parallel.mesh import render_photons_sharded_wide

    scene, rects, emitters = tiny
    aa = pack_aa(scene.walls)
    cfg_fused = dataclasses.replace(
        CFG, splat="inkernel", photons_per_batch=512,
        samples_per_area=5000.0,
    )
    cfg_scatter = dataclasses.replace(cfg_fused, splat="scatter")
    mesh = photon_mesh(jax.devices()[:2])
    monkeypatch.setattr(W, "FUSED_ACC_VMEM_LIMIT_BYTES", 1024)
    err = io.StringIO()
    with pltpu.force_tpu_interpret_mode(), redirect_stderr(err):
        degraded = np.asarray(render_photons_sharded_wide(
            rects, emitters, scene.num_texels, cfg_fused, aa, mesh,
            sublanes=1,
        ))
        scatter = np.asarray(render_photons_sharded_wide(
            rects, emitters, scene.num_texels, cfg_scatter, aa, mesh,
            sublanes=1,
        ))
    assert "VMEM" in err.getvalue()
    np.testing.assert_array_equal(degraded, scatter)
    assert degraded.sum() > 0
