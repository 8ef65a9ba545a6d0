"""Wide AA photon megakernel vs the XLA engine (interpret mode on CPU)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from flatmatch_tpu.config import PhotonConfig
from flatmatch_tpu.engines import photon, photon_pallas, photon_pallas_wide
from flatmatch_tpu.ops.aa_scene import pack_aa
from flatmatch_tpu.ops.device_scene import pack_emitters, pack_rects
from flatmatch_tpu.scene import geometry, image as im, layout
from flatmatch_tpu.scene.rectangle import create_rect
from tests.conftest import FIXTURES

f32 = np.float32

# scatter splat: these tests pin exact tracing parity; the bucket splat's
# bf16 color quantization is covered separately below and in test_splat.py
CFG = PhotonConfig(
    samples_per_area=2000.0, photons_per_batch=512, seed=9, splat="scatter"
)


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


def test_device_rng_matches_statistically(tiny):
    """The in-kernel device-PRNG path (cfg.device_rng) targets the same
    integral as the threefry path: total energy and per-wall energies agree
    to MC tolerance (interpret mode). The streams differ by design —
    exactly the reference's CL-LCG vs native-rand() pair."""
    import dataclasses

    from flatmatch_tpu.scene.rectangle import num_tiles

    scene, rects, emitters = tiny
    aa = pack_aa(scene.walls)
    spa = 30000.0
    base = dataclasses.replace(
        CFG, samples_per_area=spa, photons_per_batch=1024
    )
    ems = pack_emitters(scene, spa, base.window_color, base.light_color)
    cfg_rng = dataclasses.replace(base, device_rng=True)
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(
            photon_pallas_wide.render_photons(
                rects, ems, scene.num_texels, base, aa, sublanes=1
            )
        )
        b = np.asarray(
            photon_pallas_wide.render_photons(
                rects, ems, scene.num_texels, cfg_rng, aa, sublanes=1
            )
        )
        # deterministic for a fixed seed schedule
        b2 = np.asarray(
            photon_pallas_wide.render_photons(
                rects, ems, scene.num_texels, cfg_rng, aa, sublanes=1
            )
        )
    np.testing.assert_array_equal(b, b2)
    np.testing.assert_allclose(b.sum(), a.sum(), rtol=0.03)
    for r in scene.walls:
        s = b[r.base : r.base + num_tiles(r)].sum()
        t = a[r.base : r.base + num_tiles(r)].sum()
        if t > a.sum() * 0.01:
            np.testing.assert_allclose(s, t, rtol=0.2)


def test_pack_aa_accepts_layout_scenes(tiny):
    scene, rects, emitters = tiny
    aa = pack_aa(scene.walls)
    assert aa is not None
    assert sum(aa.group_counts) == len(scene.walls)
    assert aa.fields.shape[1] == len(scene.walls)


def test_pack_aa_rejects_tilted_rect():
    r = create_rect((0, 0, 0), (1, 1, 0), (0, 0, 1), 200.0)  # 45-degree wall
    assert pack_aa([r]) is None


def test_wide_matches_xla_batch(tiny):
    scene, rects, emitters = tiny
    aa = pack_aa(scene.walls)
    B = 1024
    U = photon.uniforms_per_photon(CFG.max_depth)
    uniforms = jax.random.uniform(
        jax.random.PRNGKey(4), (B, U), dtype=np.float32
    )
    em = photon.EmitterSlice(
        pos=emitters.pos[0],
        wvec=emitters.wvec[0],
        hvec=emitters.hvec[0],
        n=emitters.n[0],
        color=emitters.color[0],
        is_window=emitters.is_window[0],
    )
    lm0 = jnp.zeros((scene.num_texels, 3), jnp.float32)
    lm_xla = np.asarray(
        jax.jit(photon.trace_batch, static_argnames=("cfg",))(
            lm0, rects, em, uniforms, B, CFG
        )
    )
    with pltpu.force_tpu_interpret_mode():
        lm_wide = np.asarray(
            photon_pallas_wide.trace_batch_wide(
                lm0,
                aa,
                photon_pallas.emitter_vector(em),
                uniforms,
                B,
                CFG,
                sublanes=4,
            )
        )
    assert lm_wide.sum() > 0
    close = np.isclose(lm_wide, lm_xla, rtol=1e-3, atol=1e-2)
    assert close.mean() > 0.999, f"only {close.mean():.4%} match"
    np.testing.assert_allclose(lm_wide.sum(), lm_xla.sum(), rtol=1e-4)


def test_wide_masks_invalid_photons(tiny):
    scene, rects, emitters = tiny
    aa = pack_aa(scene.walls)
    B = 512
    U = photon.uniforms_per_photon(CFG.max_depth)
    uniforms = jax.random.uniform(
        jax.random.PRNGKey(5), (B, U), dtype=np.float32
    )
    em = photon.EmitterSlice(
        pos=emitters.pos[0],
        wvec=emitters.wvec[0],
        hvec=emitters.hvec[0],
        n=emitters.n[0],
        color=emitters.color[0],
        is_window=emitters.is_window[0],
    )
    lm0 = jnp.zeros((scene.num_texels, 3), jnp.float32)
    run = functools.partial(
        photon_pallas_wide.trace_batch_wide,
        lm0,
        aa,
        photon_pallas.emitter_vector(em),
        uniforms,
        cfg=CFG,
        sublanes=4,
    )
    with pltpu.force_tpu_interpret_mode():
        half = np.asarray(run(n_valid=256))
        full = np.asarray(run(n_valid=512))
    assert 0 < half.sum() < full.sum()
    lm_xla_half = np.asarray(
        jax.jit(photon.trace_batch, static_argnames=("cfg",))(
            lm0, rects, em, uniforms, 256, CFG
        )
    )
    np.testing.assert_allclose(half.sum(), lm_xla_half.sum(), rtol=1e-4)


def test_wide_inkernel_splat_matches_fused(tiny):
    """The fused trace+splat kernel (cfg.splat='inkernel') bins the exact
    same deposits as trace_deposits_wide + ops/splat_pallas.fused_splat:
    identical one-hots, identical bf16 color quantization — only the f32
    accumulation order differs, so agreement is ~1 ulp, and the device-RNG
    variant must be deterministic."""
    import dataclasses

    from flatmatch_tpu.ops.splat_pallas import fused_splat

    scene, rects, emitters = tiny
    aa = pack_aa(scene.walls)
    B = 1024
    U = photon.uniforms_per_photon(CFG.max_depth)
    uniforms = jax.random.uniform(
        jax.random.PRNGKey(7), (B, U), dtype=np.float32
    )
    em = photon.EmitterSlice(
        pos=emitters.pos[0], wvec=emitters.wvec[0], hvec=emitters.hvec[0],
        n=emitters.n[0], color=emitters.color[0],
        is_window=emitters.is_window[0],
    )
    ev = photon_pallas.emitter_vector(em)
    with pltpu.force_tpu_interpret_mode():
        idx, col = photon_pallas_wide.trace_deposits_wide(
            aa.fields, ev, uniforms, B, CFG, aa.group_counts, sublanes=4
        )
        ref = np.asarray(fused_splat(idx, col, scene.num_texels))
        got = np.asarray(
            photon_pallas_wide.trace_splat_wide(
                aa.fields, ev, uniforms, B, CFG, aa.group_counts,
                scene.num_texels, sublanes=4,
            )
        )
        # the production entry point routes through the same kernel
        lm0 = jnp.zeros((scene.num_texels, 3), jnp.float32)
        via_cfg = np.asarray(
            photon_pallas_wide.trace_batch_wide(
                lm0, aa, ev, uniforms, B,
                dataclasses.replace(CFG, splat="inkernel"), sublanes=4,
            )
        )
        # device-RNG fused variant: deterministic per seed
        r1 = np.asarray(
            photon_pallas_wide.trace_splat_wide_rng(
                aa.fields, ev, 123, B, CFG, aa.group_counts,
                scene.num_texels, batch_size=B, sublanes=4,
            )
        )
        r2 = np.asarray(
            photon_pallas_wide.trace_splat_wide_rng(
                aa.fields, ev, 123, B, CFG, aa.group_counts,
                scene.num_texels, batch_size=B, sublanes=4,
            )
        )
    assert got.sum() > 0
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(via_cfg, got)
    np.testing.assert_array_equal(r1, r2)
    assert r1.sum() > 0
    np.testing.assert_allclose(r1.sum(), got.sum(), rtol=0.15)


@pytest.mark.parametrize("splat,rtol", [("bucket", 6e-3), ("bucket_exact", 1e-4)])
def test_wide_bucket_splat_modes(tiny, splat, rtol):
    """Bucket splat vs scatter on identical deposits: single-pass carries
    the bf16 color quantization, two-pass is f32-grade."""
    import dataclasses

    scene, rects, emitters = tiny
    aa = pack_aa(scene.walls)
    B = 512
    U = photon.uniforms_per_photon(CFG.max_depth)
    uniforms = jax.random.uniform(
        jax.random.PRNGKey(6), (B, U), dtype=np.float32
    )
    em = photon.EmitterSlice(
        pos=emitters.pos[0], wvec=emitters.wvec[0], hvec=emitters.hvec[0],
        n=emitters.n[0], color=emitters.color[0],
        is_window=emitters.is_window[0],
    )
    lm0 = jnp.zeros((scene.num_texels, 3), jnp.float32)
    ev = photon_pallas.emitter_vector(em)
    with pltpu.force_tpu_interpret_mode():
        ref = np.asarray(
            photon_pallas_wide.trace_batch_wide(
                lm0, aa, ev, uniforms, B, CFG, sublanes=4
            )
        )
        got = np.asarray(
            photon_pallas_wide.trace_batch_wide(
                lm0, aa, ev, uniforms, B,
                dataclasses.replace(CFG, splat=splat), sublanes=4,
            )
        )
    np.testing.assert_allclose(got, ref, rtol=rtol, atol=rtol * 10)
