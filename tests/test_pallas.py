"""Pallas photon megakernel vs the XLA engine (interpret mode on CPU; the
real-TPU run is exercised by bench.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from flatmatch_tpu.config import PhotonConfig
from flatmatch_tpu.engines import photon, photon_pallas
from flatmatch_tpu.ops.device_scene import pack_emitters, pack_rects
from flatmatch_tpu.scene import geometry, image as im, layout
from tests.conftest import FIXTURES

f32 = np.float32

CFG = PhotonConfig(samples_per_area=2000.0, photons_per_batch=512, seed=9)


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


def test_scene_matrix_roundtrip(tiny):
    scene, rects, _ = tiny
    m = np.asarray(photon_pallas.scene_matrix(rects))
    assert m.shape == (photon_pallas._NUM_F, rects.pos.shape[0])
    np.testing.assert_array_equal(m[0:3].T, np.asarray(rects.pos))
    np.testing.assert_array_equal(m[3:6].T, np.asarray(rects.n))
    np.testing.assert_array_equal(m[15], np.asarray(rects.base).astype(f32))


def test_pallas_matches_xla_batch(tiny):
    scene, rects, emitters = tiny
    B = 512
    U = photon.uniforms_per_photon(CFG.max_depth)
    uniforms = jax.random.uniform(
        jax.random.PRNGKey(1), (B, U), dtype=np.float32
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
    sceneT = photon_pallas.scene_matrix(rects)
    with pltpu.force_tpu_interpret_mode():
        lm_pal = np.asarray(
            photon_pallas.trace_batch_pallas(
                lm0,
                sceneT,
                photon_pallas.emitter_vector(em),
                uniforms,
                B,
                CFG,
                block_photons=128,
            )
        )
    assert lm_pal.sum() > 0
    close = np.isclose(lm_pal, lm_xla, rtol=1e-3, atol=1e-2)
    assert close.mean() > 0.999, f"only {close.mean():.4%} match"
    np.testing.assert_allclose(lm_pal.sum(), lm_xla.sum(), rtol=1e-4)


def test_pallas_masks_invalid_photons(tiny):
    scene, rects, emitters = tiny
    B = 256
    U = photon.uniforms_per_photon(CFG.max_depth)
    uniforms = jax.random.uniform(
        jax.random.PRNGKey(2), (B, U), dtype=np.float32
    )
    em = photon.EmitterSlice(
        pos=emitters.pos[0],
        wvec=emitters.wvec[0],
        hvec=emitters.hvec[0],
        n=emitters.n[0],
        color=emitters.color[0],
        is_window=emitters.is_window[0],
    )
    sceneT = photon_pallas.scene_matrix(rects)
    lm0 = jnp.zeros((scene.num_texels, 3), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        half = np.asarray(
            photon_pallas.trace_batch_pallas(
                lm0, sceneT, photon_pallas.emitter_vector(em),
                uniforms, 128, CFG, block_photons=128,
            )
        )
        full = np.asarray(
            photon_pallas.trace_batch_pallas(
                lm0, sceneT, photon_pallas.emitter_vector(em),
                uniforms, 256, CFG, block_photons=128,
            )
        )
    # masked photons contribute nothing; the first half is identical
    assert 0 < half.sum() < full.sum()
    lm_xla_half = np.asarray(
        jax.jit(photon.trace_batch, static_argnames=("cfg",))(
            lm0, rects, em, uniforms, 128, CFG
        )
    )
    np.testing.assert_allclose(half.sum(), lm_xla_half.sum(), rtol=1e-4)
