"""MXU bucket splat vs scatter-add ground truth."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flatmatch_tpu.ops.splat import bucket_splat, scatter_splat

pytestmark = pytest.mark.fast


def _case(R, T, seed):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    idx = jax.random.randint(k1, (R,), 0, T, dtype=jnp.int32)
    col = jax.random.uniform(k2, (R, 3), dtype=jnp.float32) * 18.0
    return idx, col


def test_bucket_splat_matches_scatter():
    R, T = 8192, 1000
    idx, col = _case(R, T, 0)
    ref = np.asarray(scatter_splat(jnp.zeros((T, 3), jnp.float32), idx, col))
    fast = np.asarray(bucket_splat(idx, col, T, chunk=2048))
    # single-pass: colors quantize to bf16 (~0.4% per deposit)
    np.testing.assert_allclose(fast, ref, rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(fast.sum(), ref.sum(), rtol=2e-3)


def test_bucket_splat_exact_mode():
    R, T = 8192, 1000
    idx, col = _case(R, T, 1)
    ref = np.asarray(scatter_splat(jnp.zeros((T, 3), jnp.float32), idx, col))
    fast = np.asarray(bucket_splat(idx, col, T, chunk=2048, exact=True))
    np.testing.assert_allclose(fast, ref, rtol=1e-4, atol=1e-3)


def test_bucket_splat_padding_and_zero_rows():
    # R not a multiple of chunk; masked rows carry zero color
    R, T = 3000, 257
    idx, col = _case(R, T, 2)
    col = col.at[100:200].set(0.0)
    ref = np.asarray(scatter_splat(jnp.zeros((T, 3), jnp.float32), idx, col))
    fast = np.asarray(bucket_splat(idx, col, T, chunk=1024, exact=True))
    np.testing.assert_allclose(fast, ref, rtol=1e-4, atol=1e-3)


def test_bucket_splat_deterministic():
    idx, col = _case(4096, 512, 3)
    a = np.asarray(bucket_splat(idx, col, 512))
    b = np.asarray(bucket_splat(idx, col, 512))
    np.testing.assert_array_equal(a, b)


def test_fused_splat_matches_scatter():
    from jax.experimental.pallas import tpu as pltpu

    from flatmatch_tpu.ops.splat_pallas import fused_splat

    R, T = 8192, 1000
    idx, col = _case(R, T, 4)
    ref = np.asarray(scatter_splat(jnp.zeros((T, 3), jnp.float32), idx, col))
    with pltpu.force_tpu_interpret_mode():
        fast = np.asarray(fused_splat(idx, col, T, groups=128))
    np.testing.assert_allclose(fast, ref, rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(fast.sum(), ref.sum(), rtol=2e-3)


def test_fused_splat_padding():
    from jax.experimental.pallas import tpu as pltpu

    from flatmatch_tpu.ops.splat_pallas import fused_splat

    R, T = 3000, 257
    idx, col = _case(R, T, 5)
    col = col.at[50:120].set(0.0)
    ref = np.asarray(scatter_splat(jnp.zeros((T, 3), jnp.float32), idx, col))
    with pltpu.force_tpu_interpret_mode():
        fast = np.asarray(fused_splat(idx, col, T, groups=128))
    np.testing.assert_allclose(fast, ref, rtol=1e-2, atol=1e-2)


def test_fused_splat_depth_modes():
    """The production depth (K=512 per MXU pass) bins identically to
    scatter ground truth; padding to the larger step stays exact-zero."""
    from jax.experimental.pallas import tpu as pltpu

    from flatmatch_tpu.ops.splat_pallas import fused_splat

    R, T = 70000, 1000  # pads to 2 x 65536 at depth=512
    idx, col = _case(R, T, 6)
    ref = np.asarray(scatter_splat(jnp.zeros((T, 3), jnp.float32), idx, col))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(fused_splat(idx, col, T, depth=512))
    np.testing.assert_allclose(out, ref, rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(out.sum(), ref.sum(), rtol=2e-3)


def _np_dither01(n, channels=3):
    """NumPy twin of ops/splat_pallas.dither01 (murmur3 fmix32 hash)."""
    c = (
        np.arange(n, dtype=np.uint32)[:, None] * np.uint32(channels)
        + np.arange(channels, dtype=np.uint32)
    )
    x = c * np.uint32(0x9E3779B9)
    x ^= x >> np.uint32(16)
    x *= np.uint32(0x85EBCA6B)
    x ^= x >> np.uint32(13)
    x *= np.uint32(0xC2B2AE35)
    x ^= x >> np.uint32(16)
    return (x >> np.uint32(8)).astype(np.float32) * np.float32(1.0 / (1 << 24))


def test_fused_splat_i8_matches_quantization_model():
    """The int8 splat is EXACT integer binning of dither-quantized colors:
    a NumPy twin of the quantization reproduces it to within one grid step
    (the only slack is XLA fusing the scale-multiply-add into an FMA)."""
    from jax.experimental.pallas import tpu as pltpu

    from flatmatch_tpu.ops.splat_pallas import fused_splat_i8

    R, T = 8192, 1000
    scale = 18.0 / 127.0
    idx, col = _case(R, T, 7)
    col = col.at[100:200].set(0.0)  # masked deposits must stay exact +0
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(fused_splat_i8(idx, col, T, scale=scale))

    u = _np_dither01(R)
    colq = np.clip(
        np.floor(
            np.asarray(col, np.float32) * np.float32(1.0 / scale) + u
        ), 0.0, 127.0,
    ).astype(np.int64)
    twin = np.zeros((T, 3), np.int64)
    np.add.at(twin, np.asarray(idx), colq)
    twin_f = twin.astype(np.float32) * np.float32(scale)
    # per-texel: at most 1 quantization step of slack, and ~all exact
    diff = np.abs(out - twin_f)
    assert diff.max() <= scale * 1.001, diff.max()
    assert (diff == 0).mean() > 0.999

    # zero-color rows contributed exactly nothing
    only_masked = np.zeros((T, 3), np.int64)
    np.add.at(only_masked, np.asarray(idx[100:200]), colq[100:200])
    assert only_masked.sum() == 0


def test_fused_splat_i8_unbiased_and_bounded():
    """Dithered quantization is unbiased (energy matches f32 scatter to MC
    tolerance) and per-texel error stays ~scale*sqrt(n) noise-level."""
    from jax.experimental.pallas import tpu as pltpu

    from flatmatch_tpu.ops.splat_pallas import fused_splat_i8

    R, T = 16384, 500
    scale = 18.0 / 127.0
    idx, col = _case(R, T, 8)
    ref = np.asarray(scatter_splat(jnp.zeros((T, 3), jnp.float32), idx, col))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(fused_splat_i8(idx, col, T, scale=scale))
    np.testing.assert_allclose(out.sum(), ref.sum(), rtol=2e-3)
    # ~33 deposits/texel: dither noise sigma = scale*sqrt(n/12) ~ 0.24
    assert np.abs(out - ref).max() < scale * np.sqrt(R / T) * 3
    assert np.abs(out - ref).mean() < scale * 2


def test_fused_splat_i8_deterministic():
    from jax.experimental.pallas import tpu as pltpu

    from flatmatch_tpu.ops.splat_pallas import fused_splat_i8

    idx, col = _case(4096, 512, 9)
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(fused_splat_i8(idx, col, 512, scale=18.0 / 127.0))
        b = np.asarray(fused_splat_i8(idx, col, 512, scale=18.0 / 127.0))
    np.testing.assert_array_equal(a, b)


def test_wide_engine_splat_i8_dispatch():
    """cfg.splat='fused_i8' routes through fused_splat_i8 with the
    emitter-color-derived scale and the static-config depth rule."""
    from unittest import mock

    from flatmatch_tpu.config import PhotonConfig
    from flatmatch_tpu.engines import photon_pallas_wide

    lm = jnp.zeros((256, 3), jnp.float32)
    idx = jnp.zeros((64,), jnp.int32)
    col = jnp.zeros((64, 3), jnp.float32)
    with mock.patch(
        "flatmatch_tpu.ops.splat_pallas.fused_splat_i8",
        side_effect=lambda *a, **k: jnp.zeros((256, 3), jnp.float32),
    ) as fs:
        photon_pallas_wide._splat(
            lm, idx, col,
            PhotonConfig(photons_per_batch=1 << 17, splat="fused_i8"),
        )
        assert fs.call_args.kwargs["depth"] == 512
        assert fs.call_args.kwargs["scale"] == 18.0 / 127.0


def test_wide_engine_picks_depth_from_static_config():
    """_splat derives the fused-splat K from cfg (photons_per_batch x
    max_depth), never from the row count — the bit-identity contract for
    tail-peeled and checkpoint-segment splats."""
    from unittest import mock

    from flatmatch_tpu.config import PhotonConfig
    from flatmatch_tpu.engines import photon_pallas_wide

    lm = jnp.zeros((256, 3), jnp.float32)
    idx = jnp.zeros((64,), jnp.int32)
    col = jnp.zeros((64, 3), jnp.float32)
    with mock.patch(
        "flatmatch_tpu.ops.splat_pallas.fused_splat",
        side_effect=lambda *a, **k: jnp.zeros((256, 3), jnp.float32),
    ) as fs:
        photon_pallas_wide._splat(
            lm, idx, col, PhotonConfig(photons_per_batch=1 << 17)
        )
        assert fs.call_args.kwargs["depth"] == 512
        photon_pallas_wide._splat(
            lm, idx, col, PhotonConfig(photons_per_batch=512)
        )
        assert fs.call_args.kwargs["depth"] == 128
