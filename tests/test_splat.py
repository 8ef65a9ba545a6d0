"""MXU bucket splat vs scatter-add ground truth."""
import jax
import jax.numpy as jnp
import numpy as np

from flatmatch_tpu.ops.splat import bucket_splat, scatter_splat


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
