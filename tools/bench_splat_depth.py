#!/usr/bin/env python
"""Sweep the fused splat's MXU contraction depth (K) on hardware.

Motivation (round-2 device profile, see README cost decomposition): the
fused one-hot splat is ~70% of photon-loop device time; at K=128 roughly
2016 of its ~3900 VPU ops per deposit are the per-pass [H,384] f32
accumulator adds, which deeper passes amortize. Measured on v5e
(2M rows, H=672): 65.7 ms at K=128 vs 63.0 ms at K=512 (both include
~50 ms tunnel dispatch latency — compare differences, not totals).

Run on the TPU env: python tools/bench_splat_depth.py [depths...]
"""
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from flatmatch_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from flatmatch_tpu.ops.splat_pallas import fused_splat  # noqa: E402

R, T = 1 << 21, 85120  # production shape: 2M deposit rows, compact arena


def main():
    depths = [int(a) for a in sys.argv[1:]] or [128, 512, 1024]
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    idx = jax.random.randint(k1, (R,), 0, T, dtype=jnp.int32)
    col = jax.random.uniform(k2, (R, 3), dtype=jnp.float32) * 18.0
    ref = None
    for depth in depths:
        try:
            e = float(np.asarray(fused_splat(idx, col, T, depth=depth)).sum())
            dt = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                e = float(
                    np.asarray(fused_splat(idx, col, T, depth=depth)).sum()
                )
                dt = min(dt, time.perf_counter() - t0)
            if ref is None:
                ref = e
            print(f"depth={depth}: {dt * 1e3:.2f} ms  "
                  f"energy_rel_err={abs(e - ref) / abs(ref):.2e}")
        except Exception as ex:  # compile/VMEM failures are data too
            print(f"depth={depth}: FAILED {repr(ex)[:200]}")


if __name__ == "__main__":
    main()
