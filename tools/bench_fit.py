"""Fit-loop wall clock on the flagship scene (round-4 VERDICT #1's last
done-criterion: "a fit-loop wall-clock number in README").

Runs the end-to-end inverse-rendering loop — render a target at the true
parameters, then fit per-wall albedo + per-emitter power from a perturbed
init with diff.fit.fit_materials — at the production diff configuration
(device RNG + in-kernel i8 forward splat on the dynamic quantization grid
+ in-kernel MXU cotangent fold backward) and reports steady-state
steps/s, photons/s through the fit loop, and the loss trajectory.

Budget: FLATMATCH_FIT_PHOTONS per step (default 2^23 ~ 8.4M — the same
per-step budget test_diff.py's example-scale fit gate uses; the rates are
budget-independent past a few batches). Steps: FLATMATCH_FIT_STEPS
(default 30).

Usage (on the TPU chip):  python tools/bench_fit.py
"""
from __future__ import annotations

import json
import os
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from flatmatch_tpu.config import PhotonConfig  # noqa: E402
from flatmatch_tpu.diff.fit import make_renderer  # noqa: E402
from flatmatch_tpu.ops.aa_scene import pack_aa  # noqa: E402
from flatmatch_tpu.ops.device_scene import pack_emitters, pack_rects  # noqa: E402
from flatmatch_tpu.scene import geometry, image as im, layout  # noqa: E402

SCENE_PNG = pathlib.Path("/root/reference/example.png")
if not SCENE_PNG.exists():
    SCENE_PNG = REPO / "tests" / "fixtures" / "mini.png"

PHOTONS = int(os.environ.get("FLATMATCH_FIT_PHOTONS", 1 << 23))
STEPS = int(os.environ.get("FLATMATCH_FIT_STEPS", 30))
SUBLANES = int(os.environ.get("FLATMATCH_FIT_SUBLANES", 64))


def main():
    img = im.load_layout(str(SCENE_PNG))
    lay = layout.parse_layout(img, np.float32(1.0) / np.float32(30.0), 200.0)
    scene = geometry.Scene(lay)

    probe = pack_emitters(scene, 1.0, (18, 18, 18), (16, 16, 18))
    total_area = float(np.asarray(probe.area).sum())
    spa = PHOTONS / total_area
    cfg = PhotonConfig(
        samples_per_area=spa, photons_per_batch=1 << 17, seed=0,
        device_rng=True, splat="inkernel_i8",
    )
    rects = pack_rects(scene.walls)
    emitters = pack_emitters(scene, spa, cfg.window_color, cfg.light_color)
    n_photons = int(np.asarray(emitters.counts).sum())
    aa = pack_aa(scene.walls) if jax.default_backend() == "tpu" else None

    # target at the TRUE parameters (same seed => exact global optimum)
    render = make_renderer(rects, emitters, scene.num_texels, cfg,
                           aa=aa, sublanes=SUBLANES)
    n_rects = len(scene.walls)
    true_albedo = jnp.full((n_rects,), cfg.albedo, jnp.float32)
    true_power = jnp.ones((len(np.asarray(emitters.counts)),), jnp.float32)
    target = render(true_albedo, true_power)
    float(np.asarray(target).sum())

    # the steady-state fit loop, inlined (same structure as
    # diff/fit.fit_materials — renderer + sigmoid/exp parameterization +
    # optax.adam + jitted value_and_grad step) so the compile is warmed
    # with the SAME jitted step that gets timed; fit_materials itself
    # builds a fresh jit closure per call, so timing two calls would
    # charge the second one a compile-cache round trip
    import optax
    from flatmatch_tpu.diff.fit import _logit

    n_pad = int(rects.pos.shape[0])
    n_em = len(np.asarray(emitters.counts))
    norm = jnp.maximum(jnp.mean(target * target), 1e-20)
    params = {
        "a_logit": jnp.full((n_pad,), _logit(jnp.float32(0.5)), jnp.float32),
        "p_log": jnp.full((n_em,), jnp.log(jnp.float32(1.4)), jnp.float32),
    }

    def loss_fn(params):
        albedo = jax.nn.sigmoid(params["a_logit"])
        power = jnp.exp(params["p_log"])
        lm = render(albedo, power)
        return jnp.mean((lm - target) ** 2) / norm

    opt = optax.adam(0.05)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.perf_counter()
    params, opt_state, loss = step(params, opt_state)
    losses = [float(loss)]  # readback forces the compile + first dispatch
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(STEPS):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))  # per-step host sync, like the CLI fit
    dt = time.perf_counter() - t0

    fit_albedo = np.asarray(jax.nn.sigmoid(params["a_logit"]))[:n_rects]
    fit_power = np.asarray(jnp.exp(params["p_log"]))
    err_a = float(np.max(np.abs(fit_albedo - np.asarray(true_albedo))))
    err_p = float(np.max(np.abs(fit_power - np.asarray(true_power))))
    out = {
        "scene": SCENE_PNG.name,
        "platform": jax.default_backend(),
        "photons_per_step": n_photons,
        "steps": STEPS,
        "wall_s": round(dt, 3),
        "steps_per_s": round(STEPS / dt, 3),
        "fit_photons_per_s": round(STEPS * n_photons / dt, 1),
        "compile_s": round(compile_s, 2),
        "loss_first": losses[0],
        "loss_last": losses[-1],
        "max_abs_err_albedo_after": round(err_a, 4),
        "max_abs_err_power_after": round(err_p, 4),
        "n_params": n_rects + len(np.asarray(emitters.counts)),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
