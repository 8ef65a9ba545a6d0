"""Cost split of the radiosity engine on the real chip (example.png):
form-factor trace vs gather iterations vs mipmap rebuild, plus aa_nearest
sublane scaling. One batched run (remote compiles are minutes each).

Usage: python tools/bench_radiosity_split.py [rays_per_texel]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from flatmatch_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from flatmatch_tpu.config import RadiosityConfig
from flatmatch_tpu.engines import radiosity as rad
from flatmatch_tpu.ops.aa_scene import pack_aa
from flatmatch_tpu.ops.aa_query import aa_nearest
from flatmatch_tpu.scene import geometry, image as im, layout

f32 = np.float32
RAYS = int(sys.argv[1]) if len(sys.argv) > 1 else 1000


def readback(x):
    return float(np.asarray(x).sum())


def timeit(fn, *a, **k):
    out = fn(*a, **k)
    readback(out if not isinstance(out, tuple) else out[0])
    t0 = time.perf_counter()
    out = fn(*a, **k)
    s = readback(out if not isinstance(out, tuple) else out[0])
    return time.perf_counter() - t0, s


img = im.load_layout("/root/reference/example.png")
lay = layout.parse_layout(img, f32(1.0) / f32(30.0), 200.0)
scene = geometry.Scene(lay)
aa = pack_aa(scene.walls)
cfg = RadiosityConfig(rays_per_texel=RAYS, seed=0)
chunk = int(cfg.texels_per_chunk)

print(f"num_texels={scene.num_texels} rays={RAYS}")

# --- form-factor pass alone -------------------------------------------
centers_all, normals, starts, wis, cis = rad._ff_schedule(scene, chunk)
rows_pad = scene.num_texels + chunk


def ff():
    ids0 = jnp.full((rows_pad, RAYS), -1, jnp.int32)
    return rad._form_factors_aa_all(
        ids0, aa.fields, centers_all, normals, starts, wis, cis,
        jax.random.PRNGKey(0), RAYS, tuple(aa.group_counts),
    )


ids = ff()
readback(jnp.sum(ids >= 0))
t0 = time.perf_counter()
ids = ff()
n_hit = readback(jnp.sum(ids >= 0))
ff_dt = time.perf_counter() - t0
total_rays = scene.num_texels * RAYS
print(f"form-factor pass: {ff_dt:.3f}s  {total_rays / ff_dt / 1e6:.1f}M rays/s (hits {n_hit:.0f})")

# --- one gather iteration alone ---------------------------------------
src = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (rows_pad, 3), jnp.float32))
n_chunks = (scene.num_texels + chunk - 1) // chunk


@jax.jit
def gather_all(src, ids):
    def body(i, dest):
        sl = jax.lax.dynamic_slice(ids, (i * chunk, 0), (chunk, RAYS))
        d = rad._gather_chunk(src, sl)
        return jax.lax.dynamic_update_slice(dest, d, (i * chunk, 0))

    return jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((rows_pad, 3), jnp.float32)
    )


g_dt, _ = timeit(gather_all, src, ids)
print(f"one gather iteration: {g_dt:.3f}s  {total_rays / g_dt / 1e6:.1f}M gathers/s  (x{cfg.iterations} = {g_dt * cfg.iterations:.2f}s)")

# --- mipmap rebuild (apply_plan) --------------------------------------
from flatmatch_tpu.ops.mipmap import apply_plan, build_plan

rects_ext, total_ext, _, _ = rad.extended_rects(scene)
plan = build_plan(rects_ext)
src_ext = jnp.abs(
    jax.random.normal(jax.random.PRNGKey(3), (total_ext, 3), jnp.float32)
)
p_fn = jax.jit(lambda x: apply_plan(x, plan))
p_dt, _ = timeit(p_fn, src_ext)
print(f"apply_plan (mipmap rebuild): {p_dt:.4f}s (x{cfg.iterations})")

# --- aa_nearest sublane scaling ---------------------------------------
R = 1 << 22  # 4.2M rays
key = jax.random.PRNGKey(2)
src_r = jnp.tile(jnp.asarray([[3.0, 3.0, 1.0]], jnp.float32), (R, 1))
d = jax.random.normal(key, (R, 3), jnp.float32)
d = d / jnp.linalg.norm(d, axis=1, keepdims=True)

for S in (8, 32, 64):
    f = jax.jit(
        lambda s_, d_, S=S: aa_nearest(
            aa.fields, s_, d_, tuple(aa.group_counts), sublanes=S
        )
    )
    dt, _ = timeit(f, src_r, d)
    print(f"aa_nearest sublanes={S}: {dt:.3f}s  {R / dt / 1e6:.1f}M rays/s")
