"""Property-based fuzzing of the scene compiler.

Random (seeded, deterministic) multi-room layouts in the reference's color
vocabulary (/root/reference/parseLayout.c:15-24) must always compile into a
structurally sound scene: axis-aligned rects the wide engine accepts,
a non-overlapping texel arena that exactly accounts for every mipmap
chain, a collision map whose RLE covers the raster with a passable
starting position, and a renderable emitter set. The generator varies room
count/sizes, window classes (plain/balcony), inter-room doors, and
windowless rooms (forcing the synthetic ceiling-light path,
parseLayout.c:168-341).
"""
import json

import numpy as np
import pytest
from PIL import Image

from flatmatch_tpu.scene import geometry, image as im, layout
from flatmatch_tpu.scene.collision import build_collision_map
from flatmatch_tpu.scene.rectangle import num_mipmap_texels

f32 = np.float32

WALL = (0, 0, 0)
EMPTY = (255, 255, 255)
OUTSIDE = (127, 127, 127)
DOOR = (223, 223, 223)
WINDOW = (0, 255, 0)
BALCONY_WINDOW = (0, 127, 255)


def _random_layout(seed: int, path):
    """A 1- or 2-row grid of rooms behind a 2px wall shell; seeded and
    deterministic.

    Room (0,0) always gets an outer-wall window (daylight); other rooms
    get a window, a balcony window, or nothing (windowless rooms must
    receive a synthetic ceiling light). Horizontally adjacent rooms
    connect through doors; in 2-row layouts (seeds >= 6) some vertical
    neighbors connect too — the second row exercises the greedy area
    decomposition and light placement on taller interiors."""
    rng = np.random.RandomState(seed)
    n_rooms = int(rng.randint(1, 5))
    n_rows = 2 if seed >= 6 else 1
    widths = rng.randint(10, 26, size=n_rooms)
    height = int(rng.randint(14, 38))
    total_w = 6 + 2 + int(widths.sum()) + 2 * n_rooms + 6
    total_h = 6 + 2 + (height + 2) * n_rows + 6
    img = np.zeros((total_h, total_w, 3), np.uint8)
    img[:, :] = OUTSIDE
    img[6:total_h - 6, 6:total_w - 6] = WALL

    win_kinds = []
    for row in range(n_rows):
        y0 = 8 + row * (height + 2)
        y1 = y0 + height
        x = 8
        for r in range(n_rooms):
            x1 = x + int(widths[r])
            img[y0:y1, x:x1] = EMPTY
            if row == 0 and r == 0:
                kind = WINDOW
            elif row == 0:
                kind = [WINDOW, BALCONY_WINDOW, None][int(rng.randint(3))]
            else:
                kind = None  # second row has no outer top wall: windowless
            win_kinds.append(kind)
            if kind is not None:
                # window in the top outer wall band (rows 6..8 border
                # OUTSIDE)
                wx0 = x + 2 + int(rng.randint(max(1, widths[r] - 8)))
                wx1 = min(x1 - 2, wx0 + int(rng.randint(3, 8)))
                if wx1 > wx0:
                    img[6:8, wx0:wx1] = kind
            if r > 0:
                # door through the 2px wall to the left neighbor
                dy0 = y0 + 2 + int(rng.randint(max(1, height - 10)))
                dy1 = min(y1 - 2, dy0 + int(rng.randint(4, 9)))
                if dy1 > dy0:
                    img[dy0:dy1, x - 2:x] = DOOR
            if row == 1 and rng.randint(2):
                # door through the 2px wall to the upstairs-row neighbor
                dx0 = x + 2 + int(rng.randint(max(1, widths[r] - 8)))
                dx1 = min(x1 - 2, dx0 + int(rng.randint(4, 9)))
                if dx1 > dx0:
                    img[y0 - 2:y0, dx0:dx1] = DOOR
            x = x1 + 2
    Image.fromarray(img, "RGB").save(path)
    return win_kinds


@pytest.mark.parametrize("seed", range(10))
def test_fuzzed_layout_compiles_sound(seed, tmp_path):
    png = tmp_path / f"fuzz_{seed}.png"
    win_kinds = _random_layout(seed, png)
    img = im.load_layout(str(png))
    lay = layout.parse_layout(img, f32(1.0) / f32(30.0), 200.0)
    scene = geometry.Scene(lay)

    # every rect is axis-aligned and the wide engine accepts the scene
    from flatmatch_tpu.ops.aa_scene import pack_aa

    aa = pack_aa(scene.walls)
    assert aa is not None
    assert sum(aa.group_counts) == len(scene.walls)
    assert len(scene.walls) >= 6  # 4 shell walls + floor + ceiling

    # texel arena: mipmap chains tile it exactly, no overlap, no holes
    chains = sorted(
        # num_mipmap_texels includes level 0 (the full pyramid)
        (r.base, num_mipmap_texels(r)) for r in scene.walls
    )
    at = 0
    for base, count in chains:
        assert base == at, (base, at)
        at += count
    assert at == scene.num_texels

    # emitters: room 0 always has a window; windowless rooms got lights
    assert len(scene.windows) >= 1
    n_windowless = sum(1 for k in win_kinds if k is None)
    if n_windowless:
        assert len(scene.lights) >= 1

    # geometry JSON parses and covers every wall
    geo = json.loads(geometry.geometry_json(scene))
    assert len(geo["geometry"]) == len(scene.walls)
    assert geo["layoutImageSize"] == [img.shape[1], img.shape[0]]

    # collision map: RLE covers the raster; start position is passable
    rle = json.loads(build_collision_map(img))
    assert sum(rle) == img.shape[0] * img.shape[1]
    flat = np.zeros(img.shape[0] * img.shape[1], bool)
    at, passable = 0, False  # first run impassable (parseLayout.c:543)
    for run in rle:
        flat[at:at + run] = passable
        at += run
        passable = not passable
    grid = flat.reshape(img.shape[0], img.shape[1])
    sx, sy = lay.starting_position
    assert grid[int(sy * 30.0), int(sx * 30.0)]

    # the scene renders: one small XLA photon pass with finite energy
    from flatmatch_tpu.config import PhotonConfig
    from flatmatch_tpu.engines import photon
    from flatmatch_tpu.ops.device_scene import pack_emitters, pack_rects

    cfg = PhotonConfig(samples_per_area=300.0, photons_per_batch=256, seed=1)
    emitters = pack_emitters(
        scene, cfg.samples_per_area, cfg.window_color, cfg.light_color
    )
    lm = np.asarray(
        photon.render_photons(
            pack_rects(scene.walls), emitters, scene.num_texels, cfg
        )
    )
    assert np.isfinite(lm).all() and (lm >= 0).all() and lm.sum() > 0
