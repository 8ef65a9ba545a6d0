"""End-to-end pipeline test: layout PNG in -> JSONs + lightmap tiles out
(the minimum end-to-end slice of SURVEY.md §7 step 3)."""
import dataclasses

import numpy as np
import pytest
from PIL import Image as PILImage

from flatmatch_tpu.config import DEFAULT_CONFIG, Engine
from flatmatch_tpu.io import tiles as tiles_io
from flatmatch_tpu.render import render
from flatmatch_tpu.scene.rectangle import num_tiles
from tests.conftest import FIXTURES


def _cfg(engine):
    cfg = DEFAULT_CONFIG.replace(engine=engine)
    return cfg.replace(
        photon=dataclasses.replace(
            cfg.photon, samples_per_area=5000.0, photons_per_batch=1024
        )
    )


def test_photon_end_to_end(tmp_path):
    res = render(
        str(FIXTURES / "tiny.png"), str(tmp_path), 30.0, _cfg(Engine.PHOTON_XLA)
    )
    # artifacts exist and match the scene-compiler goldens byte-for-byte
    assert (tmp_path / "collisionMap.json").read_text() == (
        FIXTURES / "tiny_collisionMap.json"
    ).read_text()
    assert (tmp_path / "geometry.json").read_text() == (
        FIXTURES / "tiny_geometry.json"
    ).read_text()
    assert len(res.tile_paths) == len(res.scene.walls)
    for p, rect in zip(res.tile_paths, res.scene.walls):
        img = PILImage.open(p)
        assert img.size == (rect.wtiles, rect.htiles)
    assert np.isfinite(res.texels).all()
    assert res.texels.sum() > 0  # some light arrived somewhere


def test_raw_tile_roundtrip(tmp_path):
    res = render(
        str(FIXTURES / "tiny.png"), str(tmp_path), 30.0, _cfg(Engine.PHOTON_XLA)
    )
    rect = res.scene.walls[0]
    path = tmp_path / "tile_0.raw"
    tiles_io.save_tile_raw(rect, res.texels, str(path))
    meta, data = tiles_io.load_tile_raw(str(path))
    assert (meta["wtiles"], meta["htiles"]) == (rect.wtiles, rect.htiles)
    np.testing.assert_array_equal(meta["pos"], rect.pos)
    np.testing.assert_array_equal(
        data.reshape(-1, 3), res.texels[rect.base : rect.base + num_tiles(rect)]
    )


def test_oracle_engine_end_to_end(tmp_path):
    res = render(
        str(FIXTURES / "tiny.png"),
        str(tmp_path),
        30.0,
        _cfg(Engine.PHOTON_ORACLE),
    )
    assert np.isfinite(res.texels).all()
    assert res.texels.sum() > 0


def test_preview_progressive_tiles(tmp_path, monkeypatch):
    """`preview=True` re-writes the tiles after every dispatch segment with
    done-fraction exposure scaling, and the final result is bit-identical
    to a plain run (segmentation never changes a photon)."""
    import sys

    import flatmatch_tpu.render  # noqa: F401  (package attr shadows module)

    render_mod = sys.modules["flatmatch_tpu.render"]

    cfg = _cfg(Engine.PHOTON_XLA)
    # several segments: 1024-photon batches, 1 batch per segment
    cfg = cfg.replace(
        photon=dataclasses.replace(cfg.photon, samples_per_area=20000.0)
    )
    plain = render(str(FIXTURES / "tiny.png"), str(tmp_path / "a"), 30.0, cfg)

    calls = []
    real_save = tiles_io.save_tiles

    def spy(walls, texels, out_dir, tint_extra, dilate_seams=False):
        calls.append(np.asarray(texels).sum())
        return real_save(walls, texels, out_dir, tint_extra, dilate_seams)

    monkeypatch.setattr(render_mod.tiles_io, "save_tiles", spy)
    prev = render(
        str(FIXTURES / "tiny.png"), str(tmp_path / "b"), 30.0, cfg,
        preview=True,
    )
    # preview segments fired (one per emitter segment; tiny has a single
    # window emitter) plus the final write; energies finite and positive
    assert len(calls) >= 2
    assert all(np.isfinite(c) and c > 0 for c in calls)
    np.testing.assert_array_equal(prev.texels, plain.texels)
    # the last preview covers the full budget (done == total), so its
    # scaled energy equals the final write's exactly
    np.testing.assert_allclose(calls[-2], calls[-1], rtol=1e-6)


def test_preview_wide_engine_interpret(tmp_path):
    """preview=True forces the wide engine onto the segmented schedule
    path (engines/photon_pallas_wide.render_photons on_segment); result is
    bit-identical to the single-dispatch fast path."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    from flatmatch_tpu.engines import photon_pallas_wide
    from flatmatch_tpu.ops.aa_scene import pack_aa
    from flatmatch_tpu.ops.device_scene import pack_emitters, pack_rects
    from flatmatch_tpu.scene import geometry, image as im, layout

    img = im.load_layout(str(FIXTURES / "tiny.png"))
    lay = layout.parse_layout(
        img, np.float32(1.0) / np.float32(30.0), 200.0
    )
    scene = geometry.Scene(lay)
    rects = pack_rects(scene.walls)
    cfg = dataclasses.replace(
        _cfg(Engine.PHOTON_PALLAS).photon,
        samples_per_area=20000.0, photons_per_batch=1024, splat="scatter",
    )
    emitters = pack_emitters(
        scene, cfg.samples_per_area, cfg.window_color, cfg.light_color
    )
    aa = pack_aa(scene.walls)
    seen = []
    with pltpu.force_tpu_interpret_mode():
        fast = np.asarray(
            photon_pallas_wide.render_photons(
                rects, emitters, scene.num_texels, cfg, aa, sublanes=1
            )
        )
        seg = np.asarray(
            photon_pallas_wide.render_photons(
                rects, emitters, scene.num_texels, cfg, aa, sublanes=1,
                on_segment=lambda lm, d, t: seen.append((d, t)),
            )
        )
    np.testing.assert_array_equal(fast, seg)
    assert len(seen) >= 1
    assert seen[-1][0] == seen[-1][1]  # last segment completes the budget


def test_seam_dilate_semantics():
    """Boundary pixels (black+lit 8-neighborhood) take the brightest 3x3
    neighbor; interior lit and interior black regions are untouched."""
    import numpy as np

    from flatmatch_tpu.io.tiles import seam_dilate

    img = np.zeros((5, 8, 3), np.uint8)
    img[:, 4:] = (10, 20, 30)     # lit half
    img[2, 6] = (200, 10, 0)      # a bright pixel inside the lit half
    out = seam_dilate(img)
    # interior black stays black
    assert (out[:, :3] == 0).all()
    # boundary columns (3: black side, 4: lit side) are filled/brightened
    assert (out[:, 3].sum(-1) > 0).all()
    assert (out[:, 4].sum(-1) >= img[:, 4].sum(-1)).all()
    # the brightest-neighbor rule: pixels adjacent to the bright spot in
    # boundary-free interior keep their value (no black neighbors there)
    assert tuple(out[2, 6]) == (200, 10, 0)
    # idempotent on a fully lit image
    lit = np.full((4, 4, 3), 7, np.uint8)
    assert (seam_dilate(lit) == lit).all()


def test_cli_dilate_seams_smoke(tmp_path):
    from flatmatch_tpu import cli
    from tests.conftest import FIXTURES

    rc = cli.main([
        "render", str(FIXTURES / "tiny.png"), "30",
        "--engine", "photon_xla",
        "--samples-per-area", "2000", "--photons-per-batch", "512",
        "--out", str(tmp_path), "--dilate-seams",
    ])
    assert rc == 0
    assert list((tmp_path / "tiles").glob("tile_*.png"))


def test_downsample_supersampled_semantics():
    """The supersampled downsample (imageProcessing.c:145-184 hint):
    each output texel averages its ss*ss sub-texel block EXCLUDING
    sub-texels with any zero channel; an all-zero block stays zero."""
    from flatmatch_tpu.render import downsample_supersampled
    from flatmatch_tpu.scene.rectangle import Rect

    class _S:  # minimal scene stand-ins
        def __init__(self, walls, num_texels):
            self.walls = walls
            self.num_texels = num_texels

    r = Rect(pos=np.zeros(3, np.float32), width=np.zeros(3, np.float32),
             height=np.zeros(3, np.float32), n=np.zeros(3, np.float32),
             base=0, wtiles=2, htiles=1)
    r2 = Rect(pos=r.pos, width=r.width, height=r.height, n=r.n,
              base=0, wtiles=4, htiles=2)
    tex = np.zeros((8, 3), np.float32)
    # texel 0's block = cols 0-1 of both rows: one lit, one half-lit
    # (zero g channel -> excluded), two zero
    tex[0] = (4.0, 8.0, 12.0)
    tex[4] = (99.0, 0.0, 99.0)    # any-zero channel: excluded
    # texel 1's block (cols 2-3) stays all-zero
    out = downsample_supersampled(_S([r], 2), _S([r2], 8), tex, 2)
    np.testing.assert_allclose(out[0], (4.0, 8.0, 12.0))
    np.testing.assert_allclose(out[1], (0.0, 0.0, 0.0))


def test_render_composition_supersample_dilate_preview(tmp_path):
    """Composition e2e (round-4 VERDICT #8): --supersample + --dilate-seams
    + --preview together. preview is incompatible with supersample and must
    WARN + disable itself (render.py), the supersampled render must still
    complete, and the dilated export must differ from a plain export only
    where unlit seam texels were filled."""
    import io
    from contextlib import redirect_stderr, redirect_stdout

    buf, err = io.StringIO(), io.StringIO()
    with redirect_stdout(buf), redirect_stderr(err):
        res = render(
            str(FIXTURES / "tiny.png"), str(tmp_path), 30.0,
            _cfg(Engine.PHOTON_XLA), supersample=2, dilate_seams=True,
            preview=True,
        )
    assert "--preview is unsupported with --supersample" in err.getvalue()
    assert "preview tiles at" not in buf.getvalue()  # really disabled
    assert len(res.tile_paths) == len(res.scene.walls)
    for p, rect in zip(res.tile_paths, res.scene.walls):
        img = PILImage.open(p)
        assert img.size == (rect.wtiles, rect.htiles)
    assert np.isfinite(res.texels).all() and res.texels.sum() > 0


def test_supersampled_scene_flagship_grids():
    """Regression (round-4 ADVICE): the supersampled twin must scale EVERY
    wall's tile grid by exactly ss per dimension. Re-running the
    power-of-two sizing loop (rectangle.c:15-57) at ss^2 x density does
    NOT guarantee that for elongated walls (it can spend both doublings
    on one axis: 1x32 -> 1x128 instead of 2x64); the twin is built by
    direct grid scaling instead. Asserted on the flagship scene, where
    the density-loop approach demonstrably fails for several walls."""
    import pathlib

    from flatmatch_tpu.config import DEFAULT_CONFIG
    from flatmatch_tpu.render import supersampled_scene
    from flatmatch_tpu.scene import geometry, image as im, layout
    from flatmatch_tpu.scene.rectangle import create_rect, num_mipmap_texels

    png = pathlib.Path("/root/reference/example.png")
    if not png.exists():
        png = FIXTURES / "mini.png"
    img = im.load_layout(str(png))
    lay = layout.parse_layout(img, np.float32(1.0) / np.float32(30.0), 200.0)
    scene = geometry.Scene(lay)
    ss = 2
    twin = supersampled_scene(scene, ss, DEFAULT_CONFIG)
    total = 0
    for r, r2 in zip(scene.walls, twin.walls):
        assert (r2.wtiles, r2.htiles) == (r.wtiles * ss, r.htiles * ss)
        assert r2.base == total
        total += num_mipmap_texels(r2)
    assert twin.num_texels == total

    # document why: the old density-loop construction mismatches on at
    # least one flagship wall (ADVICE r4 measured 5/172)
    if png.name == "example.png":
        mismatched = 0
        for r in scene.walls:
            rd = create_rect(r.pos, r.width, r.height, 200.0 * ss * ss)
            if (rd.wtiles, rd.htiles) != (r.wtiles * ss, r.htiles * ss):
                mismatched += 1
        assert mismatched > 0

    # non-power-of-two ss is rejected up front
    with pytest.raises(ValueError, match="power of two"):
        supersampled_scene(scene, 3, DEFAULT_CONFIG)


def test_render_supersample_end_to_end(tmp_path):
    """supersample=2: tiles export at the BASE grid, the supersampled twin
    scene really had 2x tiles per dimension, and the lightmap is finite
    and lit."""
    res = render(
        str(FIXTURES / "tiny.png"), str(tmp_path), 30.0,
        _cfg(Engine.PHOTON_XLA), supersample=2,
    )
    assert len(res.tile_paths) == len(res.scene.walls)
    for p, rect in zip(res.tile_paths, res.scene.walls):
        img = PILImage.open(p)
        assert img.size == (rect.wtiles, rect.htiles)
    assert np.isfinite(res.texels).all()
    assert res.texels.sum() > 0
    # same scene artifacts as the base render (ss touches only texels)
    assert (tmp_path / "geometry.json").read_text() == (
        FIXTURES / "tiny_geometry.json"
    ).read_text()


def test_texel_cap_refusal_flagship_density():
    """The 1 GB texel-arena cap (parseLayout.c:520-524, ported at
    layout.py) actually fires at flagship density (round-4 VERDICT #2):
    both user paths that can blow the arena — a high --supersample factor
    and a raised texel density — refuse BEFORE any allocation or render,
    with the projected size in the message."""
    import pathlib

    from flatmatch_tpu.render import supersampled_scene
    from flatmatch_tpu.scene import geometry, image as im, layout

    png = pathlib.Path("/root/reference/example.png")
    if not png.exists():
        pytest.skip("reference fixture unavailable")
    img = im.load_layout(str(png))
    lay = layout.parse_layout(img, np.float32(1.0) / np.float32(30.0), 200.0)
    scene = geometry.Scene(lay)

    # flagship at ss=32: 1024 x 114k texels x 16 B = 1.86 GB > 1 GB
    with pytest.raises(MemoryError, match="1.86 GB"):
        supersampled_scene(scene, 32, DEFAULT_CONFIG)

    # raised density through the scene compiler itself
    with pytest.raises(MemoryError, match="cap 1.00 GB"):
        layout.parse_layout(
            img, np.float32(1.0) / np.float32(30.0), 200.0 * 1024
        )


def test_wide_engine_texel_id_guard(monkeypatch):
    """scene.num_texels >= 2^24 must force the photon_pallas dispatch onto
    the XLA engine with a warning (render.py: Pallas texel ids are
    f32-exact only below 2^24) instead of producing corrupted splats. The
    backend is faked to 'tpu' so the guard (which sits behind the
    off-TPU fallback) is actually reached; the XLA engine then runs on
    the CPU."""
    import dataclasses as dc
    import io
    import sys
    from contextlib import redirect_stderr

    import jax

    from flatmatch_tpu.render import run_engine
    from flatmatch_tpu.scene import geometry, image as im, layout

    img = im.load_layout(str(FIXTURES / "tiny.png"))
    lay = layout.parse_layout(img, np.float32(1.0) / np.float32(30.0), 200.0)
    big = dc.replace(lay, num_texels=1 << 24)
    scene = geometry.Scene(big)

    cfg = _cfg(Engine.PHOTON_PALLAS)
    cfg = cfg.replace(photon=dataclasses.replace(
        cfg.photon, samples_per_area=500.0, photons_per_batch=256
    ))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    err = io.StringIO()
    with redirect_stderr(err):
        texels = run_engine(scene, cfg, mesh=None)
    assert "2^24" in err.getvalue()
    assert texels.shape == (1 << 24, 3)
    # the real walls' span still received light
    assert np.isfinite(texels).all()
    assert texels[: lay.num_texels].sum() > 0
