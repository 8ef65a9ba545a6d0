"""End-to-end pipeline test: layout PNG in -> JSONs + lightmap tiles out
(the minimum end-to-end slice of SURVEY.md §7 step 3)."""
import dataclasses

import numpy as np
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
