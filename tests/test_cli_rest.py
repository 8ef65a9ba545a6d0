"""CLI wiring + REST packager end-to-end."""
import base64
import dataclasses
import json
import pathlib

import numpy as np
import pytest
from PIL import Image as PILImage

from flatmatch_tpu import cli
from flatmatch_tpu.config import DEFAULT_CONFIG, Engine
from flatmatch_tpu.io.rest import package_offer
from tests.conftest import FIXTURES


def test_cli_render_smoke(tmp_path):
    rc = cli.main(
        [
            "render",
            str(FIXTURES / "tiny.png"),
            "30",
            "--engine",
            "photon_xla",
            "--samples-per-area",
            "2000",
            "--photons-per-batch",
            "512",
            "--out",
            str(tmp_path),
        ]
    )
    assert rc == 0
    assert (tmp_path / "geometry.json").exists()
    assert (tmp_path / "collisionMap.json").exists()
    tiles = list((tmp_path / "tiles").glob("tile_*.png"))
    assert len(tiles) > 0


def test_cli_flag_plumbing():
    args = cli.main.__globals__["_build_cfg"]  # direct unit check

    class A:
        engine = "radiosity"
        samples_per_area = 123.0
        seed = 7
        photons_per_batch = 256
        splat = "bucket_exact"
        radiosity_rays = 55
        radiosity_iterations = 3
        ao_chunk = 64

    cfg = args(A)
    assert cfg.engine is Engine.RADIOSITY
    assert cfg.photon.samples_per_area == 123.0
    assert cfg.photon.splat == "bucket_exact"
    assert cfg.radiosity.rays_per_texel == 55
    assert cfg.radiosity.iterations == 3
    assert cfg.radiosity.seed == 7
    assert cfg.ao.texels_per_chunk == 64


def test_package_offer(tmp_path):
    cfg = DEFAULT_CONFIG.replace(
        photon=dataclasses.replace(
            DEFAULT_CONFIG.photon,
            samples_per_area=2000.0,
            photons_per_batch=512,
        )
    )
    rest = package_offer(
        str(FIXTURES / "tiny.png"),
        offer_id=42,
        scale=30.0,
        latitude=52.13,
        longitude=11.62,
        yaw=0.5,
        level=2,
        out_dir=str(tmp_path),
        cfg=cfg,
    )
    offer = json.loads((rest / "get" / "offer" / "42").read_text())
    assert offer["rowid"] == 42
    assert offer["lat"] == 52.13
    assert offer["scale"] == 30.0
    assert offer["level"] == 2
    # collision map spliced verbatim
    gold_cm = json.loads((FIXTURES / "tiny_collisionMap.json").read_text())
    assert offer["collisionMap"] == gold_cm
    # layout copied byte-for-byte
    assert (rest / "get" / "layout" / "42").read_bytes() == (
        FIXTURES / "tiny.png"
    ).read_bytes()
    # textures decode to valid PNGs sized like the walls
    textures = json.loads((rest / "get" / "textures" / "42").read_text())
    assert len(textures) > 0
    import io

    img = PILImage.open(io.BytesIO(base64.b64decode(textures["0"])))
    assert img.size[0] >= 1 and img.size[1] >= 1
