"""Test env: force CPU with 8 virtual devices so sharding/collective code is
exercised without TPU hardware (SURVEY.md §4: multi-host tests on CPU fakes)."""
import os

# Force-override: the ambient environment points JAX_PLATFORMS at the remote
# TPU tunnel ('axon') and a sitecustomize hook imports jax at interpreter
# startup, so the env var is already baked into jax.config — it must be
# overridden through the config API, not os.environ.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"
REFERENCE = pathlib.Path("/root/reference")


def parse_rects_fixture(path):
    """Parse the golden rect dump produced from the reference build
    (tests/fixtures/*_rects.txt): header counts + per-group full-precision
    rows of pos/width/height/n/lightmapSetup."""
    groups = {}
    header = {}
    cur = None
    for line in pathlib.Path(path).read_text().splitlines():
        if line.startswith("# counts"):
            for tok in line.split()[2:]:
                k, v = tok.split("=")
                if k == "size":
                    header["width"], header["height"] = map(int, v.split("x"))
                elif k == "start":
                    header["start"] = tuple(np.float32(t) for t in v.split(","))
                else:
                    header[k] = int(v)
        elif line.startswith("# "):
            name, n = line[2:].split()
            cur = []
            groups[name] = cur
        elif line.strip():
            vals = line.split()
            cur.append(
                dict(
                    pos=np.array(vals[0:3], np.float32),
                    width=np.array(vals[3:6], np.float32),
                    height=np.array(vals[6:9], np.float32),
                    n=np.array(vals[9:12], np.float32),
                    base=int(vals[12]),
                    wtiles=int(vals[13]),
                    htiles=int(vals[14]),
                )
            )
    return header, groups


@pytest.fixture(scope="session")
def fixtures_dir():
    return FIXTURES
