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


# ---------------------------------------------------------------------------
# xdist wall-clock packing: dispatch the known-heavy files FIRST. Workers
# pull tests in collection order, so a 5-10 minute test collected near the
# end strands one worker past everyone else's finish line (measured round
# 5: the flagship radiosity parity test, 536 s, dominated the 22:35 wall).
# A stable sort by file weight keeps intra-file order (fixtures, tie-break
# semantics) while letting the long poles start at t=0.
# ---------------------------------------------------------------------------
_HEAVY_FILES = (
    "test_radiosity_vs_reference.py",   # 536 s flagship parity case
    "test_render_e2e.py",               # 294 s interpret-mode preview
    "test_parallel.py",                 # 284 s sharded inkernel parity
    "test_radiosity.py",                # 238 s form-factor batches
    "test_multiprocess.py",             # ~6 min serialized group
    "test_diff.py",
    "test_ao_parity.py",
    "test_pallas_wide.py",
    "test_physics_vs_reference.py",
)


def pytest_collection_modifyitems(config, items):
    def weight(item):
        path = str(item.fspath)
        for i, name in enumerate(_HEAVY_FILES):
            if path.endswith(name):
                return i
        return len(_HEAVY_FILES)

    items.sort(key=weight)
