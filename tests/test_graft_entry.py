"""Driver-entry hygiene: the compile-cache seeding that keeps the multichip
dryrun alive across VM restores (tools/dryrun_cache_seed/).

The full dryrun itself is exercised by the driver (MULTICHIP artifact) and by
`python __graft_entry__.py`; these tests cover only the host-side seeding
logic, which must be fail-soft and idempotent.
"""
import importlib.util
import os

import pytest


@pytest.fixture(scope="module")
def graft_entry():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), os.pardir,
                                    "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_seed_populates_missing_entries(graft_entry, tmp_path):
    cache = tmp_path / "cc"
    graft_entry._seed_compile_cache(str(cache))
    seeded = [f for f in os.listdir(cache) if f.endswith("-cache")]
    assert seeded, "seed dir exists in-repo but nothing was copied"
    for name in seeded:
        src = os.path.join(os.path.dirname(graft_entry.__file__) or ".",
                           "tools", "dryrun_cache_seed", name)
        assert os.path.getsize(cache / name) == os.path.getsize(src)


def test_seed_never_overwrites(graft_entry, tmp_path):
    cache = tmp_path / "cc"
    cache.mkdir()
    graft_entry._seed_compile_cache(str(cache))
    names = [f for f in os.listdir(cache) if f.endswith("-cache")]
    marker = cache / names[0]
    marker.write_bytes(b"existing")  # a live cache entry must win
    graft_entry._seed_compile_cache(str(cache))
    assert marker.read_bytes() == b"existing"


def test_seed_missing_dir_is_noop(graft_entry, tmp_path):
    # a repo without the seed dir must be a silent no-op, not an error
    cache = tmp_path / "cc"
    graft_entry._seed_compile_cache(str(cache), seed_dir=str(tmp_path / "no"))
    assert not os.path.exists(cache)
