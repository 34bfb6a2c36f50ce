"""Shipped AOT artifacts must match the current kernel sources.

Round 2 regression (VERDICT.md Weak #3): kernels were edited after the
last `scripts/prewarm.py` run, so every shipped cache/aot_*.jaxexp keyed
on a dead digest — a fresh process silently missed them all and cold
start regressed from ~3.5 s to the ~170 s tier. ops/aot.py now records
an artifact index (cache/aot_index.json) with the platform-independent
source digest; this test turns staleness into a loud failure:

    FAILED ... stale AOT artifacts -> re-run scripts/prewarm.py
"""

import json
import os

import pytest

from lambdaworks_kzg_tpu.models.srs import _CACHE_DIR
from lambdaworks_kzg_tpu.ops import aot


def test_shipped_aot_artifacts_are_fresh():
    path = aot._index_path()
    if not os.path.exists(path):
        pytest.skip("no AOT artifact index (nothing prewarmed here)")
    with open(path) as f:
        idx = json.load(f)
    current = aot._src_digest()
    stale = {
        key: rec
        for key, rec in idx.items()
        if rec.get("src_digest") != current
        and os.path.exists(os.path.join(_CACHE_DIR, f"aot_{key}.jaxexp"))
    }
    assert not stale, (
        f"stale AOT artifacts (kernel sources changed since prewarm): "
        f"{sorted((r['name'], k) for k, r in stale.items())} -> "
        f"re-run scripts/prewarm.py on the TPU and re-ship cache/"
    )


def test_seed_bundled_cache_copies_new_entries(tmp_path):
    """The import-time cache seeder (lambdaworks_kzg_tpu._seed_bundled_cache)
    copies site-bundle entries into the per-user cache without clobbering
    existing ones, and is a silent no-op when no bundle exists (the repo
    commits none — entries are ~100-280 MB; scripts/prewarm.py --bundle
    builds one for machine images)."""
    import lambdaworks_kzg_tpu as pkg

    bundle = tmp_path / "bundle"
    cache = tmp_path / "cache"

    # no bundle dir: silent no-op, cache dir not created
    pkg._seed_bundled_cache(str(cache), bundle=str(bundle))
    assert not cache.exists()

    bundle.mkdir()
    (bundle / "entry-a").write_bytes(b"AAA")
    (bundle / "entry-b").write_bytes(b"BBB")
    cache.mkdir()
    (cache / "entry-a").write_bytes(b"user-version")  # must NOT clobber
    pkg._seed_bundled_cache(str(cache), bundle=str(bundle))
    assert (cache / "entry-a").read_bytes() == b"user-version"
    assert (cache / "entry-b").read_bytes() == b"BBB"


def test_index_records_written_on_export(tmp_path, monkeypatch):
    """_index_record round-trips and keeps prior entries."""
    monkeypatch.setattr(
        "lambdaworks_kzg_tpu.models.srs._CACHE_DIR", str(tmp_path)
    )
    aot._index_record("k1", "msm_device", "sig1", (("c", 8),))
    aot._index_record("k2", "msm_fixedbase_device", "sig2", ())
    with open(os.path.join(str(tmp_path), "aot_index.json")) as f:
        idx = json.load(f)
    assert set(idx) == {"k1", "k2"}
    assert idx["k1"]["src_digest"] == aot._src_digest()
