"""Entry-level compile-cache integrity (VERDICT r4 weak #1/#2).

The old guard rm-rf'd the whole persistent cache after any unclean exit;
these tests pin the replacement: atomic entry writes (a killed writer can
never publish a partial entry), stale temp sweep, and — the property the
old guard violated — existing complete entries SURVIVE enabling the cache
with no clean-exit sentinel present (a SIGKILL'd run is followed by a
warm, not cold, lane).
"""

import os

import pytest

from ltx2_tpu.utils import compile_cache


def _make_cache(tmp_path):
    lru = pytest.importorskip("jax._src.lru_cache")
    assert compile_cache._patch_atomic_writes() == "ok"
    return lru.LRUCache(str(tmp_path), max_size=-1), lru


def test_put_get_roundtrip_via_atomic_path(tmp_path):
    cache, lru = _make_cache(tmp_path)
    assert getattr(lru.LRUCache, "_ltx2_atomic_put", False)
    cache.put("key1", b"serialized-executable")
    assert cache.get("key1") == b"serialized-executable"
    # no temp litter after a successful put
    assert not [p for p in os.listdir(tmp_path) if compile_cache._TMP_MARKER in p]


def test_killed_writer_publishes_nothing(tmp_path, monkeypatch):
    """Simulate a kill between temp-write and rename: the real key must not
    exist, and the orphaned temp file is swept at next enable."""
    cache, lru = _make_cache(tmp_path)

    def boom(src, dst):
        raise OSError("killed mid-rename")

    monkeypatch.setattr(compile_cache.os, "replace", boom)
    cache.put("keyX", b"half-written")
    monkeypatch.undo()
    assert cache.get("keyX") is None  # nothing published under the real key
    # leave an orphan temp behind (as a SIGKILL before rename would) and
    # verify the sweep removes it without touching complete entries
    orphan = tmp_path / f"keyY{compile_cache._TMP_MARKER}99999"
    orphan.write_bytes(b"partial")
    cache.put("keyZ", b"complete-entry")
    removed = compile_cache.sweep_stale_tmp(str(tmp_path))
    assert removed >= 1
    assert not orphan.exists()
    assert cache.get("keyZ") == b"complete-entry"


def test_enable_preserves_existing_entries_after_unclean_exit(tmp_path):
    """The round-4 failure mode: a killed run left no clean-exit sentinel
    and the next run rm-rf'd the whole cache. enable_persistent_cache must
    keep every complete entry (there is no sentinel concept anymore)."""
    cache, lru = _make_cache(tmp_path)
    cache.put("warm-entry", b"x" * 128)
    # no sentinel file exists, simulating a SIGKILL'd previous run
    info = compile_cache.enable_persistent_cache(str(tmp_path))
    assert info["atomic_writes"] == "ok"
    assert cache.get("warm-entry") == b"x" * 128

    import jax

    assert jax.config.jax_compilation_cache_dir == str(tmp_path)
    # restore the suite-wide cache dir for tests that run after this one
    compile_cache.enable_persistent_cache("/tmp/jax_cache")


def test_conftest_has_no_rmtree_guard():
    """Regression pin: the blunt whole-directory guard must not come back."""
    conftest = os.path.join(os.path.dirname(__file__), "conftest.py")
    with open(conftest) as fh:
        text = fh.read()
    assert "rmtree" not in text
    assert "enable_persistent_cache" in text
