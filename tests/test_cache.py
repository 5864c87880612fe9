"""Machine-tag cache dir + startup canary (ADVICE r4: a cached CPU AOT
program from a feature-incompatible host must re-key the directory
instead of loading with 'machine type doesn't match' warnings)."""

import os

from cybervision_tpu.utils import cache


def test_machine_cache_dir_tagged(tmp_path):
    base = str(tmp_path / "jc")
    path = cache.machine_cache_dir(base, canary=False)
    assert path.startswith(base + "-")
    assert os.path.isdir(path)
    # Deterministic per machine.
    assert cache.machine_cache_dir(base, canary=False) == path


def test_canary_passes_and_memoizes_on_fresh_dir(tmp_path, monkeypatch):
    base = str(tmp_path / "jc")
    calls = []
    real = cache._canary_mismatch

    def counting(path):
        calls.append(path)
        return real(path)

    monkeypatch.setattr(cache, "_canary_mismatch", counting)
    monkeypatch.setattr(cache, "_CANARY_VALIDATED", {})
    p1 = cache.machine_cache_dir(base, canary=True)
    assert "-s" not in os.path.basename(p1)
    # Fresh (empty) dir: safe without compiling anything.
    assert calls == []
    # Second call in the same process must not re-run the canary.
    p2 = cache.machine_cache_dir(base, canary=True)
    assert p2 == p1 and calls == []


def test_canary_rekeys_on_mismatch(tmp_path, monkeypatch):
    base = str(tmp_path / "jc")
    tagged = cache.machine_cache_dir(base, canary=False)
    # Simulate a foreign host's cache entry.
    with open(os.path.join(tagged, "stale_aot"), "w") as fh:
        fh.write("x")
    seen = []

    def fake_mismatch(path):
        seen.append(path)
        return len(seen) == 1  # first candidate fails, salted one passes

    monkeypatch.setattr(cache, "_canary_mismatch", fake_mismatch)
    monkeypatch.setattr(cache, "_CANARY_VALIDATED", {})
    path = cache.machine_cache_dir(base, canary=True)
    assert path == tagged + "-s1"
    assert os.path.isdir(path)
    # Memoized redirect: stale dir maps straight to the salted dir.
    assert cache.machine_cache_dir(base, canary=True) == path


def test_canary_compile_detects_no_mismatch_locally(tmp_path):
    """The real canary compile on THIS host: stores the program on the
    first pass, loads it cleanly on the second (no mismatch either way)."""
    d = str(tmp_path / "real")
    os.makedirs(d)
    assert cache._canary_mismatch(d) is False
    assert cache._canary_mismatch(d) is False
