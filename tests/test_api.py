"""Top-level API: auto-routing, file helpers, inspection."""

import numpy as np
import pytest

import entreepy_tpu as et
from entreepy_tpu.format import DegenerateInputError


def test_roundtrip_auto(midsummer):
    assert et.decompress(et.compress(midsummer)) == midsummer


def test_backends_byte_identical(macbeth):
    host = et.compress(macbeth, backend="host")
    assert et.compress(macbeth, backend="device") == host
    assert et.decompress(host, backend="device") == macbeth
    assert et.compress(macbeth, backend="sharded") == host
    assert et.decompress(host, backend="sharded") == macbeth


def test_auto_routes_sharded_on_multidevice(monkeypatch, midsummer):
    # Auto must reach the multi-chip path when >1 device is visible (the
    # conftest mesh has 8) and the size threshold is crossed.
    monkeypatch.setenv("ENTREEPY_DEVICE_MIN", "1024")
    from entreepy_tpu.api import _pick_backend

    assert _pick_backend(None, 1 << 20) == "sharded"
    assert _pick_backend(None, 10) == "host"
    assert et.decompress(et.compress(midsummer)) == midsummer


def test_unknown_backend_raises(macbeth):
    with pytest.raises(ValueError, match="unknown backend"):
        et.compress(macbeth, backend="gpu")


def test_strict_degenerate(macbeth):
    with pytest.raises(DegenerateInputError):
        et.compress(b"aaaa")
    packed = et.compress(b"aaaa", strict=False)
    assert et.decompress(packed) == b"aaaa"


def test_device_min_env(monkeypatch, macbeth):
    monkeypatch.setenv("ENTREEPY_DEVICE_MIN", "not-a-number")
    with pytest.warns(UserWarning, match="ENTREEPY_DEVICE_MIN"):
        assert et.decompress(et.compress(macbeth)) == macbeth


def test_file_helpers(tmp_path, macbeth):
    src = tmp_path / "m.txt"
    src.write_bytes(macbeth)
    out = et.compress_file(src)
    assert out == str(tmp_path / "m.txt.et")
    dec = et.decompress_file(out)
    assert dec == str(tmp_path / "decoded_m.txt")
    assert (tmp_path / "decoded_m.txt").read_bytes() == macbeth


def test_inspect(macbeth):
    packed = et.compress(macbeth)
    info = et.inspect(packed)
    assert info["original_bytes"] == len(macbeth)
    assert info["compressed_bytes"] == len(packed) == 374
    assert info["num_symbols"] == len(info["dictionary"])
    # every dictionary entry is (length, bit-string of that length)
    for sym, (length, bits) in info["dictionary"].items():
        assert 0 <= sym < 256 and len(bits) == length
    # prefix-free check over the reported dictionary
    codes = sorted(bits for _, bits in info["dictionary"].values())
    for a, b in zip(codes, codes[1:]):
        assert not b.startswith(a)


def test_version_consistent():
    """__version__ must track pyproject (it had drifted to 0.1.0 once)."""
    import re
    from pathlib import Path

    import entreepy_tpu

    text = (Path(__file__).parent.parent / "pyproject.toml").read_text()
    v = re.search(r'^version = "(.*)"$', text, re.M).group(1)
    assert entreepy_tpu.__version__ == v
