"""Measured progress (VERDICT r1 item 8): the bar must reflect actual phase
completion, not a staged animation around one opaque call."""

import io

import entreepy_tpu as et
from entreepy_tpu.cli import main
from entreepy_tpu.utils.progress import ProgressBar


def test_compress_ticks_are_measured(midsummer):
    ticks = []
    et.compress(midsummer, backend="host", progress=lambda p, m: ticks.append((p, m)))
    ps = [p for p, _ in ticks]
    assert ps == sorted(ps), "progress must be monotone"
    # 10 measured histogram sections (the reference's 10 encode sections,
    # encode.zig:303-315) + tree + pack
    assert len(ps) >= 12
    msgs = [m for _, m in ticks]
    assert msgs.count("Counting characters...") >= 10
    assert "Building tree..." in msgs
    assert "Writing compressed text..." in msgs


def test_decompress_ticks_are_measured(midsummer):
    data = midsummer * 4  # large enough for the byte-FSM host path
    packed = et.compress(data, backend="host")
    ticks = []
    et.decompress(packed, backend="host", progress=lambda p, m: ticks.append((p, m)))
    ps = [p for p, _ in ticks]
    assert ps == sorted(ps) and len(ps) >= 3
    assert any(m == "Decoding text..." for _, m in ticks)
    assert ticks[-1][1] == "Writing decoded text..."


class _FakeTty(io.StringIO):
    def isatty(self):
        return True


def test_cli_renders_bar_on_tty(tmp_path, midsummer, monkeypatch):
    import sys

    src = tmp_path / "m.txt"
    src.write_bytes(midsummer * 4)
    out = tmp_path / "m.et"
    fake = _FakeTty()
    monkeypatch.setattr(sys, "stderr", fake)
    assert main(["c", str(src), "-o", str(out), "--backend", "host"]) == 0
    rendered = fake.getvalue()
    assert "╔" in rendered and "║" in rendered  # box-drawn bar frames
    assert "Done compressing!" in rendered
    # at least one mid-flight measured message made it to a frame
    assert ("Counting characters..." in rendered or "Building tree..." in rendered
            or "Writing compressed text..." in rendered)


def test_progress_bar_renders_updates():
    fake = _FakeTty()
    bar = ProgressBar(theme=1, stream=fake, enabled=True)
    bar.start()
    bar.update(40, "Decoding text...")
    bar.finish("Done decompressing!")
    s = fake.getvalue()
    assert "Decoding text..." in s or "Done decompressing!" in s
    assert "█" in s
