"""Presentation/runtime tests (C16: SDLRenderer)."""

import os

import numpy as np
import pytest

from voxelengine_tpu.runtime.display import Renderer
from voxelengine_tpu.runtime.input import ScriptedInput
from voxelengine_tpu.utils.profiling import FrameTimer, TraceStats


def _read_ppm(path):
    data = open(path, "rb").read()
    parts = data.split(b"\n", 3)
    w, h = map(int, parts[1].split())
    return np.frombuffer(parts[3], np.uint8).reshape(h, w, 3)


@pytest.mark.parametrize("force_python", [True, False])
def test_renderer_callback_loop(tmp_path, force_python):
    r = Renderer("test")
    assert r.init(8, 4, 1.0, outdir=str(tmp_path), mode=3, force_python_sink=force_python)
    frames = []

    def cb(data):
        assert data.width == 8 and data.height == 4
        data.pixels[...] = len(frames) * 10
        data.pixels[..., 3] = 255
        frames.append(1)

    r.add_render_event_callback(cb)
    for _ in range(3):
        r.render()
    r.close()
    assert len(frames) == 3
    assert r.frames_presented >= 1  # async sink may coalesce, >=1 flushed
    img = _read_ppm(os.path.join(str(tmp_path), "latest.ppm"))
    assert img.shape == (4, 8, 3)
    # last flushed frame has constant value from some callback invocation
    assert len(np.unique(img)) == 1


def test_scripted_input_sequence():
    src = ScriptedInput([["w"], ["w", "a"], []])
    assert [e.key for e in src.poll()] == ["w"]
    assert [e.key for e in src.poll()] == ["w", "a"]
    assert [e.key for e in src.poll()] == []
    assert [e.key for e in src.poll()] == ["quit"]


def test_frame_timer_ema():
    t = FrameTimer(alpha=0.5)
    t.tick()
    t.tick()
    assert t.ema_ms >= 0
    assert t.frames == 2


def test_trace_stats():
    s = TraceStats()
    s.record(1_000_000, 10.0, 5_000_000)
    assert np.isclose(s.mrays_per_s, 100.0)
    assert np.isclose(s.avg_steps, 5.0)


@pytest.mark.parametrize("force_python", [True, False])
def test_png_sink_roundtrip(tmp_path, force_python):
    """Both PNG encoders (native stored-deflate writer, Python zlib
    fallback) produce files that decode back to the exact pixels."""
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(3)
    bgra = rng.integers(0, 256, (48, 64, 4), np.uint8)
    r = Renderer("t")
    r.init(64, 48, outdir=str(tmp_path), mode=4 | 8,
           force_python_sink=force_python)
    r._pixels[:] = bgra
    r.render()
    r.close()
    assert r.frames_presented == 1
    img = np.asarray(PIL.open(tmp_path / "latest.png"))
    assert np.array_equal(img, bgra[..., [2, 1, 0]])
    assert (tmp_path / "frame_000000.png").exists()


def test_tty_input_escape_sequences(monkeypatch):
    """TtyInput over a real pty: ordinary keys, arrows, ignored CSI
    sequences (PgUp must not quit), and ESC-with-buffered-key (the quit
    must fire AND the buffered key must not be swallowed)."""
    import os as _os
    import pty
    import sys as _sys
    import time

    master, slave = pty.openpty()

    class _Stdin:
        def fileno(self):
            return slave

        def isatty(self):
            return True

    monkeypatch.setattr(_sys, "stdin", _Stdin())
    from voxelengine_tpu.runtime.input import TtyInput

    t = TtyInput()
    try:
        _os.write(master, b"w")        # ordinary key
        _os.write(master, b"\x1b[A")   # arrow up
        _os.write(master, b"\x1b[5~")  # PgUp: CSI with params -> ignored
        _os.write(master, b"\x1bf")    # ESC with a buffered key behind it
        time.sleep(0.05)
        evs = [e.key for e in t.poll()]
    finally:
        t.close()
        _os.close(master)
    assert evs == ["w", "up", "quit", "f"], evs


def test_tty_input_split_escape_sequence(monkeypatch):
    """An arrow whose "[A" tail arrives a beat after the ESC byte (laggy
    ssh/pty packetization) must parse as the arrow, not as a spurious
    quit: the ESC path waits _ESC_GRACE_S for the tail."""
    import os as _os
    import pty
    import sys as _sys
    import threading
    import time

    master, slave = pty.openpty()

    class _Stdin:
        def fileno(self):
            return slave

        def isatty(self):
            return True

    monkeypatch.setattr(_sys, "stdin", _Stdin())
    from voxelengine_tpu.runtime.input import TtyInput

    t = TtyInput()
    try:
        _os.write(master, b"\x1b")
        lag = threading.Timer(0.01, _os.write, (master, b"[A"))
        lag.start()
        evs = [e.key for e in t.poll()]
        lag.join()
    finally:
        t.close()
        _os.close(master)
    assert evs == ["up"], evs
