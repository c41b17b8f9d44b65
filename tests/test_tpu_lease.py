"""Cooperative chip-handoff protocol (utils/tpu_lease.py).

No reference counterpart — the reference's GPU services own their
device for life (clip_server.py:91-123); this protects the headline
bench from being measured while a multi-hour scale_bench build holds
the single chip.
"""

import json
import os
import threading
import time

from meme_search_engine_tpu.utils import tpu_lease


def test_acquire_is_noop_without_holder(tmp_path, monkeypatch):
    monkeypatch.setattr(tpu_lease, "BUSY_PATH", str(tmp_path / "busy.json"))
    release = tpu_lease.acquire(timeout_s=1.0)
    release()  # must not raise


def test_acquire_returns_fast_on_dead_holder(tmp_path, monkeypatch):
    busy = tmp_path / "busy.json"
    monkeypatch.setattr(tpu_lease, "BUSY_PATH", str(busy))
    wd = tmp_path / "wd"
    wd.mkdir()
    # pid 2**22-1 range is valid but almost surely dead; use one we
    # know is dead: fork-free approach — max pid + unlikely value
    busy.write_text(json.dumps({"pid": 2**22 - 7, "workdir": str(wd)}))
    t0 = time.time()
    release = tpu_lease.acquire(timeout_s=30.0, poll_s=0.05)
    assert time.time() - t0 < 5.0
    assert (wd / "PAUSE").exists()  # blocks wrapper restarts meanwhile
    release()
    assert not (wd / "PAUSE").exists()


def test_pause_roundtrip_with_live_holder(tmp_path, monkeypatch):
    busy = tmp_path / "busy.json"
    monkeypatch.setattr(tpu_lease, "BUSY_PATH", str(busy))
    wd = str(tmp_path / "wd")
    os.makedirs(wd)
    tpu_lease.advertise(wd)
    assert json.loads(busy.read_text())["pid"] == os.getpid()

    held = []  # safe-point iterations observed while paused

    def holder():
        # simulate the shard loop: hit the safe point repeatedly
        for _ in range(2000):
            tpu_lease.pause_point()
            if os.path.exists(os.path.join(wd, "PAUSE")):
                held.append(1)  # unreachable: pause_point blocks
            time.sleep(0.005)
            if os.path.exists(os.path.join(wd, "DONE")):
                return

    t = threading.Thread(target=holder)
    t.start()
    try:
        release = tpu_lease.acquire(timeout_s=10.0, poll_s=0.05)
        # holder acked and is sitting inside pause_point
        assert os.path.exists(os.path.join(wd, "PAUSED"))
        assert not held
        release()
        # holder resumes: the ack disappears
        for _ in range(100):
            if not os.path.exists(os.path.join(wd, "PAUSED")):
                break
            time.sleep(0.05)
        assert not os.path.exists(os.path.join(wd, "PAUSED"))
    finally:
        open(os.path.join(wd, "DONE"), "w").close()
        t.join(5.0)
        tpu_lease.clear()
    assert not busy.exists()
