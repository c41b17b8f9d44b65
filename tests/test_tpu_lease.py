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


def test_second_client_waits_for_first(tmp_path, monkeypatch):
    """Two concurrent clients must serialise, not share the chip.

    Client A parks the holder and measures; client B arriving mid-
    measurement must wait for A's release (a parked holder + live pid
    used to read as an operator hold, letting B 'acquire' instantly
    and overlap A's chip work).
    """
    busy = tmp_path / "busy.json"
    monkeypatch.setattr(tpu_lease, "BUSY_PATH", str(busy))
    wd = str(tmp_path / "wd")
    os.makedirs(wd)
    tpu_lease.advertise(wd)

    def holder():
        for _ in range(4000):
            tpu_lease.pause_point()
            time.sleep(0.005)
            if os.path.exists(os.path.join(wd, "DONE")):
                return

    t = threading.Thread(target=holder)
    t.start()
    b_done = []

    try:
        release_a = tpu_lease.acquire(timeout_s=10.0, poll_s=0.05)
        assert os.path.exists(os.path.join(wd, "PAUSED"))

        def client_b():
            rel = tpu_lease.acquire(timeout_s=10.0, poll_s=0.05)
            b_done.append(time.time())
            rel()

        tb = threading.Thread(target=client_b)
        tb.start()
        time.sleep(0.5)
        # B is waiting on A's pid-owned PAUSE, not running
        assert not b_done
        t_release = time.time()
        release_a()
        tb.join(10.0)
        assert b_done and b_done[0] >= t_release
        # B's release removed its own token; holder resumes
        for _ in range(100):
            if not os.path.exists(os.path.join(wd, "PAUSE")):
                break
            time.sleep(0.05)
        assert not os.path.exists(os.path.join(wd, "PAUSE"))
    finally:
        open(os.path.join(wd, "DONE"), "w").close()
        t.join(5.0)
        tpu_lease.clear()


def test_stale_client_token_is_reclaimed(tmp_path, monkeypatch):
    """A PAUSE left by a kill-9'd client (dead pid content) must not
    block acquisition forever."""
    busy = tmp_path / "busy.json"
    monkeypatch.setattr(tpu_lease, "BUSY_PATH", str(busy))
    wd = str(tmp_path / "wd")
    os.makedirs(wd)
    tpu_lease.advertise(wd)
    with open(os.path.join(wd, "PAUSE"), "w") as f:
        f.write(str(2**22 - 7))  # dead pid

    def holder():
        for _ in range(2000):
            tpu_lease.pause_point()
            time.sleep(0.005)
            if os.path.exists(os.path.join(wd, "DONE")):
                return

    t = threading.Thread(target=holder)
    t.start()
    try:
        t0 = time.time()
        release = tpu_lease.acquire(timeout_s=10.0, poll_s=0.05)
        assert time.time() - t0 < 5.0
        with open(os.path.join(wd, "PAUSE")) as f:
            assert f.read().strip() == str(os.getpid())
        release()
    finally:
        open(os.path.join(wd, "DONE"), "w").close()
        t.join(5.0)
        tpu_lease.clear()


def test_operator_hold_honoured_and_kept(tmp_path, monkeypatch):
    """An empty (operator `touch`ed) PAUSE with a parked holder lets a
    client run, and release leaves the hold in place; a stale PAUSED
    predating the hold does not count as parked."""
    busy = tmp_path / "busy.json"
    monkeypatch.setattr(tpu_lease, "BUSY_PATH", str(busy))
    wd = str(tmp_path / "wd")
    os.makedirs(wd)
    tpu_lease.advertise(wd)
    pause = os.path.join(wd, "PAUSE")
    ack = os.path.join(wd, "PAUSED")

    # stale ack from a kill -9 while parked, then an operator hold
    with open(ack, "w"):
        pass
    past = time.time() - 60.0
    os.utime(ack, (past, past))
    with open(pause, "w"):  # empty = operator
        pass
    t0 = time.time()
    release = tpu_lease.acquire(timeout_s=0.6, poll_s=0.05)
    # ack predates the hold: not accepted, polls to timeout
    assert time.time() - t0 >= 0.6
    release()
    assert os.path.exists(pause)  # operator hold untouched

    # holder parks (fresh ack after the hold): client acquires fast
    os.utime(ack, None)
    t0 = time.time()
    release = tpu_lease.acquire(timeout_s=10.0, poll_s=0.05)
    assert time.time() - t0 < 5.0
    release()
    assert os.path.exists(pause)  # still the operator's to remove
    tpu_lease.clear()


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
