"""The r12 optimization-round build-threading machinery:
parallel_branches semantics and slot_memo's concurrency contract.

These pin the properties the threaded slot builds rely on — insertion
order (tagged_union's first-seen column order), error propagation,
the serial fallback knob, and exactly-once memo builds under
concurrent callers."""

from __future__ import annotations

import os
import threading
import time

import pytest

from mongo2mysql_spark.queries import parallel_branches, slot_memo


def test_preserves_insertion_order_and_values():
    out = parallel_branches(
        {
            "c": lambda: 3,
            "a": lambda: 1,
            "b": lambda: 2,
        }
    )
    assert list(out) == ["c", "a", "b"]
    assert out == {"c": 3, "a": 1, "b": 2}


def test_builder_error_propagates():
    def boom():
        raise ValueError("builder failed")

    with pytest.raises(ValueError, match="builder failed"):
        parallel_branches({"ok": lambda: 1, "bad": boom})


def test_env_knob_forces_serial(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BUILD_THREADS", "1")
    seen = []

    def make(tag):
        def build():
            seen.append((tag, threading.current_thread().name))
            return tag

        return build

    out = parallel_branches({t: make(t) for t in ("x", "y", "z")})
    assert list(out) == ["x", "y", "z"]
    # serial fallback runs every builder on the calling thread
    main = threading.current_thread().name
    assert all(thread == main for _tag, thread in seen)


def test_builders_actually_overlap():
    # two 0.15 s sleeps complete in well under 0.3 s when threaded
    t0 = time.time()
    parallel_branches({
        "a": lambda: time.sleep(0.15),
        "b": lambda: time.sleep(0.15),
    })
    assert time.time() - t0 < 0.27


class _FakeCtx:
    applicationId = "app-test"


class _FakeSpark:
    sparkContext = _FakeCtx()


def test_slot_memo_builds_once_under_concurrency(tmp_path):
    memo: dict = {}
    calls = []
    gate = threading.Barrier(4)

    def build():
        calls.append(1)
        time.sleep(0.05)  # widen the race window
        return object()

    results = []

    def worker():
        gate.wait()
        results.append(slot_memo(memo, _FakeSpark(), str(tmp_path), build))

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(calls) == 1
    assert all(r is results[0] for r in results)
