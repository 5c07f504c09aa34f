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


def test_serial_by_default():
    # r13: the driver bench refuted the r12 threaded default on cold
    # idle local[32] (anti-scaling); building is serial unless
    # SPARK_GRAFT_BUILD_THREADS>1 explicitly opts in.
    os.environ.pop("SPARK_GRAFT_BUILD_THREADS", None)
    seen = []

    def make(tag):
        def build():
            seen.append(threading.current_thread().name)
            return tag

        return build

    parallel_branches({t: make(t) for t in ("x", "y")})
    main = threading.current_thread().name
    assert all(t == main for t in seen)


def test_builders_overlap_when_opted_in(monkeypatch):
    # two 0.15 s sleeps complete in well under 0.3 s when threaded
    monkeypatch.setenv("SPARK_GRAFT_BUILD_THREADS", "4")
    t0 = time.time()
    parallel_branches({
        "a": lambda: time.sleep(0.15),
        "b": lambda: time.sleep(0.15),
    })
    assert time.time() - t0 < 0.27


def test_threaded_failure_raises_first_error(monkeypatch):
    # as_completed semantics: the raised error is a real builder
    # failure even when an earlier-submitted builder is still running
    monkeypatch.setenv("SPARK_GRAFT_BUILD_THREADS", "4")

    def slow_ok():
        time.sleep(0.2)
        return 1

    def fast_boom():
        time.sleep(0.01)
        raise RuntimeError("fast failure")

    t0 = time.time()
    with pytest.raises(RuntimeError, match="fast failure"):
        parallel_branches({"slow": slow_ok, "boom": fast_boom})
    # the failure surfaced promptly, not after every future resolved
    # in insertion order (pool shutdown still waits for slow_ok)
    assert time.time() - t0 < 2.0


def test_concurrent_run_to_memory_restores_conf(spark, tmp_path):
    """Two overlapping run_to_memory calls with different
    shuffle-partition overrides must leave the session conf exactly as
    it was and produce identical results (VERDICT r12 #5: the
    save/restore race could permanently freeze the override).  The
    module conf-lock serializes the whole mutate/run/restore window."""
    from concurrent.futures import ThreadPoolExecutor

    from mongo2mysql_spark.streaming.pipeline import run_to_memory

    df = spark.range(20).selectExpr("id", "cast(id % 3 as long) as k")
    src = str(tmp_path / "in")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    agg = stream.groupBy("k").count()
    before = spark.conf.get("spark.sql.shuffle.partitions")
    with ThreadPoolExecutor(max_workers=2) as pool:
        f1 = pool.submit(run_to_memory, agg, "complete", 3)
        f2 = pool.submit(run_to_memory, agg, "complete", 5)
        r1, r2 = f1.result(), f2.result()
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    rows1 = sorted((r["k"], r["count"]) for r in r1.collect())
    rows2 = sorted((r["k"], r["count"]) for r in r2.collect())
    assert rows1 == rows2 == [(0, 7), (1, 7), (2, 6)]


def test_slot_persist_same_key_concurrent_rebuild(spark):
    """Concurrent slot_persist on the SAME key must never leave more
    than one registered generation, and the registered frame must be
    persisted (ADVICE r12: the unlocked pop/unpersist/persist sequence
    could unpersist a frame another thread was computing over)."""
    from concurrent.futures import ThreadPoolExecutor

    from mongo2mysql_spark import cachereg
    from mongo2mysql_spark.cachereg import slot_persist

    key = ("test.same_key_concurrent",)
    frames = [spark.range(10 + i) for i in range(4)]
    with ThreadPoolExecutor(max_workers=4) as pool:
        outs = list(pool.map(lambda d: slot_persist(key, d), frames))
    live = cachereg._REGISTRY[key]
    assert live in outs
    assert live.storageLevel.useMemory  # the winner is still persisted
    live.unpersist()
    cachereg._REGISTRY.pop(key, None)


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
