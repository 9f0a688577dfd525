"""SessionDirCache (llm/session_layout.py): per-key in-flight guard —
concurrent first callers run ONE build (r12 advice: the old
build-then-setdefault race duplicated minutes-scale index builds and
orphaned the losers' directories), failed builds clean up and let the
next caller retry, and distinct keys never serialize each other."""

from __future__ import annotations

import os
import threading
import time

from cdc_cascade_spark.llm.session_layout import SessionDirCache


def test_concurrent_first_callers_build_once(spark):
    cache = SessionDirCache("cdc_test_layout_")
    builds: list[str] = []
    barrier = threading.Barrier(4)

    def build(out: str) -> None:
        builds.append(out)
        time.sleep(0.05)  # hold the in-flight window open
        (os.path.exists(out)) and open(f"{out}/marker", "w").close()

    results: list[str] = []

    def caller() -> None:
        barrier.wait()
        results.append(cache.get_or_build(spark, "sfX", build))

    threads = [threading.Thread(target=caller) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(builds) == 1, "duplicate concurrent builds"
    assert len(set(results)) == 1 and results[0] == builds[0]
    assert os.path.exists(f"{results[0]}/marker")
    # and the steady-state hit path returns the same dir
    assert cache.get_or_build(spark, "sfX", build) == results[0]
    assert len(builds) == 1


def test_failed_build_cleans_up_and_next_caller_retries(spark):
    import pytest

    cache = SessionDirCache("cdc_test_layout_")
    attempts: list[str] = []

    def failing(out: str) -> None:
        attempts.append(out)
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        cache.get_or_build(spark, "sfY", failing)
    assert not os.path.exists(attempts[0]), "failed build dir not removed"

    def ok(out: str) -> None:
        attempts.append(out)

    got = cache.get_or_build(spark, "sfY", ok)
    assert len(attempts) == 2 and got == attempts[1]
    assert os.path.exists(got)


def test_waiter_retries_when_builder_fails(spark):
    """A waiter parked on a failing builder's event must retry the
    build itself rather than return a missing directory."""
    cache = SessionDirCache("cdc_test_layout_")
    started = threading.Event()
    calls: list[str] = []

    def first_fails(out: str) -> None:
        calls.append("fail")
        started.set()
        time.sleep(0.05)
        raise RuntimeError("boom")

    def second_ok(out: str) -> None:
        calls.append("ok")

    errors: list[BaseException] = []
    results: list[str] = []

    def loser() -> None:
        started.wait()
        try:
            results.append(cache.get_or_build(spark, "sfZ", second_ok))
        except BaseException as e:  # pragma: no cover - failure detail
            errors.append(e)

    t = threading.Thread(target=loser)
    t.start()
    try:
        cache.get_or_build(spark, "sfZ", first_fails)
    except RuntimeError:
        pass
    t.join()
    assert not errors and results and os.path.exists(results[0])
    assert calls == ["fail", "ok"]


def test_distinct_keys_do_not_serialize(spark):
    cache = SessionDirCache("cdc_test_layout_")
    order: list[str] = []
    a_started = threading.Event()
    b_done = threading.Event()

    def slow_a(out: str) -> None:
        a_started.set()
        assert b_done.wait(timeout=10), "key B serialized behind key A"
        order.append("a")

    def fast_b(out: str) -> None:
        order.append("b")
        b_done.set()

    ta = threading.Thread(
        target=lambda: cache.get_or_build(spark, "sfA", slow_a)
    )
    ta.start()
    a_started.wait()
    cache.get_or_build(spark, "sfB", fast_b)
    ta.join()
    assert order == ["b", "a"]
