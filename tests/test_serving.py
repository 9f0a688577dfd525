"""Serving-layer tests: the automated version of the reference's four
sequence-flow scenarios (sequence-flows.mmd:16-53) and its manual
verification script (README.md:119-154).
"""

from __future__ import annotations

import pytest

from cdc_cascade_spark.serving import CdcTableService, NotFound
from cdc_cascade_spark.streaming.sinks import InMemoryKVStore


@pytest.fixture()
def svc(spark):
    s = CdcTableService(spark, InMemoryKVStore())
    # seed rows (init.sql:26-29)
    s.create({"code": 14, "name": "Deren", "class": "S",
              "libram": "Fraud", "tendency": "Fury"})
    s.create({"code": 17, "name": "Shalom", "class": "S",
              "libram": "Sloth", "tendency": "Reticle"})
    return s


def test_scenario_1_2_cache_miss_then_hit(svc):
    # Scenario 1: miss → DB → write-back
    assert svc.cache.get("14") is None
    row = svc.read_one(14)
    assert row["name"] == "Deren"
    assert svc.cache.get("14") is not None
    # Scenario 2: hit served from cache (mutate cache to prove it)
    svc.cache.set("14", '{"name": "FROM-CACHE"}')
    assert svc.read_one(14)["name"] == "FROM-CACHE"


def test_scenario_3_cdc_invalidation(svc):
    svc.read_one(14)
    assert svc.cache.get("14") is not None
    svc.update(14, {"name": "Updated"})
    # write path never touches the cache (controllers.go:75-98)
    assert svc.cache.get("14") is not None
    # ...until the CDC consumer runs (queue/cdc.go:188-191)
    svc.run_invalidation_cycle()
    assert svc.cache.get("14") is None


def test_scenario_4_rebuild_after_invalidation(svc):
    svc.read_one(14)
    svc.update(14, {"name": "Aurelius"})
    svc.run_invalidation_cycle()
    # next read repopulates from the compacted state
    assert svc.read_one(14)["name"] == "Aurelius"
    assert svc.cache.get("14") is not None


def test_create_read_update_delete_roundtrip(svc):
    svc.create({"code": 5, "name": "Augustus", "class": "S",
                "libram": "War", "tendency": "Reticle"})
    assert svc.read_one(5)["name"] == "Augustus"
    svc.update(5, {"tendency": "Calm"})
    svc.run_invalidation_cycle()
    assert svc.read_one(5)["tendency"] == "Calm"
    deleted = svc.delete(5)
    assert deleted["name"] == "Augustus"
    svc.run_invalidation_cycle()
    with pytest.raises(NotFound):
        svc.read_one(5)
    # full scan reflects the delete
    assert {r.code for r in svc.read_all().collect()} == {14, 17}


def test_validation_errors(svc):
    with pytest.raises(ValueError):
        svc.read_one("not-an-int")  # B6 → 400 analog
    with pytest.raises(NotFound):
        svc.read_one(999)  # 404 analog
    with pytest.raises(ValueError):
        svc.create({"code": 14, "name": "Dup", "class": "S"})


def test_updated_at_bumped_on_update(svc):
    before = svc.read_one(14)
    svc.update(14, {"name": "X"})
    svc.run_invalidation_cycle()
    after = svc.read_one(14)
    assert after["updated_at"] >= before["updated_at"]
    assert after["created_at"] == before["created_at"]


def test_point_reads_do_not_recompact_changelog(svc, monkeypatch):
    """VERDICT r1 #4: read_one/_current_row hit the maintained view —
    poisoning the compaction path must not break point reads."""
    svc.create({"code": 99, "name": "Vi", "class": "A"})

    def boom():
        raise AssertionError("point read recompacted the changelog")

    monkeypatch.setattr(svc, "read_all", boom)
    assert svc.read_one(99)["name"] == "Vi"          # cache miss -> view
    svc.update(99, {"name": "Vi2"})                  # RMW -> view
    svc.delete(99)                                   # delete RMW -> view
    with pytest.raises(NotFound):
        svc.read_one(98)


def test_view_matches_compacted_changelog(svc):
    """The per-append view must equal batch latest-wins compaction of
    the full changelog (the view's consistency oracle)."""
    svc.create({"code": 1, "name": "a", "class": "A"})
    svc.create({"code": 2, "name": "b", "class": "B"})
    svc.update(1, {"name": "a2"})
    svc.delete(2)
    svc.create({"code": 3, "name": "c", "class": "C"})

    compacted = {r["code"]: r["name"] for r in svc.read_all().collect()}
    view = {k: v["name"] for k, v in svc._view.items()}
    assert view == compacted == {
        1: "a2", 3: "c", 14: "Deren", 17: "Shalom",  # 14/17 = fixture seeds
    }
