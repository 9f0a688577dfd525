"""HTTP facade tests: the reference's manual curl script (README.md:
119-154) as automated checks, plus the signal-shutdown choreography."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from cdc_cascade_spark.api import CdcApiServer, graceful_shutdown, install_signal_handlers
from cdc_cascade_spark.serving import CdcTableService
from cdc_cascade_spark.streaming.sinks import InMemoryKVStore


@pytest.fixture()
def server(spark):
    svc = CdcTableService(spark, InMemoryKVStore())
    svc.create({"code": 14, "name": "Deren", "class": "S"})
    srv = CdcApiServer(svc, port=0).start()
    yield srv
    srv.shutdown_with_timeout()


def _req(srv, method, path, body=None):
    url = f"http://127.0.0.1:{srv.port}{path}"
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read() or b"null")
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def test_crud_roundtrip_over_http(server):
    st, row = _req(server, "POST", "/api/v1/sinners/create",
                   {"code": 5, "name": "Augustus", "class": "A"})
    assert st == 201 and row["name"] == "Augustus"

    st, row = _req(server, "GET", "/api/v1/sinners/read/5")
    assert st == 200 and row["name"] == "Augustus"

    st, row = _req(server, "PUT", "/api/v1/sinners/update/5", {"name": "Aurelius"})
    assert st == 200 and row["name"] == "Aurelius"

    st, rows = _req(server, "GET", "/api/v1/sinners/read")
    assert st == 200 and [r["code"] for r in rows] == [5, 14]

    st, row = _req(server, "DELETE", "/api/v1/sinners/delete/5")
    assert st == 200
    # writes never touch the cache: until the CDC consumer runs, the
    # cached row from the earlier GET is (correctly) still served
    st, stale = _req(server, "GET", "/api/v1/sinners/read/5")
    assert st == 200 and stale["name"] == "Augustus"
    # the consumer's invalidation cycle restores coherence (scenario 3)
    server.service.run_invalidation_cycle()
    st, _ = _req(server, "GET", "/api/v1/sinners/read/5")
    assert st == 404


def test_http_error_codes_match_reference(server):
    st, _ = _req(server, "GET", "/api/v1/sinners/read/notanint")
    assert st == 400  # strconv.Atoi analog (controllers.go:53)
    st, _ = _req(server, "GET", "/api/v1/sinners/read/999")
    assert st == 404  # controllers.go:64
    st, _ = _req(server, "POST", "/api/v1/sinners/create",
                 {"code": 14, "name": "dup", "class": "S"})
    assert st == 400  # duplicate key (controllers.go:32)
    st, _ = _req(server, "GET", "/api/v1/nope")
    assert st == 404


def test_signal_handler_runs_bounded_shutdown(spark, monkeypatch):
    import os as _os
    import signal as _signal

    import cdc_cascade_spark.api as api_mod

    svc = CdcTableService(spark, InMemoryKVStore())
    srv = CdcApiServer(svc, port=0).start()
    saved = {s: _signal.getsignal(s) for s in (_signal.SIGINT, _signal.SIGTERM)}
    try:
        _signal.signal(_signal.SIGTERM, _signal.SIG_DFL)  # the normal case
        handler = install_signal_handlers(srv, queries=())
        handler(15, None)  # SIGTERM path, invoked directly (main.go:48)
        # server no longer accepts connections
        with pytest.raises(Exception):
            _req(srv, "GET", "/api/v1/sinners/read")
        # repeated signals chain to the previous disposition. SIGTERM's
        # previous is SIG_DFL: the handler must RESTORE the default and
        # re-deliver — a hung process stays killable after graceful
        # shutdown (ADVICE r3) — rather than silently swallowing it.
        delivered = []
        monkeypatch.setattr(api_mod.os, "kill", lambda pid, s: delivered.append((pid, s)))
        handler(15, None)
        assert delivered == [(_os.getpid(), 15)]
        assert _signal.getsignal(_signal.SIGTERM) == _signal.SIG_DFL
        # ... while SIGINT's previous is Python's default → a second
        # Ctrl-C still raises KeyboardInterrupt instead of vanishing
        with pytest.raises(KeyboardInterrupt):
            handler(2, None)
    finally:
        for s, h in saved.items():
            _signal.signal(s, h)


def test_graceful_shutdown_reports_query_drain(spark, tmp_path):
    """Streaming consumers drain within the bounded wait (main.go:57-68)."""
    import json as _json

    from cdc_cascade_spark.streaming.pipeline import (
        read_cdc_files,
        start_invalidation_pipeline,
    )

    src = tmp_path / "src"
    src.mkdir()
    env = {"payload": {"before": None,
                       "after": {"code": 1, "name": "x", "class": "S",
                                 "created_at": None, "updated_at": None},
                       "source": {"db": "d", "schema": "public",
                                  "table": "sinners", "lsn": 1, "txId": 1},
                       "op": "c", "ts_ms": 1}}
    (src / "b.txt").write_text(_json.dumps(env) + "\n")
    q = start_invalidation_pipeline(
        read_cdc_files(spark, str(src)), InMemoryKVStore(), str(tmp_path / "ck")
    )
    q.processAllAvailable()
    report = graceful_shutdown(None, queries=[q])
    assert report == {"http_stopped": True, "queries_stopped": True}
    assert not q.isActive


def test_read_all_streams_without_collect(server, monkeypatch):
    """GET /read must stream the scan (chunked transfer, toLocalIterator)
    — never a full-table collect on the driver (VERDICT r3) — and the
    body must be byte-identical to the old json.dumps(collected) form."""
    from pyspark.sql import DataFrame

    for code in (3, 1, 2):
        server.service.create({"code": code, "name": f"n{code}", "class": "A"})

    def _no_collect(self):
        raise AssertionError("GET /read must not collect() the full table")

    monkeypatch.setattr(DataFrame, "collect", _no_collect)
    url = f"http://127.0.0.1:{server.port}/api/v1/sinners/read"
    with urllib.request.urlopen(url) as resp:
        assert resp.status == 200
        assert resp.headers.get("Transfer-Encoding") == "chunked"
        body = resp.read().decode()
    rows = json.loads(body)
    assert [r["code"] for r in rows] == [1, 2, 3, 14]
    assert rows[0]["name"] == "n1"
    # exact byte shape of the old collected response
    assert body == json.dumps(rows)


def test_quarantine_reader_tolerates_missing_dir(spark, tmp_path):
    """Clean pipelines never create the quarantine dir; read_quarantine
    must return an empty typed frame, not raise (ADVICE r3)."""
    from cdc_cascade_spark.streaming.pipeline import read_quarantine

    df = read_quarantine(spark, str(tmp_path / "never_written"))
    assert df.count() == 0
    assert set(df.columns) == {"raw_value", "batch_id"}
