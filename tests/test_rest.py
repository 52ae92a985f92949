"""Partitioned REST source (sources/rest.py — the Splunk/LogScale time-slot
pattern, splunk_ext.py:181-359) against a deterministic in-process fake
HTTP server. Executor tasks hit 127.0.0.1 directly in local mode."""

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from omigo_data_analytics_spark.sources.rest import (
    ERROR_COL, PartitionedRestSource, split_time_slots)

# synthetic event stream: one event per tick in [0, 1000), value = tick * 2
N_TICKS = 1000


class _Handler(BaseHTTPRequestHandler):
    fail_next = 0
    requests_seen = []

    def do_GET(self):
        u = urllib.parse.urlparse(self.path)
        q = urllib.parse.parse_qs(u.query)
        st, et = int(q["st"][0]), int(q["et"][0])
        limit = int(q.get("limit", [10**9])[0])
        type(self).requests_seen.append((st, et))
        if type(self).fail_next > 0:
            type(self).fail_next -= 1
            self.send_response(503)
            self.end_headers()
            return
        rows = [{"tick": i, "val": i * 2}
                for i in range(max(st, 0), min(et, N_TICKS))][:limit]
        body = json.dumps(rows).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture()
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    _Handler.requests_seen = []
    _Handler.fail_next = 0
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_split_time_slots_reference_semantics():
    # floor width, last slot absorbs the remainder (splunk_ext.py:180-199)
    assert split_time_slots(0, 10, 3) == [(0, 3), (3, 6), (6, 10)]
    assert split_time_slots(0, 2, 5) == [(0, 2)]  # width 0 -> single slot


def test_read_covers_range_exactly(spark, server):
    src = PartitionedRestSource(
        lambda st, et: f"{server}/events?st={st}&et={et}", ["tick", "val"])
    out = src.read(spark, 0, N_TICKS, num_slots=7)
    rows = out.df.collect()
    assert len(rows) == N_TICKS
    got = sorted((int(r["tick"]), int(r["val"])) for r in rows)
    assert got == [(i, 2 * i) for i in range(N_TICKS)]
    assert all(r[ERROR_COL] == "" for r in rows)
    # exactly one request per slot, and the slots tile the range
    assert len(_Handler.requests_seen) == 7
    assert sorted(_Handler.requests_seen)[0][0] == 0


def test_limit_triggers_one_level_resplit(spark, server):
    # 4 slots of 250 rows; server caps at 200 -> each slot re-splits into
    # 4 sub-slots of ~62 rows, under the limit. No row lost, none duplicated.
    src = PartitionedRestSource(
        lambda st, et: f"{server}/events?st={st}&et={et}&limit=200",
        ["tick", "val"], limit=200, num_par_on_limit=4)
    out = src.read(spark, 0, N_TICKS, num_slots=4)
    ticks = sorted(int(r["tick"]) for r in out.df.collect())
    assert ticks == list(range(N_TICKS))
    # 4 first-level (all at limit) + 16 sub-slot fetches
    assert len(_Handler.requests_seen) == 20


def test_retry_then_success(spark, server):
    _Handler.fail_next = 2
    src = PartitionedRestSource(
        lambda st, et: f"{server}/events?st={st}&et={et}", ["tick", "val"],
        attempts=4, attempt_sleep_sec=0.01)
    out = src.read(spark, 0, 10, num_slots=1)
    assert out.df.count() == 10


def test_error_row_after_attempts_exhausted(spark, server):
    _Handler.fail_next = 99
    src = PartitionedRestSource(
        lambda st, et: f"{server}/events?st={st}&et={et}", ["tick", "val"],
        attempts=2, attempt_sleep_sec=0.01)
    rows = src.read(spark, 0, 10, num_slots=1).df.collect()
    # one __error_msg__ row instead of a failed job (splunk_ext.py:345-358)
    assert len(rows) == 1 and "HTTPError" in rows[0][ERROR_COL]
    assert rows[0]["tick"] is None


def test_tsv_payload_parse(spark, server):
    # default parser also accepts TSV-with-header (the reference's native
    # format); exercised via a file:// style inline fake is overkill — use
    # the parse hook directly
    from omigo_data_analytics_spark.sources.rest import _default_parse

    rows = _default_parse("a\tb\n1\tx\n2\ty")
    assert rows == [{"a": "1", "b": "x"}, {"a": "2", "b": "y"}]
    assert _default_parse('{"results": [{"a": 1}]}') == [{"a": 1}]
    assert _default_parse("") == []
