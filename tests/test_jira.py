"""JIRA issue-search source (sources/jira.py — reference jira_ext.py:1-209)
against a deterministic in-process fake JIRA REST endpoint: field-metadata
custom-field renaming, the per-type flattening rules, paging via the
PartitionedRestSource slot plan, and auth validation."""

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from omigo_data_analytics_spark.sources.jira import (
    JiraIssueSource, flatten_issue, map_custom_field_keys)

N_ISSUES = 57

FIELDS_META = [
    {"id": "summary", "name": "Summary", "schema": {"type": "string"}},
    {"id": "amount", "name": "Amount", "schema": {"type": "number"}},
    {"id": "labels", "name": "Labels", "schema": {"type": "array"}},
    {"id": "status", "name": "Status", "schema": {"type": "status"}},
    {"id": "customfield_10001", "name": "Priority",
     "schema": {"type": "string"}},
]


def _issue(i: int) -> dict:
    return {"key": f"T-{i}",
            "fields": {"summary": f"issue number {i}",
                       "amount": i * 1.5,
                       "labels": ["red", f"l{i % 3}"],
                       "status": {"name": "open" if i % 2 else "done"},
                       "customfield_10001": f"P{i % 4}",
                       "emptylist": [],
                       "nothing": None}}


class _Handler(BaseHTTPRequestHandler):
    requests_seen = []

    def do_GET(self):
        u = urllib.parse.urlparse(self.path)
        q = urllib.parse.parse_qs(u.query)
        if u.path.endswith("/field"):
            body = json.dumps(FIELDS_META).encode()
        else:
            st = int(q["startAt"][0])
            mx = int(q["maxResults"][0])
            type(self).requests_seen.append((st, mx))
            jql = q["jql"][0]
            ids = [i for i in range(N_ISSUES)
                   if "odd" not in jql or i % 2 == 1]
            body = json.dumps(
                {"total": len(ids),
                 "issues": [_issue(i) for i in ids[st:st + mx]]}).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture()
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    _Handler.requests_seen = []
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


COLS = ["key", "Summary", "summary", "amount", "labels",
        "status:json_encoded", "Priority"]


def test_flatten_issue_field_rules():
    mapping = {f["id"]: {"name": f["name"], "type": f["schema"]["type"]}
               for f in FIELDS_META}
    mp = flatten_issue(_issue(3), mapping)
    assert mp["key"] == "T-3"
    assert mp["summary"] == "issue number 3"       # string, id not custom
    assert mp["amount"] == "4.5"                   # number -> str
    assert mp["labels"] == "red,l0"                # scalar array -> join
    assert mp["status:json_encoded"] == '{"name": "open"}'  # dict -> json
    assert mp["Priority"] == "P3"                  # customfield renamed
    assert "emptylist" not in mp and "nothing" not in mp
    raw = json.loads(mp["raw"])
    assert raw["fields"]["Priority"] == "P3"       # recursive key rename
    assert "customfield_10001" not in raw["fields"]


def test_flatten_json_in_string_field():
    mapping = {"desc": {"name": "desc", "type": "string"}}
    mp = flatten_issue(
        {"key": "K", "fields": {"desc": '{"a": 1}'}}, mapping)
    assert mp["desc:json_encoded"] == '{"a": 1}'
    mp2 = flatten_issue(
        {"key": "K", "fields": {"desc": "{'a': 1}"}}, mapping)
    assert mp2["desc:json_encoded"] == '{"a": 1}'  # best-effort quotes


def test_map_custom_field_keys_nested():
    mapping = {"customfield_1": {"name": "X", "type": ""}}
    out = map_custom_field_keys(
        {"customfield_1": {"customfield_1": 2}, "b": 1}, mapping)
    assert out == {"X": {"X": 2}, "b": 1}


def test_read_pages_tile_results(spark, server):
    src = JiraIssueSource(server, COLS, auth_token="tok")
    out = src.read(spark, "project = T", page_size=10)
    rows = out.df.collect()
    assert len(rows) == N_ISSUES
    got = sorted(r["key"] for r in rows)
    assert got == sorted(f"T-{i}" for i in range(N_ISSUES))
    r3 = next(r for r in rows if r["key"] == "T-3")
    assert r3["amount"] == "4.5" and r3["Priority"] == "P3"
    assert r3["Summary"] is None  # display name not used for non-custom
    # probe (maxResults=0) + ceil(57/10)=6 page fetches tiling [0, 57)
    pages = [p for p in _Handler.requests_seen if p[1] > 0]
    assert len(pages) == 6
    assert sorted(pages)[0][0] == 0
    assert sum(mx for _, mx in pages) == N_ISSUES


def test_jql_filters_and_max_results(spark, server):
    src = JiraIssueSource(server, COLS, username="u", password="p")
    assert src.count("odd ones") == 28
    out = src.read(spark, "odd ones", max_results=5, page_size=3)
    keys = sorted(r["key"] for r in out.df.collect())
    assert keys == ["T-1", "T-3", "T-5", "T-7", "T-9"]


def test_auth_required():
    with pytest.raises(ValueError, match="authentication"):
        JiraIssueSource("http://x", ["key"])
    with pytest.raises(ValueError, match="server"):
        JiraIssueSource(None, ["key"], auth_token="t")


def test_page_slots_never_exceed_page_size():
    """Exact page chunks: total=10099/page=100 must give a 99-wide last
    slot, not split_time_slots' remainder-absorbing 199-wide one that a
    maxResults-capped server would silently truncate."""
    page = 100
    total = 10099
    slots = [(st, min(st + page, total)) for st in range(0, total, page)]
    assert all(et - st <= page for st, et in slots)
    assert slots[-1] == (10000, 10099)
    assert sum(et - st for st, et in slots) == total


def test_flatten_issue_malformed_json_degrades_to_raw(spark):
    from omigo_data_analytics_spark.sources.jira import flatten_issue

    mapping = {"customfield_1": {"name": "notes", "type": "string"}}
    issue = {"key": "J-1", "fields": {
        "customfield_1": "{'name': 'O'Brien'}"}}
    mp = flatten_issue(issue, mapping)
    assert mp["notes"] == "{'name': 'O'Brien'}"  # raw, not an exception
