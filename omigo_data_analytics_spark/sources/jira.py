"""JIRA issue-search source — parity with the reference's jira_ext.py
(python-packages/extensions/src/omigo_ext/jira_ext.py:1-209) re-expressed
Spark-first.

The reference wraps the ``jira`` client library and materializes every
issue on the client, one blocking ``search_issues`` call at a time
(jira_ext.py:57-183). Here the public JIRA REST pagination contract
(``/rest/api/2/search`` with ``startAt``/``maxResults``; ``total`` in the
response envelope) becomes a page-slot plan over the existing
:class:`~..sources.rest.PartitionedRestSource`: a cheap driver-side probe
reads ``total`` and the field-metadata map, then each page is fetched
INSIDE an executor task via ``mapInPandas`` — a 100k-issue export fans out
across the cluster instead of polling one connection, and issue payloads
never pass through the driver.

Field flattening follows the reference row model (jira_ext.py:72-183):

- ``key`` from the issue key;
- ``customfield_*`` ids renamed to their display names via the
  ``/rest/api/2/field`` metadata (jira_ext.py:45-48, 108-110);
- None / empty-list / empty-dict values are skipped (column -> NULL);
- string fields that *contain* JSON are re-encoded canonically under
  ``<name>:json_encoded`` (single-quoted pseudo-JSON best-effort, with
  the same caveat the reference warns about);
- date / datetime / group / number fields stringify;
- dict values and arrays of dicts JSON-encode under
  ``<name>:json_encoded``; arrays of scalars comma-join;
- ``raw`` is the whole issue JSON with custom-field ids recursively
  renamed (jira_ext.py:156-174), available when projected in ``cols``.

Every output value is a string (the reference TSV model); the fixed
``cols`` list pins the Spark schema up front, which the reference's
dynamic union-of-maps cannot do.
"""

from __future__ import annotations

import base64
import json
import math
import urllib.parse
import urllib.request

from pyspark.sql import SparkSession

from ..core.dataframe import OmigoDF
from .rest import PartitionedRestSource

SEARCH_PATH = "/rest/api/2/search"
FIELDS_PATH = "/rest/api/2/field"


def map_custom_field_keys(raw, fields_mapping: dict) -> object:
    """Recursively rename ``customfield_*`` keys to display names in a raw
    issue JSON tree (reference ``__raw_json_custom_field_mapping__``,
    jira_ext.py:156-170)."""
    if not isinstance(raw, dict):
        return raw
    out = {}
    for k, v in raw.items():
        k2 = (fields_mapping[k]["name"]
              if k.startswith("customfield_") and k in fields_mapping else k)
        out[k2] = map_custom_field_keys(v, fields_mapping)
    return out


def flatten_issue(issue: dict, fields_mapping: dict) -> dict:
    """One issue -> one flat all-string map (reference per-issue loop,
    jira_ext.py:72-183)."""
    mp = {"key": str(issue.get("key", ""))}
    fields = issue.get("fields", {}) or {}
    for k, value in fields.items():
        if value is None:
            continue
        if isinstance(value, (list, dict)) and len(value) == 0:
            continue
        meta = fields_mapping.get(k, {})
        field_type = meta.get("type", "")
        k2 = (meta["name"]
              if k.startswith("customfield_") and k in fields_mapping else k)
        if field_type == "string":
            s = str(value)
            # JSON-looking values parse BEST-EFFORT: one malformed field
            # (e.g. an apostrophe breaking the single-quote transform)
            # must degrade to the raw string, not raise and convert the
            # whole page into a single error row (bulk data loss)
            if (s.startswith('{"') and s.endswith("}")) or \
               (s.startswith('[{"') and s.endswith("}]")):
                try:
                    mp[f"{k2}:json_encoded"] = json.dumps(json.loads(s))
                except ValueError:
                    mp[k2] = s
            elif (s.startswith("{'") and s.endswith("}")) or \
                 (s.startswith("[{'") and s.endswith("}]")):
                # best-effort single-quote transform, as the reference
                # warns (jira_ext.py:123-130)
                try:
                    mp[f"{k2}:json_encoded"] = json.dumps(
                        json.loads(s.replace("'", '"')))
                except ValueError:
                    mp[k2] = s
            else:
                mp[k2] = s
        elif field_type in ("date", "datetime", "group", "number"):
            mp[k2] = str(value)
        elif isinstance(value, dict):
            mp[f"{k2}:json_encoded"] = json.dumps(value)
        elif field_type == "array" and len(value) > 0:
            if isinstance(value[0], dict):
                mp[f"{k2}:json_encoded"] = json.dumps(value)
            else:
                mp[k2] = ",".join(str(v) for v in value)
        elif isinstance(value, (str, int, float)):
            mp[k2] = str(value)
        else:
            # objects: public attrs only (reference vars() branch,
            # jira_ext.py:148-153); unreachable for plain REST JSON
            mp[f"{k2}:json_encoded"] = json.dumps(
                {a: str(v) for a, v in vars(value).items()
                 if not a.startswith("_")})
    mp["raw"] = json.dumps(map_custom_field_keys(issue, fields_mapping))
    return mp


class JiraIssueSource:
    """JQL search -> OmigoDF, distributed by result page.

    ``cols`` pins the projected columns (``key``, display-named fields,
    ``<name>:json_encoded`` variants, optionally ``raw``); fields an
    issue lacks come back NULL. Auth is basic (username+password) or
    bearer token — exactly the two mechanisms the reference accepts,
    raising without one (jira_ext.py:37-42); pre-built ``headers`` also
    satisfy the check for fake/test endpoints."""

    def __init__(self, server: str, cols: list[str],
                 username: str | None = None, password: str | None = None,
                 auth_token: str | None = None, headers: dict | None = None,
                 attempts: int = 3, timeout: int = 60):
        if server is None:
            raise ValueError("JiraIssueSource: server is None")
        self.server = server.rstrip("/")
        self.cols = list(cols)
        self.headers = dict(headers or {})
        if username is not None and password is not None:
            tok = base64.b64encode(
                f"{username}:{password}".encode()).decode()
            self.headers["Authorization"] = f"Basic {tok}"
        elif auth_token is not None:
            self.headers["Authorization"] = f"Bearer {auth_token}"
        elif not self.headers:
            raise ValueError(
                "JiraIssueSource: no valid authentication mechanism found")
        self.attempts = attempts
        self.timeout = timeout

    # ------------------------------------------------- driver-side probes
    def _get_json(self, url: str):
        req = urllib.request.Request(url, headers=self.headers)
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return json.loads(resp.read().decode("utf-8"))

    def _search_url(self, jql: str, start_at: int, max_results: int) -> str:
        q = urllib.parse.quote(jql, safe="")
        return (f"{self.server}{SEARCH_PATH}?jql={q}"
                f"&startAt={start_at}&maxResults={max_results}")

    def fields_mapping(self) -> dict:
        """{field_id: {name, type}} from /rest/api/2/field (the metadata
        the reference builds at login, jira_ext.py:45-48)."""
        out = {}
        for f in self._get_json(f"{self.server}{FIELDS_PATH}"):
            out[str(f["id"])] = {
                "name": str(f["name"]),
                "type": (str(f["schema"]["type"])
                         if "schema" in f and "type" in f["schema"] else ""),
            }
        return out

    def count(self, jql: str) -> int:
        """Total matching issues — one maxResults=0 probe."""
        return int(self._get_json(self._search_url(jql, 0, 0))["total"])

    # --------------------------------------------------------------- read
    def read(self, spark: SparkSession, jql: str,
             max_results: int | None = None,
             page_size: int = 100) -> OmigoDF:
        """Distributed paged search. Pages are PartitionedRestSource
        slots over [0, total): slot (st, et) fetches
        ``startAt=st&maxResults=et-st``, one page per executor task."""
        total = self.count(jql)
        if max_results is not None:
            total = min(total, int(max_results))
        mapping = self.fields_mapping()
        cols = self.cols

        def parse(text: str) -> list[dict]:
            data = json.loads(text)
            return [flatten_issue(i, mapping)
                    for i in data.get("issues", [])]

        src = PartitionedRestSource(
            lambda st, et: self._search_url(jql, st, et - st),
            cols, parse=parse, headers=self.headers,
            attempts=self.attempts, timeout=self.timeout)
        # exact page chunks, NOT split_time_slots: its last-slot-absorbs-
        # remainder shape can exceed page_size (e.g. total=10099/page=100
        # -> last slot 199 wide), and a server capping maxResults at the
        # page size would silently drop the overflow
        page = max(1, int(page_size))
        slots = [(st, min(st + page, total))
                 for st in range(0, max(total, 1), page)]
        return src.read(spark, 0, total, slots=slots)
