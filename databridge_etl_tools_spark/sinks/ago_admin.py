"""AGO feature-layer index administration (SURVEY §2.6 D8's REST
half): the ``addToDefinition`` choreography the reference runs after
every AGO load (ago/ago.py:932-1079).

This is control-plane work — a handful of admin POSTs per table, not
per-row data movement — so it runs driver-side on purpose (the
reference does the same); the data plane stays in
``sinks/rest_sink.post_batches``.

Reference semantics modeled 1:1:

- comma-separated index-field list; composite indexes spelled
  ``a+b`` become the multi-field definition ``a,b`` with name
  ``a_b_idx`` (ago/ago.py:965-985).
- per-field uniqueness looked up in the extractor's JSON schema
  fields (``{"name": ..., "unique": ...}``, ago/ago.py:944-957).
- ESRI reports failures as HTTP-200 bodies, so dispatch is on the
  response TEXT (ago/ago.py:994-1027): "Invalid definition" means
  the index already exists (success in practice); "Invalid URL" is a
  config error (map name != table name) and raises; the
  length-limit and timeout errors are retriable exactly once after a
  wait; anything else is accepted optimistically.
- settle-check (ago/ago.py:1049-1079): wait, GET the layer
  definition, diff expected index names against what AGO lists, and
  re-post the missing ones — tolerating AGO's habit of
  under-reporting installed indexes.

Waits are injectable (the reference hard-codes 200 s / 30 s / 2 s)
so tests run in milliseconds without changing the choreography.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field

RETRIABLE_MARKERS = (
    "Operation failed. The index entry of length",
    "Your request has timed out",
)


@dataclass
class IndexReport:
    """What happened to each requested index (choreography audit)."""

    posted: list[str] = field(default_factory=list)
    already_present: list[str] = field(default_factory=list)
    retried: list[str] = field(default_factory=list)
    retry_failed: list[str] = field(default_factory=list)
    missing_after_settle: list[str] = field(default_factory=list)
    reposted: list[str] = field(default_factory=list)


class AGOIndexAdmin:
    """Posts index definitions to a feature layer and verifies them.

    ``base_url`` is the service root; admin posts go to
    ``{base}/FeatureServer/{layer}/addToDefinition`` and the
    settle-check reads ``{base}/FeatureServer/{layer}`` — the same
    two endpoints the reference derives from org id + item name
    (ago/ago.py:987,1052).
    """

    def __init__(
        self,
        base_url: str,
        layer: int = 0,
        token: str | None = None,
        *,
        inter_post_wait: float = 2.0,
        retry_wait: float = 200.0,
        settle_wait: float = 30.0,
        timeout: float = 360.0,
        session=None,
    ):
        import requests

        self.base = base_url.rstrip("/")
        self.layer = layer
        self.token = token
        self.inter_post_wait = inter_post_wait
        self.retry_wait = retry_wait
        self.settle_wait = settle_wait
        self.timeout = timeout
        self.session = session or requests.Session()

    # -- single index ----------------------------------------------------
    @staticmethod
    def index_name(spec: str) -> str:
        """``a+b`` → ``a_b_idx``; ``a`` → ``a_idx`` (ago/ago.py:965-975,
        1060-1064)."""
        return spec.replace("+", "_").replace(",", "_") + "_idx"

    def _post_one(self, spec: str, is_unique: bool, report: IndexReport) -> None:
        fields = spec.replace("+", ",")
        definition = {
            "indexes": [
                {
                    "name": self.index_name(spec),
                    "fields": fields,
                    "isUnique": is_unique,
                    "isAscending": True,
                }
            ]
        }
        url = f"{self.base}/FeatureServer/{self.layer}/addToDefinition"
        params = {"token": self.token} if self.token else None
        data = {"f": "json", "addToDefinition": json.dumps(definition)}

        r = self.session.post(url, params=params, data=data, timeout=self.timeout)
        text = r.text
        if "Invalid definition" in text:
            # usually means the index already exists (ago/ago.py:996-1001)
            report.already_present.append(self.index_name(spec))
            return
        if "Invalid URL" in text:
            raise ValueError(
                f"AGO rejected the admin URL for {spec!r} — the service "
                f"name likely differs from the table name (ago/ago.py:1003)"
            )
        if any(m in text for m in RETRIABLE_MARKERS):
            report.retried.append(self.index_name(spec))
            time.sleep(self.retry_wait)
            r = self.session.post(url, params=params, data=data, timeout=self.timeout)
            if "success" not in r.text:
                # the reference logs and continues (ago/ago.py:1012-1015);
                # the settle-check below gets a second chance at it
                report.retry_failed.append(self.index_name(spec))
            else:
                report.posted.append(self.index_name(spec))
            return
        report.posted.append(self.index_name(spec))

    # -- choreography ----------------------------------------------------
    def post_index_fields(
        self,
        index_fields: str,
        schema_fields: list[dict] | None = None,
    ) -> IndexReport:
        """Post every index in the comma-separated ``index_fields``
        spec, then settle-check the layer definition and re-post any
        the service does not list (ago/ago.py:1032-1079)."""
        uniques = {
            f["name"] for f in (schema_fields or []) if f.get("unique")
        }
        report = IndexReport()
        specs = [s for s in index_fields.split(",") if s]
        for spec in specs:
            self._post_one(spec, spec in uniques, report)
            time.sleep(self.inter_post_wait)

        # settle, then verify against the (possibly under-reporting)
        # definition listing
        time.sleep(self.settle_wait)
        listed = {i["name"] for i in self.layer_definition().get("indexes", [])}
        by_name = {self.index_name(s): s for s in specs}
        missing = [n for n in by_name if n not in listed]
        report.missing_after_settle = missing
        for name in missing:
            # re-post with is_unique=false like the reference's retry
            # loop (ago/ago.py:1073-1076) — but by the ORIGINAL field
            # spec: the reference passes the derived index NAME back in
            # as the field list, which would define an index named
            # `a_b_idx_idx` over a nonexistent column; deliberate fix.
            self._post_one(by_name[name], False, report)
            report.reposted.append(name)
        return report

    def layer_definition(self) -> dict:
        params = {"f": "pjson"}
        if self.token:
            params["token"] = self.token
        r = self.session.get(
            f"{self.base}/FeatureServer/{self.layer}", params=params, timeout=self.timeout
        )
        r.raise_for_status()
        return r.json()
