"""Local HTTP stub emulating the reference's REST services (Knack
pages, Airtable offsets, AGO feature query + edits, AIS geocoder) for
source/sink tests."""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

KNACK_FIELDS = [
    {"label": "Record ID", "type": "auto_increment"},
    {"label": "Date Opened", "type": "date_time"},
    {"label": "Status", "type": "multiple_choice"},
    {"label": "Amount", "type": "number"},
]
KNACK_RECORDS = [
    {
        "id": f"k{i}",
        "record_id": i,
        "date_opened": None if i % 5 == 0 else f"2024-03-{1 + i % 28:02d}T09:30:00Z",
        "status": {"v": i % 2},
        "amount": i * 1.5,
    }
    for i in range(25)
]

AIR_RECORDS = [{"id": f"rec{i}", "fields": {"Name": f"n{i}", "Value": i}} for i in range(30)]

AGO_FEATURES = [
    {"attributes": {"objectid": i, "pk": f"p{i % 8}", "val": i * 10}} for i in range(20)
]


class Handler(BaseHTTPRequestHandler):
    server_version = "Stub/1.0"
    posted: list[dict] = []  # class-level capture of POST bodies
    fail_batches: set[str] = set()  # batch ids to reject (once each)
    feature_queries: list[dict] = []  # GET /query params, for pushdown asserts
    ago_indexes: list[dict] = []  # indexes accepted via addToDefinition
    ago_error_queue: list[str] = []  # canned addToDefinition response bodies
    ago_hidden_indexes: set[str] = set()  # names omitted from the definition once

    def log_message(self, *a):  # silence
        pass

    def _json(self, doc, code=200):
        body = json.dumps(doc).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802
        u = urlparse(self.path)
        q = {k: v[0] for k, v in parse_qs(u.query).items()}
        if u.path.endswith("/fields"):
            return self._json({"fields": KNACK_FIELDS})
        if u.path.endswith("/records"):  # knack pagination
            page = int(q.get("page", 1))
            per = int(q.get("rows_per_page", 10))
            total_pages = (len(KNACK_RECORDS) + per - 1) // per
            recs = KNACK_RECORDS[(page - 1) * per : page * per]
            return self._json(
                {
                    "records": recs,
                    "current_page": page,
                    "total_pages": total_pages,
                    "total_records": len(KNACK_RECORDS),
                }
            )
        if u.path.endswith("/airtable"):  # offset pagination
            per = int(q.get("pageSize", 10))
            off = int(q.get("offset", 0))
            recs = AIR_RECORDS[off : off + per]
            doc = {"records": recs}
            if off + per < len(AIR_RECORDS):
                doc["offset"] = off + per
            return self._json(doc)
        if u.path.endswith("/query"):  # AGO feature query
            if q.get("returnCountOnly") == "true":
                return self._json({"count": len(AGO_FEATURES)})
            Handler.feature_queries.append(dict(q))
            off = int(q.get("resultOffset", 0))
            per = int(q.get("resultRecordCount", 1000))
            where = q.get("where", "1=1")
            feats = AGO_FEATURES
            # evaluate simple 'col op value [AND ...]' predicates
            for pred in where.split(" AND "):
                m = re.match(r"(\w+) (>=|<=|>|<|=) '?([^']*)'?$", pred.strip())
                if not m:
                    continue
                col, op, raw = m.groups()
                val = int(raw) if raw.lstrip("-").isdigit() else raw
                import operator as _op

                fn = {">=": _op.ge, "<=": _op.le, ">": _op.gt, "<": _op.lt, "=": _op.eq}[op]
                feats = [f for f in feats if fn(f["attributes"].get(col), val)]
            # emulate the server's maxRecordCount (9) capping requests
            # below the client's batch, with the ArcGIS transfer flag
            capped = min(per, 9)
            page = feats[off : off + capped]
            doc = {"features": page}
            if per > capped and off + capped < len(feats):
                doc["exceededTransferLimit"] = True
            return self._json(doc)
        if re.search(r"/FeatureServer/\d+$", u.path):  # AGO layer definition
            # indexes AGO claims to have (it under-reports: hidden
            # names are dropped from the listing exactly once)
            listed = [
                i for i in Handler.ago_indexes
                if i["name"] not in Handler.ago_hidden_indexes
            ]
            Handler.ago_hidden_indexes.clear()
            return self._json({"indexes": listed})
        if "/search/" in u.path:  # AIS geocoder
            addr = unquote(u.path.rsplit("/", 1)[-1])
            if addr.startswith("bad"):
                return self._json({"features": []})
            return self._json(
                {
                    "features": [
                        {
                            "properties": {
                                "lon": "-75.16",
                                "lat": "39.95",
                                "shape": f"SRID=4326;POINT (-75.16 39.95)",
                                "match_type": "exact",
                                "normalized": addr.upper(),
                            }
                        }
                    ]
                }
            )
        return self._json({"error": "not found"}, 404)

    def do_POST(self):  # noqa: N802
        n = int(self.headers.get("Content-Length", 0))
        raw = self.rfile.read(n) or b"{}"
        if urlparse(self.path).path.endswith("/addToDefinition"):
            # ESRI signals errors as 200s with an error string in the
            # body — emulate with a scriptable response queue
            if Handler.ago_error_queue:
                body = Handler.ago_error_queue.pop(0).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return None
            form = {k: v[0] for k, v in parse_qs(raw.decode()).items()}
            for idx in json.loads(form["addToDefinition"])["indexes"]:
                if idx["name"] not in {i["name"] for i in Handler.ago_indexes}:
                    Handler.ago_indexes.append(idx)
            return self._json({"success": True})
        doc = json.loads(raw)
        if self.path.endswith("/always-fail"):
            return self._json({"error": "permanent"}, 500)
        bid = doc.get("batch_id", "")
        if bid in Handler.fail_batches:
            Handler.fail_batches.discard(bid)  # fail only once → retry succeeds
            return self._json({"error": "transient"}, 500)
        if bid.endswith("-permfail"):
            return self._json({"error": "permanent"}, 500)
        Handler.posted.append(doc)
        return self._json({"ok": True, "n": len(doc.get("rows", []))})


def start_stub() -> tuple[ThreadingHTTPServer, str]:
    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"
