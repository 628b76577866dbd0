"""In-process fake Glue endpoint (test/demo fixture — NOT a client).

Speaks just enough of the public Glue JSON protocol for the S2 client
to browse it: GetDatabases/GetTables with NextToken pagination, behind
REAL sigv4 verification (the handler recomputes the signature from the
shared secret with catalog.glue.sigv4_headers and rejects mismatches).
Used by the ``meta_glue_discovery`` registry golden so the Glue plane
has driver-checked evidence, the same pattern as the warehouse-
discovery fixture; tests/test_glue_catalog.py carries the richer twin.
"""

from __future__ import annotations

import hmac as _hmac
import json
import re
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

FIXTURE_ACCESS = "AKIDFIXTURE"
FIXTURE_SECRET = "glue-fixture-secret"
FIXTURE_REGION = "us-east-1"

#: the deterministic catalog the fixture serves
FIXTURE_LAYOUT = {
    "analytics": [("orders_t", "ICEBERG"), ("legacy_csv", None)],
    "raw": [("events_t", "ICEBERG")],
}


class _FixtureHandler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def _send(self, code: int, doc: dict) -> None:
        body = json.dumps(doc).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/x-amz-json-1.1")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _verify(self, body: bytes) -> bool:
        import datetime as dt

        from .glue import sigv4_headers

        auth = self.headers.get("Authorization", "")
        m = re.match(
            r"AWS4-HMAC-SHA256 Credential=([^/]+)/\d+/([^/]+)/glue/aws4_request",
            auth,
        )
        if not m or m.group(1) != FIXTURE_ACCESS or m.group(2) != FIXTURE_REGION:
            return False
        amz = self.headers.get("X-Amz-Date", "")
        try:
            now = dt.datetime.strptime(amz, "%Y%m%dT%H%M%SZ").replace(
                tzinfo=dt.timezone.utc
            )
        except ValueError:
            return False
        expect = sigv4_headers(
            "POST",
            f"http://{self.headers['Host']}/",
            body,
            FIXTURE_REGION,
            FIXTURE_ACCESS,
            FIXTURE_SECRET,
            {"Content-Type": self.headers.get("Content-Type", ""),
             "X-Amz-Target": self.headers.get("X-Amz-Target", "")},
            now=now,
        )["Authorization"]
        return _hmac.compare_digest(expect, auth)

    def do_POST(self):  # noqa: N802 (http.server API)
        body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
        if not self._verify(body):
            return self._send(403, {"__type": "AccessDeniedException"})
        op = self.headers.get("X-Amz-Target", "").removeprefix("AWSGlue.")
        req = json.loads(body or b"{}")
        dbs = sorted(FIXTURE_LAYOUT)
        if op == "GetDatabases":
            # one database per page to exercise pagination every call
            start = int(req.get("NextToken") or 0)
            out = {"DatabaseList": [{"Name": dbs[start]}]}
            if start + 1 < len(dbs):
                out["NextToken"] = str(start + 1)
            return self._send(200, out)
        if op == "GetTables":
            db = req.get("DatabaseName")
            if db not in FIXTURE_LAYOUT:
                return self._send(400, {"__type": "EntityNotFoundException"})
            return self._send(
                200,
                {"TableList": [
                    {"Name": n,
                     "Parameters": ({"table_type": t} if t else {"classification": "csv"})}
                    for n, t in FIXTURE_LAYOUT[db]
                ]},
            )
        return self._send(400, {"__type": f"UnknownOperation:{op}"})


def start_fixture_server() -> tuple[HTTPServer, str]:
    """Start the fake endpoint on an ephemeral port; caller must
    ``server.shutdown()`` when done. Returns (server, endpoint_url)."""
    srv = HTTPServer(("127.0.0.1", 0), _FixtureHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_port}"
