"""HTTP API analog of the reference's axum server
(crates/zparse-api/src/main.rs:83-93) on the Python stdlib — same four
routes and the same (deliberately asymmetric) response shapes:

  GET  /api/health          -> {"status": "ok"}
  GET  /api/formats         -> ["json","jsonc","csv","toml","yaml","xml"]
  POST /api/parse           -> {"status":"ok","data":<value>}
                               | {"status":"err","error":<msg>}     (main.rs:68-73)
  POST /api/convert         -> {"status":"ok","content":<text>}
                               | {"status":"error","content":<msg>} (main.rs:156-167)

Request bodies mirror ParseRequest/ConvertRequest (main.rs:7-20):
{content, format|from[, to][, csv_delimiter]}. "jsonc" input maps to
the permissive JSON config; a csv_delimiter overrides CsvConfig
(main.rs:127-153). Run: `python -m zparse_ray.api` (ZPARSE_HOST /
ZPARSE_PORT env vars, defaults 127.0.0.1:3000 like main.rs:96-98).

Per-request handling is synchronous library calls on a threading
server — the reference's tokio concurrency model maps to
ThreadingHTTPServer; the library calls share nothing either way.
"""

from __future__ import annotations

import json
import os
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .functions.convert import ConvertOptions, convert
from .functions.csv_parser import CsvConfig
from .functions.errors import ParseError
from .functions.json_parser import JSONC_CONFIG

FORMATS = ["json", "jsonc", "csv", "toml", "yaml", "xml"]


def _options(fmt: str, csv_delimiter: str | None) -> tuple[str, ConvertOptions]:
    """(effective from-format, options) per main.rs:127-153."""
    opts = ConvertOptions()
    if fmt == "jsonc":
        fmt = "json"
        opts = ConvertOptions(json=JSONC_CONFIG)
    if csv_delimiter and len(csv_delimiter) == 1 and ord(csv_delimiter) < 128:
        opts = ConvertOptions(json=opts.json, csv=CsvConfig(delimiter=csv_delimiter))
    return fmt, opts


def parse_to_json(content: str, fmt: str, csv_delimiter: str | None = None):
    fmt, opts = _options(fmt, csv_delimiter)
    return json.loads(convert(content, fmt, "json", opts))


def handle_parse(body: dict) -> dict:
    try:
        fmt = body["format"]
        if fmt not in FORMATS:
            raise ValueError(f"unknown format: {fmt}")
        data = parse_to_json(body["content"], fmt, body.get("csv_delimiter"))
        return {"status": "ok", "data": data}
    except (ParseError, ValueError, KeyError, json.JSONDecodeError) as e:
        return {"status": "err", "error": str(e)}


def handle_convert(body: dict) -> dict:
    try:
        frm, to = body["from"], body["to"]
        if frm not in FORMATS or to not in [f for f in FORMATS if f != "jsonc"]:
            raise ValueError(f"unknown format: {frm}/{to}")
        frm, opts = _options(frm, body.get("csv_delimiter"))
        out = convert(body["content"], frm, to, opts)
        return {"status": "ok", "content": out}
    except (ParseError, ValueError, KeyError) as e:
        return {"status": "error", "content": str(e)}


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def _send(self, obj, code: int = 200) -> None:
        data = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Access-Control-Allow-Origin", "*")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        if self.path == "/api/health":
            self._send({"status": "ok"})
        elif self.path == "/api/formats":
            self._send(FORMATS)
        else:
            self._send({"status": "err", "error": "not found"}, 404)

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        try:
            body = json.loads(self.rfile.read(n))
        except json.JSONDecodeError as e:
            self._send({"status": "err", "error": str(e)}, 400)
            return
        if self.path == "/api/parse":
            self._send(handle_parse(body))
        elif self.path == "/api/convert":
            self._send(handle_convert(body))
        else:
            self._send({"status": "err", "error": "not found"}, 404)


def serve(host: str | None = None, port: int | None = None) -> ThreadingHTTPServer:
    host = host or os.environ.get("ZPARSE_HOST", "127.0.0.1")
    port = port if port is not None else int(os.environ.get("ZPARSE_PORT", "3000"))
    return ThreadingHTTPServer((host, port), _Handler)


if __name__ == "__main__":
    srv = serve()
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
