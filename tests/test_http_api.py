"""HTTP API analog tests (ref crates/zparse-api/src/main.rs route + shape parity)."""

import json
import threading
import urllib.request

import pytest

from zparse_ray.api import serve


@pytest.fixture(scope="module")
def server():
    srv = serve(host="127.0.0.1", port=0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=5) as r:
        return json.loads(r.read())


def _post(url, body):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(), headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=5) as r:
        return json.loads(r.read())


def test_health_and_formats(server):
    assert _get(server + "/api/health") == {"status": "ok"}
    assert _get(server + "/api/formats") == ["json", "jsonc", "csv", "toml", "yaml", "xml"]


def test_parse_ok_err_shapes(server):
    ok = _post(server + "/api/parse", {"content": '{"a": 1}', "format": "json"})
    assert ok == {"status": "ok", "data": {"a": 1.0}}
    err = _post(server + "/api/parse", {"content": '{"a": ', "format": "json"})
    assert err["status"] == "err" and "error" in err


def test_parse_jsonc_and_csv_delimiter(server):
    ok = _post(server + "/api/parse", {"content": '{"a": 1,} // c', "format": "jsonc"})
    assert ok["status"] == "ok" and ok["data"] == {"a": 1.0}
    ok = _post(
        server + "/api/parse",
        {"content": "a;b\n1;2\n", "format": "csv", "csv_delimiter": ";"},
    )
    assert ok["data"] == [{"a": 1.0, "b": 2.0}]


def test_convert_shapes(server):
    ok = _post(
        server + "/api/convert",
        {"content": "[s]\np = 1\n", "from": "toml", "to": "json"},
    )
    assert ok == {"status": "ok", "content": '{"s":{"p":1}}'}
    # convert errors use status "error" with the message in `content`
    # (main.rs:156-167 asymmetry, mirrored deliberately)
    err = _post(
        server + "/api/convert", {"content": "x = ", "from": "toml", "to": "json"}
    )
    assert err["status"] == "error" and err["content"]
