"""S3/S5 spaces surface (config validation, xLucene translation golden
strings, ReaderClient-swap), K4 scripted updates, Q3 char-class
expansion."""

from datetime import datetime

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from elasticsearch_assets_ray.sources.reader_api import ReaderAPI, ReaderSlice
from elasticsearch_assets_ray.sources.spaces import (
    SpacesAPIConfig,
    SpacesReaderAPI,
    translate_slice,
)


def test_spaces_config_validation():
    ok = SpacesAPIConfig(endpoint="https://x", token="t", index="i")
    assert ok.retry == 3 and ok.timeout_ms == 300_000
    with pytest.raises(ValueError, match="token"):
        SpacesAPIConfig(endpoint="https://x", token="", index="i")
    with pytest.raises(ValueError, match="timeout"):
        SpacesAPIConfig(endpoint="https://x", token="t", index="i", timeout_ms=0)


def test_translate_golden_strings():
    # range clause: inclusive lower, EXCLUSIVE upper (reference
    # SpacesReaderClient.translateSearchQuery range printing)
    s = ReaderSlice(start=datetime(2024, 1, 1), end=datetime(2024, 2, 1))
    assert (
        translate_slice(s, date_col="created")
        == "created:[2024-01-01T00:00:00 TO 2024-02-01T00:00:00}"
    )
    assert translate_slice(ReaderSlice(keys=["ab"]), key_col="uuid") == "uuid:ab*"
    assert (
        translate_slice(ReaderSlice(keys=["a", "b"]), key_col="uuid")
        == "(uuid:a* OR uuid:b*)"
    )
    assert (
        translate_slice(ReaderSlice(keys=["ab"], keys_exact=True), key_col="uuid")
        == "uuid:ab"
    )
    s = ReaderSlice(start=datetime(2024, 1, 1), keys=["x"], query="foo bar")
    assert (
        translate_slice(s, date_col="d", key_col="k")
        == "d:[2024-01-01T00:00:00 TO *} AND k:x* AND (foo bar)"
    )


def test_spaces_reader_backend_swap(tmp_path):
    p = str(tmp_path / "t.parquet")
    pq.write_table(
        pa.table({"k": pa.array(["a1", "a2", "b1"]), "v": pa.array([1, 2, 3])}), p
    )
    local = ReaderAPI(p, key_col="k")
    api = SpacesReaderAPI(
        SpacesAPIConfig(endpoint="https://s", token="t", index="i"), local=local
    )
    out = api.fetch(ReaderSlice(keys=["a"]))
    assert out.num_rows == 2 and api.records_fetched == 2
    assert api.count(ReaderSlice(keys=["b"])) == 1

    # transport injection (the HTTP seam): receives the xLucene string
    seen = {}

    def fake_transport(xl, cfg):
        seen["xl"] = xl
        return pa.table({"k": pa.array(["z"])})

    api2 = SpacesReaderAPI(
        SpacesAPIConfig(endpoint="https://s", token="t", index="i"),
        local=local,
        transport=fake_transport,
    )
    api2.fetch(ReaderSlice(keys=["a"]))
    assert seen["xl"] == "k:a*"

    bare = SpacesReaderAPI(SpacesAPIConfig(endpoint="e", token="t", index="i"))
    with pytest.raises(RuntimeError, match="transport"):
        bare.fetch(ReaderSlice(keys=["a"]))


def test_expand_charclass_prefix():
    from elasticsearch_assets_ray.sources.reader import expand_charclass_prefix

    assert expand_charclass_prefix("a[b-d].*") == ["ab", "ac", "ad"]
    assert expand_charclass_prefix("src[0-2x]") == ["src0", "src1", "src2", "srcx"]
    with pytest.raises(ValueError):
        expand_charclass_prefix("no-class-here")
    with pytest.raises(ValueError):
        expand_charclass_prefix("a[z-a]")


def test_scripted_update(ray_session, tmp_path):
    import ray.data

    from elasticsearch_assets_ray.stages.bulk import register_script, scripted_update

    base = pa.table(
        {"k": pa.array([1, 2, 3, 4], pa.int64()), "bal": pa.array([10.0, 20.0, 30.0, 40.0])}
    )
    upd = pa.table({"k": pa.array([2, 4], pa.int64()), "delta": pa.array([5.0, -1.0])})

    @register_script("add_delta")
    def add_delta(j: pa.Table) -> dict:
        return {"bal": pc.add(j["bal"], j["__u_delta"])}

    out = pa.concat_tables(
        list(
            scripted_update(
                ray.data.from_arrow(base).repartition(2), upd, "k", "add_delta", ["delta"]
            ).iter_batches(batch_format="pyarrow")
        )
    ).sort_by([("k", "ascending")])
    assert out["bal"].to_pylist() == [10.0, 25.0, 30.0, 39.0]
    assert out.column_names == ["k", "bal"]


# ---------------------------------------------------------------------------
# loopback HTTP transport (real sockets, stdlib http.server — no network)
# ---------------------------------------------------------------------------


@pytest.fixture()
def loopback_server():
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    state = {"fail_next": 0, "requests": [], "hang_next": 0}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            state["requests"].append(
                {"path": self.path, "auth": self.headers.get("Authorization"), "body": body}
            )
            if self.headers.get("Authorization") != "Bearer sekrit":
                self.send_response(401)
                self.end_headers()
                return
            if state["fail_next"] > 0:
                state["fail_next"] -= 1
                self.send_response(503)
                self.end_headers()
                return
            if state["hang_next"] > 0:
                state["hang_next"] -= 1
                import time

                time.sleep(0.5)  # longer than the client timeout
            if self.path.endswith("/_count"):
                out = {"count": 42}
            else:
                out = {"results": [{"id": 1, "q": body["q"]}, {"id": 2, "q": body["q"]}]}
            payload = json.dumps(out).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", state
    srv.shutdown()


def _cfg(endpoint, **kw):
    from elasticsearch_assets_ray.sources.spaces import SpacesAPIConfig

    base = dict(endpoint=endpoint, token="sekrit", index="idx", retry=3, timeout_ms=200)
    base.update(kw)
    return SpacesAPIConfig(**base)


def test_http_transport_fetch_and_count(loopback_server):
    from elasticsearch_assets_ray.sources.reader_api import ReaderSlice
    from elasticsearch_assets_ray.sources.spaces import HttpTransport, SpacesReaderAPI

    endpoint, state = loopback_server
    tr = HttpTransport(backoff_s=0.001)
    api = SpacesReaderAPI(_cfg(endpoint), transport=tr)
    s = ReaderSlice(keys=("ab",), keys_exact=False)
    t = api.fetch(s)
    assert t.num_rows == 2
    # the xLucene translation went over the wire
    assert state["requests"][-1]["body"]["q"] == "key:ab*"
    assert state["requests"][-1]["path"] == "/idx/_search"
    assert api.count(s) == 42
    assert state["requests"][-1]["path"] == "/idx/_count"
    assert api.records_fetched == 2


def test_http_transport_retries_on_5xx(loopback_server):
    from elasticsearch_assets_ray.sources.reader_api import ReaderSlice
    from elasticsearch_assets_ray.sources.spaces import HttpTransport, SpacesReaderAPI

    endpoint, state = loopback_server
    state["fail_next"] = 2  # two 503s, then success
    tr = HttpTransport(backoff_s=0.001)
    api = SpacesReaderAPI(_cfg(endpoint), transport=tr)
    t = api.fetch(ReaderSlice(query="spark"))
    assert t.num_rows == 2
    assert tr.retries == 2
    assert tr.requests_sent == 3


def test_http_transport_exhausts_retries(loopback_server):
    import urllib.error

    from elasticsearch_assets_ray.sources.reader_api import ReaderSlice
    from elasticsearch_assets_ray.sources.spaces import HttpTransport, SpacesReaderAPI

    endpoint, state = loopback_server
    state["fail_next"] = 99
    tr = HttpTransport(backoff_s=0.001)
    api = SpacesReaderAPI(_cfg(endpoint, retry=2), transport=tr)
    with pytest.raises(urllib.error.HTTPError):
        api.fetch(ReaderSlice(query="spark"))
    assert tr.requests_sent == 3  # 1 + 2 retries


def test_http_transport_bad_token_not_retried(loopback_server):
    import urllib.error

    from elasticsearch_assets_ray.sources.reader_api import ReaderSlice
    from elasticsearch_assets_ray.sources.spaces import HttpTransport, SpacesReaderAPI

    endpoint, _state = loopback_server
    tr = HttpTransport(backoff_s=0.001)
    api = SpacesReaderAPI(_cfg(endpoint, token="wrong"), transport=tr)
    with pytest.raises(urllib.error.HTTPError) as ei:
        api.fetch(ReaderSlice(query="spark"))
    assert ei.value.code == 401
    assert tr.requests_sent == 1  # auth errors are terminal


def test_http_transport_timeout_retries(loopback_server):
    from elasticsearch_assets_ray.sources.reader_api import ReaderSlice
    from elasticsearch_assets_ray.sources.spaces import HttpTransport, SpacesReaderAPI

    endpoint, state = loopback_server
    state["hang_next"] = 1  # first response sleeps past the 200 ms timeout
    tr = HttpTransport(backoff_s=0.001)
    api = SpacesReaderAPI(_cfg(endpoint), transport=tr)
    t = api.fetch(ReaderSlice(query="spark"))
    assert t.num_rows == 2
    assert tr.requests_sent >= 2
