"""Remote dataframe tests via in-process transport + a real tornado server
(reference tests/common.py:63-145 webserver fixtures + dummy_client)."""

import json

import numpy as np
import numpy.testing as npt
import pytest

import vaex_tpu as vt
from vaex_tpu.server.client import Client
from vaex_tpu.server.service import Service, DummyTransport

X = np.arange(10, dtype="f8")


@pytest.fixture
def remote_df():
    df = vt.from_arrays(x=X.copy(), y=X ** 2, g=np.arange(10, dtype="i8") % 3)
    service = Service({"test": df})
    client = Client(DummyTransport(service))
    return client["test"]


def test_list(remote_df):
    assert remote_df.column_names == ["x", "y", "g"]
    assert len(remote_df) == 10


def test_remote_stats(remote_df):
    assert remote_df.count() == 10
    assert remote_df.sum("x") == X.sum()
    npt.assert_allclose(remote_df.mean("y"), (X ** 2).mean())
    npt.assert_array_equal(remote_df.minmax("x"), [0, 9])


def test_remote_binby(remote_df):
    counts = remote_df.count(binby=["x"], limits=[[0, 10]], shape=5)
    npt.assert_array_equal(counts, [2, 2, 2, 2, 2])


def test_remote_virtual_column(remote_df):
    remote_df["v"] = remote_df.x * 2
    assert remote_df.sum("v") == 2 * X.sum()


def test_remote_selection(remote_df):
    assert remote_df.count(selection="x > 4") == 5


def test_remote_filter(remote_df):
    dff = remote_df.filter("x > 4")
    assert len(dff) == 5
    assert dff.sum("x") == X[X > 4].sum()


def test_remote_evaluate(remote_df):
    values = remote_df.evaluate("x * 2")
    npt.assert_allclose(np.asarray(values), X * 2)


def test_remote_unique(remote_df):
    assert set(remote_df.unique("g", array_type="numpy").tolist()) == {0, 1, 2}


def test_remote_huge_virtual_range():
    # "1e9-row server tests are free" (reference tests/common.py:111-115)
    df = vt.vrange(0, 1_000_000_000)
    df._tile_rows = 1 << 22
    service = Service({"huge": df})
    client = Client(DummyTransport(service))
    dfr = client["huge"]
    assert len(dfr) == 1_000_000_000


def test_remote_method_not_allowed(remote_df):
    with pytest.raises(RuntimeError):
        remote_df._rmi("state_set", {})


def test_real_tornado_server():
    tornado = pytest.importorskip("tornado")
    import asyncio
    import json
    import threading
    import time

    from vaex_tpu.server.tornado_server import make_app

    df = vt.from_arrays(x=X.copy())
    service = Service({"test": df})
    port = 19876
    started = threading.Event()
    loop_holder = {}

    def run():
        asyncio.set_event_loop(asyncio.new_event_loop())
        app = make_app(service)
        app.listen(port)
        loop_holder["loop"] = tornado.ioloop.IOLoop.current()
        started.set()
        loop_holder["loop"].start()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    started.wait(5)
    time.sleep(0.2)
    try:
        from vaex_tpu.server import connect
        client = connect(f"ws://localhost:{port}/websocket")
        dfr = client["test"]
        assert dfr.sum("x") == X.sum()
        client.close()
        # REST histogram endpoint
        import urllib.request
        with urllib.request.urlopen(
                f"http://localhost:{port}/histogram/test?expression=x&shape=5&min=0&max=10") as r:
            payload = json.loads(r.read())
        assert payload["counts"] == [2, 2, 2, 2, 2]
    finally:
        loop_holder["loop"].add_callback(loop_holder["loop"].stop)


def test_remote_groupby(remote_df):
    # g = arange(10) % 3 -> groups {0: x=0,3,6,9}, {1: x=1,4,7}, {2: x=2,5,8}
    out = remote_df.groupby("g", agg={"s": ("sum", "x"), "c": "count"})
    npt.assert_array_equal(out["g"], [0, 1, 2])
    npt.assert_allclose(out["s"], [18.0, 12.0, 15.0])
    npt.assert_array_equal(out["c"], [4, 3, 3])


def test_auth_tokens():
    df = vt.from_arrays(x=X.copy())
    service = Service({"test": df}, token="secret")
    # wrong/missing token -> every call errors
    bad = DummyTransport(service)
    reply = bad.request({"command": "list"})
    assert "error" in reply and "token" in reply["error"]
    with pytest.raises(RuntimeError):
        Client(DummyTransport(service))
    # correct token works
    client = Client(DummyTransport(service), token="secret")
    assert client["test"].sum("x") == X.sum()


def test_auth_token_trusted_unlocks_functions():
    import pickle  # noqa: F401
    df = vt.from_arrays(x=X.copy())
    service = Service({"test": df}, token="secret", token_trusted="supersecret")
    client = Client(DummyTransport(service), token="secret")
    dfr = client["test"]
    assert dfr.count() == 10  # plain calls fine without trusted

    # a state carrying a pickled function: untrusted client -> rejected
    local = vt.from_arrays(x=X.copy())
    local.add_function("f", lambda x: x * 3)
    local["v"] = "f(x)"
    state = local.state_get()
    with pytest.raises(RuntimeError):
        client._call("test", "sum", ("v",), state=state)
    trusted_client = Client(DummyTransport(service), token_trusted="supersecret")
    assert trusted_client._call("test", "sum", ("v",), state=state) == 3 * X.sum()


def test_progress_streaming_dummy():
    df = vt.from_arrays(x=np.arange(100, dtype="f8"))
    df._tile_rows = 16  # several tiles -> several progress ticks
    service = Service({"test": df})
    fractions = []
    client = Client(DummyTransport(service), on_progress=fractions.append)
    from vaex_tpu import cache
    with cache.off():
        assert client["test"].sum("x") == np.arange(100).sum()
    assert fractions and fractions[-1] == 1.0


def test_progress_streaming_websocket():
    tornado = pytest.importorskip("tornado")
    import asyncio
    import threading
    import time

    from vaex_tpu.server.tornado_server import make_app

    df = vt.from_arrays(x=np.arange(100, dtype="f8"))
    df._tile_rows = 16
    service = Service({"test": df})
    port = 19877
    started = threading.Event()
    loop_holder = {}

    def run():
        asyncio.set_event_loop(asyncio.new_event_loop())
        app = make_app(service)
        app.listen(port)
        loop_holder["loop"] = tornado.ioloop.IOLoop.current()
        started.set()
        loop_holder["loop"].start()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    started.wait(5)
    time.sleep(0.2)
    fractions = []
    try:
        from vaex_tpu.server import connect
        from vaex_tpu import cache
        client = connect(f"ws://localhost:{port}", on_progress=fractions.append)
        with cache.off():
            assert client["test"].sum("x") == np.arange(100).sum()
        client.close()
    finally:
        loop_holder["loop"].add_callback(loop_holder["loop"].stop)
    assert fractions and fractions[-1] == 1.0


def _drive_asgi_http(app, method, path, query="", body=None):
    """Drive the ASGI app directly (no server; the image has no ASGI host).
    Returns (status, parsed-json-or-text)."""
    import asyncio
    import json as _json

    scope = {"type": "http", "method": method, "path": path,
             "query_string": query.encode(), "headers": []}
    incoming = [{"type": "http.request", "body": body or b"", "more_body": False}]
    sent = []

    async def receive():
        return incoming.pop(0)

    async def send(event):
        sent.append(event)

    asyncio.new_event_loop().run_until_complete(app(scope, receive, send))
    status = sent[0]["status"]
    raw = b"".join(e.get("body", b"") for e in sent[1:])
    try:
        return status, json.loads(raw)
    except ValueError:
        return status, raw.decode()


def test_asgi_rest_parity():
    """The ASGI (FastAPI-flavor) app answers the reference's REST surface
    (fastapi.py:100-260): /dataset, /dataset/{id}, /histogram (GET+POST),
    /heatmap, /openapi.json."""
    from vaex_tpu.server.asgi import create_app

    rng = np.random.default_rng(3)
    x = rng.random(1000)
    y = rng.random(1000)
    df = vt.from_arrays(x=x, y=y)
    app = create_app(Service({"test": df}))

    status, names = _drive_asgi_http(app, "GET", "/dataset")
    assert status == 200 and names == ["test"]

    status, meta = _drive_asgi_http(app, "GET", "/dataset/test")
    assert status == 200
    assert meta["row_count"] == 1000 and set(meta["schema"]) == {"x", "y"}

    status, h = _drive_asgi_http(app, "GET", "/histogram/test/x", "shape=16")
    assert status == 200
    assert len(h["values"]) == 16 and len(h["centers"]) == 16
    # the row AT vmax lands in the (stripped) overflow edge bin — the
    # reference's binning convention (superagg_binners.cpp:42-52)
    assert sum(h["values"]) == 999

    status, h2 = _drive_asgi_http(
        app, "POST", "/histogram",
        body=json.dumps({"dataset_id": "test", "expression": "x",
                         "shape": 16}).encode())
    assert status == 200 and h2["values"] == h["values"]

    status, hm = _drive_asgi_http(app, "GET", "/heatmap/test/x/y",
                                  "shape_x=8&shape_y=8")
    assert status == 200
    assert len(hm["values"]) == 8 and len(hm["values"][0]) == 8
    assert sum(sum(r) for r in hm["values"]) >= 998  # max-edge rows overflow

    status, schema = _drive_asgi_http(app, "GET", "/openapi.json")
    assert status == 200
    assert "/histogram/{dataset_id}/{expression}" in schema["paths"]

    status, _ = _drive_asgi_http(app, "GET", "/dataset/nope")
    assert status == 404


def test_asgi_token_auth():
    df = vt.from_arrays(x=np.arange(10.0))
    from vaex_tpu.server.asgi import create_app
    app = create_app(Service({"test": df}, token="secret"))
    status, _ = _drive_asgi_http(app, "GET", "/dataset")
    assert status == 401
    status, names = _drive_asgi_http(app, "GET", "/dataset", "token=secret")
    assert status == 200 and names == ["test"]


def test_asgi_websocket_protocol():
    """The /websocket endpoint speaks the same JSON protocol as the tornado
    flavor (one request -> one reply tagged with msg_id)."""
    import asyncio
    from vaex_tpu.server.asgi import create_app

    df = vt.from_arrays(x=np.arange(100.0))
    app = create_app(Service({"test": df}))

    incoming = [
        {"type": "websocket.connect"},
        {"type": "websocket.receive",
         "text": json.dumps({"msg_id": "1", "command": "list"})},
        {"type": "websocket.receive",
         "text": json.dumps({"msg_id": "2", "command": "call", "df": "test",
                             "method": "sum",
                             "args": {"kind": "list", "items": [
                                 {"kind": "json", "value": "x"}]}})},
        {"type": "websocket.disconnect"},
    ]
    sent = []

    async def receive():
        return incoming.pop(0)

    async def send(event):
        sent.append(event)

    scope = {"type": "websocket", "path": "/websocket", "headers": []}
    asyncio.new_event_loop().run_until_complete(app(scope, receive, send))
    assert sent[0]["type"] == "websocket.accept"
    replies = [json.loads(e["text"]) for e in sent[1:]]
    from vaex_tpu.server.service import decode_result
    assert replies[0]["msg_id"] == "1"
    assert "test" in decode_result(replies[0]["result"])
    assert decode_result(replies[1]["result"]) == pytest.approx(np.arange(100.0).sum())
