"""ASGI app — the modern REST flavor of the server (reference:
vaex-server/vaex/server/fastapi.py:100-260).

The reference's modern server is FastAPI: REST ``/dataset``, ``/histogram``,
``/heatmap`` (+ POST variants), OpenAPI docs, and a ``/websocket`` endpoint
speaking the task protocol.  This module exposes the SAME route surface as a
dependency-free ASGI application (runnable under uvicorn/hypercorn/daphne —
none of which this image carries, so the app is also directly drivable as a
plain ``async def app(scope, receive, send)``, which is what the parity test
does).  When the real ``fastapi`` package is importable,
:func:`create_fastapi_app` builds the same surface on it.

Route parity map (reference fastapi.py line refs):
  GET  /hello                                   (104)
  GET  /                                        (109, minimal index)
  GET  /dataset                                 (125)
  GET  /dataset/{dataset_id}                    (130)
  GET  /histogram/{dataset_id}/{expression}     (160)
  POST /histogram                               (168)
  GET  /heatmap/{dataset_id}/{ex}/{ey}          (213)
  POST /heatmap                                 (226)
  GET  /openapi.json + /docs                    (FastAPI built-ins)
  WS   /websocket                               (251-259)
"""

from __future__ import annotations

import json

from .service import Service, DummyTransport


def _histogram(service, name, expression, shape=64, vmin=None, vmax=None,
               selection=None):
    df = service.dataframes[name]
    limits = [float(vmin), float(vmax)] if vmin is not None and vmax is not None else None
    limits = df.limits(expression, limits)
    counts = df.count(binby=[expression], limits=[limits], shape=shape,
                      selection=selection if selection else False)
    centers = [float(limits[0] + (limits[1] - limits[0]) * (i + 0.5) / shape)
               for i in range(shape)]
    return {"dataset_id": name, "expression": expression,
            "values": [int(c) for c in counts], "centers": centers,
            "limits": [float(limits[0]), float(limits[1])]}


def _heatmap(service, name, ex, ey, shape_x=128, shape_y=128, selection=None):
    df = service.dataframes[name]
    limits = df.limits([ex, ey], None)
    counts = df.count(binby=[ex, ey], limits=limits, shape=[shape_x, shape_y],
                      selection=selection if selection else False)

    def centers(lim, shape):
        lo, hi = float(lim[0]), float(lim[1])
        return [lo + (hi - lo) * (i + 0.5) / shape for i in range(shape)]

    return {"dataset_id": name, "expression_x": ex, "expression_y": ey,
            "values": [[int(c) for c in row] for row in counts],
            "centers_x": centers(limits[0], shape_x),
            "centers_y": centers(limits[1], shape_y),
            "limits": [list(map(float, l)) for l in limits]}


def _dataset_meta(service, name):
    df = service.dataframes[name]
    schema = {c: str(df.data_type(c).name) for c in df.get_column_names()}
    return {"id": name, "row_count": df.length_original(), "schema": schema}


def openapi_schema(service):
    """Hand-built OpenAPI 3 document for the route surface (the reference
    gets this for free from FastAPI; serving it keeps /docs functional
    without the dependency)."""
    p = {}
    p["/dataset"] = {"get": {"summary": "Lists all dataset names",
                             "responses": {"200": {"description": "names"}}}}
    p["/dataset/{dataset_id}"] = {"get": {
        "summary": "Meta information about a dataset (schema etc)",
        "parameters": [{"name": "dataset_id", "in": "path", "required": True,
                        "schema": {"type": "string"}}],
        "responses": {"200": {"description": "meta"}}}}
    hist_params = [
        {"name": "shape", "in": "query", "schema": {"type": "integer", "default": 64}},
        {"name": "min", "in": "query", "schema": {"type": "number"}},
        {"name": "max", "in": "query", "schema": {"type": "number"}},
        {"name": "filter", "in": "query", "schema": {"type": "string"}},
    ]
    p["/histogram/{dataset_id}/{expression}"] = {"get": {
        "summary": "histogram data (1d)", "tags": ["quick"],
        "parameters": [{"name": "dataset_id", "in": "path", "required": True,
                        "schema": {"type": "string"}},
                       {"name": "expression", "in": "path", "required": True,
                        "schema": {"type": "string"}}] + hist_params,
        "responses": {"200": {"description": "HistogramOutput"}}}}
    p["/histogram"] = {"post": {"summary": "histogram data (1d)", "tags": ["quick"],
                                "responses": {"200": {"description": "HistogramOutput"}}}}
    p["/heatmap/{dataset_id}/{expression_x}/{expression_y}"] = {"get": {
        "summary": "heatmap data (2d)", "tags": ["quick"],
        "parameters": [{"name": n, "in": "path", "required": True,
                        "schema": {"type": "string"}}
                       for n in ("dataset_id", "expression_x", "expression_y")],
        "responses": {"200": {"description": "HeatmapOutput"}}}}
    p["/heatmap"] = {"post": {"summary": "heatmap data (2d)", "tags": ["quick"],
                              "responses": {"200": {"description": "HeatmapOutput"}}}}
    return {"openapi": "3.0.2",
            "info": {"title": "vaex_tpu server", "version": "1.0"},
            "tags": [{"name": "quick", "description": "Quick API for common cases"}],
            "paths": p}


_DOCS_HTML = """<!DOCTYPE html><html><head><title>vaex_tpu API docs</title></head>
<body><h1>vaex_tpu server</h1>
<p>OpenAPI schema: <a href="/openapi.json">/openapi.json</a></p></body></html>"""


def create_app(service: Service):
    """Dependency-free ASGI app over a :class:`Service`."""
    transport = DummyTransport(service)

    def check_token(query, headers):
        if service.token is None:
            return True
        presented = query.get("token") or headers.get("x-token")
        return presented == service.token

    async def respond(send, status, body, content_type=b"application/json"):
        if isinstance(body, (dict, list)):
            body = json.dumps(body).encode()
        elif isinstance(body, str):
            body = body.encode()
        await send({"type": "http.response.start", "status": status,
                    "headers": [(b"content-type", content_type),
                                (b"content-length", str(len(body)).encode())]})
        await send({"type": "http.response.body", "body": body})

    async def read_body(receive):
        chunks = []
        while True:
            event = await receive()
            chunks.append(event.get("body", b""))
            if not event.get("more_body"):
                break
        return b"".join(chunks)

    async def handle_http(scope, receive, send):
        path = scope["path"].rstrip("/") or "/"
        method = scope["method"]
        query = {}
        for part in (scope.get("query_string") or b"").decode().split("&"):
            if "=" in part:
                k, _, v = part.partition("=")
                query[k] = v
        headers = {k.decode().lower(): v.decode()
                   for k, v in scope.get("headers", [])}
        if path not in ("/", "/hello", "/docs", "/openapi.json") and \
                not check_token(query, headers):
            await respond(send, 401, {"detail": "invalid or missing token"})
            return
        try:
            if path == "/hello":
                await respond(send, 200, '"hi"')
            elif path == "/":
                await respond(send, 200, _DOCS_HTML, b"text/html")
            elif path == "/docs":
                await respond(send, 200, _DOCS_HTML, b"text/html")
            elif path == "/openapi.json":
                await respond(send, 200, openapi_schema(service))
            elif path == "/dataset" and method == "GET":
                await respond(send, 200, list(service.dataframes.keys()))
            elif path.startswith("/dataset/") and method == "GET":
                name = path[len("/dataset/"):]
                if name not in service.dataframes:
                    await respond(send, 404, {"detail": f"dataset {name!r} not found"})
                    return
                await respond(send, 200, _dataset_meta(service, name))
            elif path.startswith("/histogram/") and method == "GET":
                name, _, expression = path[len("/histogram/"):].partition("/")
                if name not in service.dataframes:
                    await respond(send, 404, {"detail": f"dataset {name!r} not found"})
                    return
                out = _histogram(service, name, expression,
                                 shape=int(query.get("shape", 64)),
                                 vmin=query.get("min"), vmax=query.get("max"),
                                 selection=query.get("filter"))
                await respond(send, 200, out)
            elif path == "/histogram" and method == "POST":
                spec = json.loads(await read_body(receive) or b"{}")
                out = _histogram(service, spec["dataset_id"], spec["expression"],
                                 shape=int(spec.get("shape", 64)),
                                 vmin=spec.get("min"), vmax=spec.get("max"),
                                 selection=spec.get("filter"))
                await respond(send, 200, out)
            elif path.startswith("/heatmap/") and method == "GET":
                name, _, rest = path[len("/heatmap/"):].partition("/")
                ex, _, ey = rest.partition("/")
                if name not in service.dataframes:
                    await respond(send, 404, {"detail": f"dataset {name!r} not found"})
                    return
                out = _heatmap(service, name, ex, ey,
                               shape_x=int(query.get("shape_x", 128)),
                               shape_y=int(query.get("shape_y", 128)),
                               selection=query.get("filter"))
                await respond(send, 200, out)
            elif path == "/heatmap" and method == "POST":
                spec = json.loads(await read_body(receive) or b"{}")
                out = _heatmap(service, spec["dataset_id"], spec["expression_x"],
                               spec["expression_y"],
                               shape_x=int(spec.get("shape_x", 128)),
                               shape_y=int(spec.get("shape_y", 128)),
                               selection=spec.get("filter"))
                await respond(send, 200, out)
            else:
                await respond(send, 404, {"detail": "not found"})
        except KeyError as e:
            await respond(send, 404, {"detail": str(e)})
        except Exception as e:  # noqa: BLE001 - errors cross the wire
            await respond(send, 500, {"detail": str(e)})

    async def handle_websocket(scope, receive, send):
        # the same JSON request/response protocol the tornado flavor speaks
        # (reference fastapi.py:251-259 wraps the identical handler)
        await send({"type": "websocket.accept"})
        while True:
            event = await receive()
            if event["type"] == "websocket.disconnect":
                return
            if event["type"] != "websocket.receive":
                continue  # websocket.connect handshake event
            raw = event.get("text") or (event.get("bytes") or b"").decode()
            msg = json.loads(raw)
            reply = transport.request(msg)
            reply["msg_id"] = msg.get("msg_id")
            await send({"type": "websocket.send", "text": json.dumps(reply)})

    async def app(scope, receive, send):
        if scope["type"] == "http":
            await handle_http(scope, receive, send)
        elif scope["type"] == "websocket" and scope["path"] == "/websocket":
            await handle_websocket(scope, receive, send)
        elif scope["type"] == "lifespan":
            while True:
                event = await receive()
                if event["type"] == "lifespan.startup":
                    await send({"type": "lifespan.startup.complete"})
                elif event["type"] == "lifespan.shutdown":
                    await send({"type": "lifespan.shutdown.complete"})
                    return

    app.service = service
    return app


def create_fastapi_app(service: Service):
    """The same surface on real FastAPI when the package is installed
    (OpenAPI/docs then come from FastAPI itself)."""
    from fastapi import FastAPI, HTTPException

    app = FastAPI(title="vaex_tpu server")

    @app.get("/hello", include_in_schema=False)
    async def hello():
        return "hi"

    @app.get("/dataset", summary="Lists all dataset names")
    async def dataset_list():
        return list(service.dataframes.keys())

    @app.get("/dataset/{dataset_id}", summary="Meta information about a dataset")
    async def dataset_meta(dataset_id: str):
        if dataset_id not in service.dataframes:
            raise HTTPException(status_code=404,
                                detail=f"dataset {dataset_id!r} not found")
        return _dataset_meta(service, dataset_id)

    @app.get("/histogram/{dataset_id}/{expression}", tags=["quick"],
             summary="histogram data (1d)")
    async def histogram(dataset_id: str, expression: str, shape: int = 64,
                        min: float = None, max: float = None,
                        filter: str = None):
        if dataset_id not in service.dataframes:
            raise HTTPException(status_code=404,
                                detail=f"dataset {dataset_id!r} not found")
        return _histogram(service, dataset_id, expression, shape, min, max, filter)

    @app.get("/heatmap/{dataset_id}/{expression_x}/{expression_y}",
             tags=["quick"], summary="heatmap data (2d)")
    async def heatmap(dataset_id: str, expression_x: str, expression_y: str,
                      shape_x: int = 128, shape_y: int = 128,
                      filter: str = None):
        if dataset_id not in service.dataframes:
            raise HTTPException(status_code=404,
                                detail=f"dataset {dataset_id!r} not found")
        return _heatmap(service, dataset_id, expression_x, expression_y,
                        shape_x, shape_y, filter)

    return app


def serve(dataframes, host="0.0.0.0", port=9000, trusted=False, token=None,
          token_trusted=None):
    """Run the ASGI app under uvicorn (when installed)."""
    service = Service(dataframes, trusted=trusted, token=token,
                      token_trusted=token_trusted)
    app = create_app(service)
    import uvicorn
    uvicorn.run(app, host=host, port=port)
