"""Tornado websocket + REST server (reference: vaex-server/tornado_server.py,
fastapi.py REST /histogram /heatmap endpoints; websocket.py protocol with
auth tokens and streamed {progress: f} messages)."""

from __future__ import annotations

import concurrent.futures
import json

try:
    import tornado.ioloop
    import tornado.web
    import tornado.websocket
except ImportError:  # pragma: no cover
    tornado = None

from .service import Service, DummyTransport, encode_result


class WebSocketHandler(tornado.websocket.WebSocketHandler if tornado else object):
    """Runs requests on a worker pool so the IO loop stays free to stream
    throttled ``{"msg_id": ..., "progress": f}`` frames mid-computation
    (reference websocket.py:60-78)."""

    def initialize(self, transport=None, pool=None):
        self.transport = transport
        self.pool = pool

    def on_message(self, message):
        msg = json.loads(message)
        msg_id = msg.get("msg_id")
        loop = tornado.ioloop.IOLoop.current()

        def on_progress(fraction):
            loop.add_callback(self._send, {"msg_id": msg_id, "progress": fraction})
            return True

        def work():
            reply = self.transport.request(msg, on_progress=on_progress)
            reply["msg_id"] = msg_id
            loop.add_callback(self._send, reply)

        self.pool.submit(work)

    def _send(self, payload):
        try:
            self.write_message(json.dumps(payload))
        except tornado.websocket.WebSocketClosedError:  # client went away
            pass


class _ServiceHandler(tornado.web.RequestHandler if tornado else object):
    def initialize(self, service=None):
        self.service = service

    def prepare(self):
        # REST endpoints accept the token as a query argument or header
        if getattr(self.service, "token", None) is not None:
            presented = self.get_argument("token", None) or self.request.headers.get("X-Token")
            if presented != self.service.token:
                raise tornado.web.HTTPError(401, "invalid or missing token")


class ListHandler(_ServiceHandler):
    def get(self):
        self.write(json.dumps(self.service.list_dataframes()))


class HistogramHandler(_ServiceHandler):
    """GET /histogram/<df>?expression=x&shape=64[&min=..&max=..]
    (reference fastapi.py /histogram)"""

    def get(self, name):
        expression = self.get_argument("expression")
        shape = int(self.get_argument("shape", "64"))
        vmin = self.get_argument("min", None)
        vmax = self.get_argument("max", None)
        df = self.service.dataframes[name]
        limits = [float(vmin), float(vmax)] if vmin is not None and vmax is not None else None
        limits = df.limits(expression, limits)
        counts = df.count(binby=[expression], limits=[limits], shape=shape)
        centers = [limits[0] + (limits[1] - limits[0]) * (i + 0.5) / shape for i in range(shape)]
        self.write(json.dumps({"centers": centers, "counts": [int(c) for c in counts],
                               "limits": [float(limits[0]), float(limits[1])]}))


class HeatmapHandler(_ServiceHandler):
    """GET /heatmap/<df>?expression_x=x&expression_y=y&shape=64"""

    def get(self, name):
        ex = self.get_argument("expression_x")
        ey = self.get_argument("expression_y")
        shape = int(self.get_argument("shape", "64"))
        df = self.service.dataframes[name]
        limits = df.limits([ex, ey], None)
        counts = df.count(binby=[ex, ey], limits=limits, shape=shape)
        self.write(json.dumps({"counts": [[int(c) for c in row] for row in counts],
                               "limits": [list(map(float, l)) for l in limits]}))


def make_app(service: Service, pool=None):
    transport = DummyTransport(service)
    # one worker: computation requests serialize (one executor pass at a
    # time, like the reference's AsyncThreadedService default) while the IO
    # loop keeps streaming progress
    pool = pool or concurrent.futures.ThreadPoolExecutor(max_workers=1)
    return tornado.web.Application([
        (r"/websocket", WebSocketHandler, {"transport": transport, "pool": pool}),
        (r"/dataset", ListHandler, {"service": service}),
        (r"/histogram/([^/]+)", HistogramHandler, {"service": service}),
        (r"/heatmap/([^/]+)", HeatmapHandler, {"service": service}),
    ])


def serve(dataframes, port=9000, trusted=False, token=None, token_trusted=None):
    """Blocking server entry (reference vaex-server __main__)."""
    assert tornado is not None, "tornado required for the server"
    service = Service(dataframes, trusted=trusted, token=token, token_trusted=token_trusted)
    app = make_app(service)
    app.listen(port)
    tornado.ioloop.IOLoop.current().start()
