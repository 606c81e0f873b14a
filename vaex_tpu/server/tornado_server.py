"""Tornado websocket + REST server (reference: vaex-server/tornado_server.py,
fastapi.py REST /histogram /heatmap endpoints)."""

from __future__ import annotations

import json

try:
    import tornado.ioloop
    import tornado.web
    import tornado.websocket
except ImportError:  # pragma: no cover
    tornado = None

from .service import Service, DummyTransport, encode_result


class WebSocketHandler(tornado.websocket.WebSocketHandler if tornado else object):
    def initialize(self, transport=None):
        self.transport = transport

    def on_message(self, message):
        msg = json.loads(message)
        reply = self.transport.request(msg)
        reply["msg_id"] = msg.get("msg_id")
        self.write_message(json.dumps(reply))


class ListHandler(tornado.web.RequestHandler if tornado else object):
    def initialize(self, service=None):
        self.service = service

    def get(self):
        self.write(json.dumps(self.service.list_dataframes()))


class HistogramHandler(tornado.web.RequestHandler if tornado else object):
    """GET /histogram/<df>?expression=x&shape=64[&min=..&max=..]
    (reference fastapi.py /histogram)"""

    def initialize(self, service=None):
        self.service = service

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
                               "limits": limits}))


class HeatmapHandler(tornado.web.RequestHandler if tornado else object):
    """GET /heatmap/<df>?expression_x=x&expression_y=y&shape=64"""

    def initialize(self, service=None):
        self.service = service

    def get(self, name):
        ex = self.get_argument("expression_x")
        ey = self.get_argument("expression_y")
        shape = int(self.get_argument("shape", "64"))
        df = self.service.dataframes[name]
        limits = df.limits([ex, ey], None)
        counts = df.count(binby=[ex, ey], limits=limits, shape=shape)
        self.write(json.dumps({"counts": [[int(c) for c in row] for row in counts],
                               "limits": [list(map(float, l)) for l in limits]}))


def make_app(service: Service):
    transport = DummyTransport(service)
    return tornado.web.Application([
        (r"/websocket", WebSocketHandler, {"transport": transport}),
        (r"/dataset", ListHandler, {"service": service}),
        (r"/histogram/([^/]+)", HistogramHandler, {"service": service}),
        (r"/heatmap/([^/]+)", HeatmapHandler, {"service": service}),
    ])


def serve(dataframes, port=9000, trusted=False):
    """Blocking server entry (reference vaex-server __main__)."""
    assert tornado is not None, "tornado required for the server"
    service = Service(dataframes, trusted=trusted)
    app = make_app(service)
    app.listen(port)
    tornado.ioloop.IOLoop.current().start()
