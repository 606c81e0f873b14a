"""Client/server remote DataFrames (reference: packages/vaex-server).

A tornado websocket server exposes named DataFrames; clients get a
:class:`~vaex_tpu.server.client.DataFrameRemote` mirroring the stats/
evaluate surface.  The wire protocol is JSON + base64 numpy blobs
(reference websocket.py:18-120 {msg_id, command, ...}); the client ships its
*state* (virtual columns, selections) with each call and the server rebinds
it onto the served dataset — the same state-rebinding mechanism as
df.state_set (reference service.py:12-40).
"""

from .client import Client, connect  # noqa: F401
from .service import Service  # noqa: F401
