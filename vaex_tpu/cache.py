"""Task-result cache keyed by content fingerprints.

Re-design of the reference's ``vaex/cache.py`` (456 LoC): keys are
``f'{task_fingerprint}-{df_fingerprint}'`` (reference execution.py:96-109).

Backends (reference cache.py:155-269): in-memory dict (default), bounded
LRU memory, disk (pickle files under ``~/.vaex_tpu/cache`` with size-capped
LRU eviction — no third-party ``diskcache`` dependency), redis (when the
client library is installed), and a memory-over-disk multilevel stack.

Configure with ``VAEX_TPU_CACHE`` ('memory' | 'memory_infinite' | 'disk' |
'memory,disk' | 'redis' | 'disabled'), ``VAEX_TPU_CACHE_DISK_PATH`` and
``VAEX_TPU_CACHE_DISK_SIZE_LIMIT`` / ``VAEX_TPU_CACHE_MEMORY_SIZE_LIMIT``,
or the :func:`memory_infinite` / :func:`disk` / :func:`off` context managers.
"""

from __future__ import annotations

import contextlib
import hashlib
import os
import pickle
import threading

from . import settings
from .utils import fingerprint  # noqa: F401  (public API parity: vaex.cache.fingerprint)

_lock = threading.Lock()
hits = 0
misses = 0


class MemoryCache:
    """Unbounded dict cache (reference: memory_infinite)."""

    def __init__(self):
        self._data = {}

    def get(self, key):
        return self._data.get(key)

    def set(self, key, value):
        self._data[key] = value

    def clear(self):
        self._data.clear()

    def __len__(self):
        return len(self._data)


class MemoryCacheLRU(MemoryCache):
    """Byte-bounded LRU (reference: memory with size limit)."""

    def __init__(self, size_limit=1 << 30):
        super().__init__()
        self.size_limit = size_limit
        self._sizes = {}
        self._total = 0

    @staticmethod
    def _sizeof(value):
        import numpy as np
        try:
            import jax.tree_util as jtu
            leaves = jtu.tree_leaves(value)
            return sum(getattr(v, "nbytes", 64) if isinstance(v, np.ndarray) or hasattr(v, "nbytes")
                       else 64 for v in leaves)
        except Exception:
            return 1024

    def get(self, key):
        value = self._data.get(key)
        if value is not None:  # refresh LRU order
            self._data.pop(key)
            self._data[key] = value
        return value

    def set(self, key, value):
        size = self._sizeof(value)
        if key in self._data:
            self._total -= self._sizes.get(key, 0)
            self._data.pop(key)
        self._data[key] = value
        self._sizes[key] = size
        self._total += size
        while self._total > self.size_limit and len(self._data) > 1:
            old_key = next(iter(self._data))
            self._data.pop(old_key)
            self._total -= self._sizes.pop(old_key, 0)

    def clear(self):
        super().clear()
        self._sizes.clear()
        self._total = 0


class DiskCache:
    """Pickle-file cache with size-capped LRU eviction (reference relies on
    the ``diskcache`` package, cache.py:198-226; this image has none, so the
    store is plain files: <sha256(key)>.pkl, access time = LRU order).

    Survives process restarts — with content fingerprints as keys this
    doubles as computation resume (SURVEY §5 checkpoint/caches)."""

    def __init__(self, path=None, size_limit=None):
        self.path = os.path.expanduser(path or settings.CACHE_DISK_PATH)
        self.size_limit = size_limit or settings.CACHE_DISK_SIZE_LIMIT
        os.makedirs(self.path, exist_ok=True)

    def _file(self, key):
        h = hashlib.sha256(str(key).encode()).hexdigest()
        return os.path.join(self.path, f"{h}.pkl")

    def get(self, key):
        f = self._file(key)
        try:
            with open(f, "rb") as fh:
                value = pickle.load(fh)
            os.utime(f)  # LRU touch
            return value
        except (OSError, pickle.PickleError, EOFError, AttributeError):
            return None

    def set(self, key, value):
        f = self._file(key)
        tmp = f + f".tmp{os.getpid()}"
        try:
            with open(tmp, "wb") as fh:
                pickle.dump(value, fh, protocol=pickle.HIGHEST_PROTOCOL)
            os.replace(tmp, f)  # atomic: concurrent readers never see partials
        except (OSError, pickle.PickleError, TypeError):
            with contextlib.suppress(OSError):
                os.unlink(tmp)
            return
        self._evict()

    def _evict(self):
        try:
            entries = []
            total = 0
            with os.scandir(self.path) as it:
                for e in it:
                    if e.name.endswith(".pkl"):
                        st = e.stat()
                        entries.append((st.st_atime, st.st_size, e.path))
                        total += st.st_size
            if total <= self.size_limit:
                return
            for _, size, p in sorted(entries):
                with contextlib.suppress(OSError):
                    os.unlink(p)
                total -= size
                if total <= self.size_limit:
                    break
        except OSError:
            pass

    def clear(self):
        with contextlib.suppress(OSError):
            with os.scandir(self.path) as it:
                for e in it:
                    if e.name.endswith(".pkl"):
                        with contextlib.suppress(OSError):
                            os.unlink(e.path)

    def __len__(self):
        try:
            return sum(1 for e in os.scandir(self.path) if e.name.endswith(".pkl"))
        except OSError:
            return 0


class RedisCache:
    """Redis-backed cache (reference cache.py:227-249); requires the
    ``redis`` client package."""

    def __init__(self, client=None):
        if client is None:
            import redis  # gated: not in the base image
            client = redis.Redis()
        self.client = client

    def get(self, key):
        raw = self.client.get(str(key))
        return pickle.loads(raw) if raw is not None else None

    def set(self, key, value):
        try:
            self.client.set(str(key), pickle.dumps(value, protocol=pickle.HIGHEST_PROTOCOL))
        except (TypeError, pickle.PickleError):
            pass

    def clear(self):
        self.client.flushdb()


class MultilevelCache:
    """Stack of caches, fastest first (reference cache.py:251-269): misses
    fall through, hits backfill the faster levels."""

    def __init__(self, *levels):
        self.levels = list(levels)

    def get(self, key):
        for i, level in enumerate(self.levels):
            value = level.get(key)
            if value is not None:
                for upper in self.levels[:i]:
                    upper.set(key, value)
                return value
        return None

    def set(self, key, value):
        for level in self.levels:
            level.set(key, value)

    def clear(self):
        for level in self.levels:
            level.clear()


def _make_backend(spec: str):
    parts = [p.strip() for p in str(spec).split(",") if p.strip()]
    levels = []
    for p in parts:
        if p in ("memory", "memory_infinite"):
            levels.append(MemoryCache())
        elif p == "memory_lru":
            levels.append(MemoryCacheLRU(settings.CACHE_MEMORY_SIZE_LIMIT))
        elif p == "disk":
            levels.append(DiskCache())
        elif p == "redis":
            levels.append(RedisCache())
        elif p == "disabled":
            return None
        else:
            raise ValueError(f"unknown cache backend {p!r}; expected memory, "
                             "memory_lru, disk, redis or disabled")
    if not levels:
        return None
    return levels[0] if len(levels) == 1 else MultilevelCache(*levels)


_backend = _make_backend(settings.CACHE)
_enabled = _backend is not None
# device-resident results (big grids kept in HBM): byte-bounded so eviction
# releases device memory; never spilled to disk/redis (jax arrays don't
# pickle usefully across processes)
_device_backend = MemoryCacheLRU(
    size_limit=int(os.environ.get("VAEX_TPU_CACHE_DEVICE_SIZE_LIMIT", 1 << 31)))


def configure(spec: str):
    """Set the backend from a spec string (e.g. 'memory,disk')."""
    global _backend, _enabled
    with _lock:
        _backend = _make_backend(spec)
        _enabled = _backend is not None


def is_on():
    return _enabled


def lookup(key):
    global hits, misses
    if not _enabled:
        return None
    with _lock:
        value = _device_backend.get(key)
        if value is None:
            value = _backend.get(key)
    if value is None:
        misses += 1
    else:
        hits += 1
    return value


def store(key, value, device=False):
    """``device=True`` routes jax device-resident results into a separate
    byte-bounded LRU: eviction drops the array references and frees HBM —
    the unbounded default backend would pin big result grids in device
    memory forever (ADVICE r2)."""
    if not _enabled:
        return
    with _lock:
        (_device_backend if device else _backend).set(key, value)


def clear():
    with _lock:
        if _backend is not None:
            _backend.clear()
        _device_backend.clear()


@contextlib.contextmanager
def _swap(backend):
    global _backend, _enabled
    old_backend, old_enabled = _backend, _enabled
    _backend, _enabled = backend, backend is not None
    try:
        yield
    finally:
        _backend, _enabled = old_backend, old_enabled


@contextlib.contextmanager
def off():
    with _swap(None):
        yield


@contextlib.contextmanager
def memory_infinite(clear_on_exit=False):
    backend = MemoryCache()
    with _swap(backend):
        yield
    if clear_on_exit:
        backend.clear()


@contextlib.contextmanager
def memory(size_limit=None, clear_on_exit=False):
    backend = MemoryCacheLRU(size_limit or settings.CACHE_MEMORY_SIZE_LIMIT)
    with _swap(backend):
        yield
    if clear_on_exit:
        backend.clear()


@contextlib.contextmanager
def disk(path=None, size_limit=None, clear_on_exit=False):
    backend = DiskCache(path=path, size_limit=size_limit)
    with _swap(backend):
        yield
    if clear_on_exit:
        backend.clear()
