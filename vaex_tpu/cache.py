"""Task-result cache keyed by content fingerprints.

Re-design of the reference's ``vaex/cache.py`` (456 LoC): keys are
``f'{task_fingerprint}-{df_fingerprint}'`` (reference execution.py:96-109).
Backends: in-memory dict (default) or disabled; disk/redis backends are
future work.
"""

from __future__ import annotations

import contextlib
import threading

from . import settings
from .utils import fingerprint  # noqa: F401  (public API parity: vaex.cache.fingerprint)

_lock = threading.Lock()
_cache = {}
_enabled = settings.CACHE != "disabled"
hits = 0
misses = 0


def is_on():
    return _enabled


def lookup(key):
    global hits, misses
    if not _enabled:
        return None
    with _lock:
        value = _cache.get(key)
    if value is None:
        misses += 1
    else:
        hits += 1
    return value


def store(key, value):
    if not _enabled:
        return
    with _lock:
        _cache[key] = value


def clear():
    with _lock:
        _cache.clear()


@contextlib.contextmanager
def off():
    global _enabled
    old = _enabled
    _enabled = False
    try:
        yield
    finally:
        _enabled = old


@contextlib.contextmanager
def memory_infinite(clear_on_exit=False):
    global _enabled
    old = _enabled
    _enabled = True
    try:
        yield
    finally:
        _enabled = old
        if clear_on_exit:
            clear()
