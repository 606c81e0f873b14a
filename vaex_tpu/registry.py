"""Function registry for the expression engine.

Re-design of the reference's ``vaex/registry.py`` (101 LoC).  Every name
callable inside an expression string lives in one of two namespaces:

* ``expression_namespace`` — *device* implementations: functions of
  :class:`vaex_tpu.ops.nullable.NA` values executed at trace time, becoming
  part of the single compiled XLA program for a pass.
* ``expression_namespace_host`` — *host* implementations: numpy/pyarrow
  functions executed per chunk on the CPU.  Expressions containing names that
  exist only here are split by the executor: the host subtree is evaluated in
  the chunk pipeline and its result is shipped to the device as an extra
  input column (strings ride as dictionary codes).

``register_function`` also installs the function as a method on
:class:`vaex_tpu.expression.Expression` (optionally under a scope accessor
like ``.str`` / ``.dt``), mirroring the reference API.
"""

from __future__ import annotations

import functools

expression_namespace = {}        # name -> device impl (NA args -> NA)
expression_namespace_host = {}   # name -> host impl (numpy/arrow args -> array)

scopes = {
    "str": "str_",
    "str_pandas": "str_",
    "dt": "dt_",
    "td": "td_",
}

_expression_methods = []  # deferred (Expression class may not exist yet)


def register_function(scope=None, as_property=False, name=None, on_expression=True,
                      device=None, host=None, df_accessor=None):
    """Register ``device`` and/or ``host`` implementations under one name.

    Usage mirrors the reference (registry.py:18-100)::

        @register_function()
        def my_op(x): ...              # decorated fn is the device impl

        register_function(name='str_len', host=some_arrow_fn)
    """
    prefix = scopes.get(scope, "") if scope else ""

    def wrapper(f=None):
        fname = name or (f.__name__ if f is not None else None)
        assert fname is not None
        full_name = fname if fname.startswith(prefix) else prefix + fname
        dev = device if device is not None else f
        if dev is not None:
            expression_namespace[full_name] = dev
        if host is not None:
            expression_namespace_host[full_name] = host
        if on_expression:
            _expression_methods.append((scope, fname, full_name, as_property))
            _try_install(scope, fname, full_name, as_property)
        return f if f is not None else dev

    return wrapper


def has_function(name: str) -> bool:
    return name in expression_namespace or name in expression_namespace_host


def is_device_function(name: str) -> bool:
    return name in expression_namespace


def function_names():
    return set(expression_namespace) | set(expression_namespace_host)


def _try_install(scope, short_name, full_name, as_property):
    try:
        from . import expression as _expr_mod
    except ImportError:
        return
    Expression = getattr(_expr_mod, "Expression", None)
    if Expression is None:
        return

    def make_method(full_name):
        def method(self, *args, **kwargs):
            return self._call_function(full_name, *args, **kwargs)
        method.__name__ = short_name
        return method

    m = make_method(full_name)
    if scope:
        accessor_cls = _expr_mod.get_scope_accessor(scope)
        setattr(accessor_cls, short_name, property(lambda acc, m=m: m(acc.expression)) if as_property
                else (lambda acc, *a, _m=m, **kw: _m(acc.expression, *a, **kw)))
    else:
        setattr(Expression, short_name, property(m) if as_property else m)


def install_all_on_expression():
    """Called once by expression.py after the Expression class exists."""
    for scope, short_name, full_name, as_property in _expression_methods:
        _try_install(scope, short_name, full_name, as_property)
