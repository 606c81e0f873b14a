"""expresso AST tools (reference tests/expresso_test.py, derivative_test.py)."""

import numpy as np
import pytest

import vaex_tpu as vt
from vaex_tpu import expresso


def test_validate_ok():
    expresso.validate_expression("x + sin(y) * 2", {"x", "y"}, {"sin"})


def test_validate_unknown_name():
    with pytest.raises(NameError):
        expresso.validate_expression("x + z", {"x"}, set())


def test_validate_suggests():
    with pytest.raises(NameError, match="did you mean"):
        expresso.validate_expression("xx", {"x", "y"}, set())


def test_validate_rejects_nodes():
    with pytest.raises(Exception):
        expresso.validate_expression("__import__('os')", {"x"}, set())
    with pytest.raises(Exception):
        expresso.validate_expression("[i for i in x]", {"x"}, set())
    with pytest.raises(Exception):
        expresso.validate_expression("lambda: 1", {"x"}, set())


def test_collect_names():
    assert set(expresso.collect_names("x + sin(y) * z")) == {"x", "y", "z"}


def test_translate():
    out = expresso.translate("x + y * x", lambda n: "a" if n == "x" else None)
    assert out.replace(" ", "") == "a+y*a"


def test_substitute():
    out = expresso.substitute("v + 1", {"v": "(x * 2)"})
    assert out.replace(" ", "") == "x*2+1"


def test_derivative_polynomial():
    assert expresso.derivative("x**3", "x").replace(" ", "") in ("3*x**2", "3*x**(3-1)*1", "3*x**2*1")
    # numeric check
    d = expresso.derivative("x**3 + 2*x", "x")
    f = eval("lambda x: " + d)
    assert abs(f(2.0) - (3 * 4 + 2)) < 1e-12


def test_derivative_chain():
    d = expresso.derivative("sin(x**2)", "x")
    import math
    f = eval("lambda x, cos=math.cos: " + d)
    x = 1.3
    assert abs(f(x) - math.cos(x ** 2) * 2 * x) < 1e-12


def test_simplify():
    assert expresso._simplify("x * 1 + 0").replace(" ", "") == "x"
    assert expresso._simplify("0 * y + x * 1").replace(" ", "") == "x"


import math  # noqa: E402


def test_encoding_array_roundtrip():
    from vaex_tpu import encoding
    for ar in [np.arange(5), np.ma.MaskedArray([1.0, 2.0], [True, False]),
               np.asarray(["a", None], dtype=object)]:
        spec = encoding._encode_array(ar)
        back = encoding._decode_array(spec)
        if isinstance(ar, np.ma.MaskedArray):
            assert back.tolist(None) == ar.tolist(None)
        else:
            assert list(back) == list(ar)


def test_encoding_sorted_set_roundtrip():
    from vaex_tpu import encoding
    from vaex_tpu.ops.setops import SortedSet
    s = SortedSet(np.dtype("int64"), keep_counts=True)
    s.update(np.array([3, 1, 1, 2]))
    spec = encoding._encode_variable(s)
    s2 = encoding._decode_variable(spec)
    assert s2.keys.tolist() == [1, 2, 3]
    assert s2.counts.tolist() == [2, 1, 1]
