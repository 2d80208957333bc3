"""pp-op registry and pp-string language."""

import numpy as np
import pytest

from clipa_tpu.registry import (InKeyOutKey, Registry, get_preprocess_fn,
                                parse_name)


def test_parse_name():
    assert parse_name("decode") == ("decode", (), {})
    assert parse_name("resize(64)") == ("resize", (64,), {})
    assert parse_name('op(1, k="v", x=2.5)') == ("op", (1,), {"k": "v", "x": 2.5})
    assert parse_name("ns.fn(True)") == ("ns.fn", (True,), {})
    with pytest.raises(ValueError):
        parse_name("not valid!")


def test_registry_roundtrip():
    @Registry.register("preprocess_ops._test_double")
    @InKeyOutKey()
    def _double():
        return lambda x: x * 2

    fn = get_preprocess_fn("_test_double")
    out = fn({"image": np.array([1, 2])})
    np.testing.assert_array_equal(out["image"], [2, 4])


def test_inkey_outkey():
    @Registry.register("preprocess_ops._test_incr")
    @InKeyOutKey(indefault="a", outdefault="b")
    def _incr(amount=1):
        return lambda x: x + amount

    fn = get_preprocess_fn('_test_incr(amount=10, inkey="x", outkey="y")')
    out = fn({"x": 5})
    assert out["y"] == 15 and out["x"] == 5

    # `key` sets both in and out.
    fn2 = get_preprocess_fn('_test_incr(key="z")')
    assert fn2({"z": 1})["z"] == 2


def test_pipe_composition():
    @Registry.register("preprocess_ops._test_a")
    @InKeyOutKey(indefault="v", outdefault="v")
    def _a():
        return lambda x: x + 1

    @Registry.register("preprocess_ops._test_b")
    @InKeyOutKey(indefault="v", outdefault="v")
    def _b(mult):
        return lambda x: x * mult

    fn = get_preprocess_fn("_test_a|_test_b(3)|")
    assert fn({"v": 1})["v"] == 6


def test_temporary_ops():
    with Registry.temporary_ops(_tmp_op=lambda: lambda d: {**d, "t": 1}):
        fn = get_preprocess_fn("_tmp_op")
        assert fn({})["t"] == 1
    assert not Registry.knows("preprocess_ops._tmp_op")


def test_unknown_op_raises():
    with pytest.raises(KeyError):
        get_preprocess_fn("_definitely_not_registered")
