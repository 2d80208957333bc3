"""Config system: parse_arg, ConfigDict, duration conversion."""

import pytest

from clipa_tpu.config import ConfigDict, apply_overrides, parse_arg, steps


def test_configdict_attr_access():
    c = ConfigDict()
    c.model = {"image": {"variant": "B/16"}}
    assert c.model.image.variant == "B/16"
    assert c["model"]["image"]["variant"] == "B/16"
    c.model.image.depth = 12
    assert c.model.image.depth == 12


def test_configdict_json_roundtrip():
    c = ConfigDict(a=1, b={"c": [1, 2, 3]}, d="x")
    c2 = ConfigDict.from_json(c.to_json())
    assert c2.a == 1 and c2.b.c == [1, 2, 3] and c2.d == "x"


def test_configdict_get_set_path():
    c = ConfigDict()
    c.set_path("input.batch_size", 1024)
    assert c.input.batch_size == 1024
    assert c.get_path("input.batch_size") == 1024
    assert c.get_path("no.such.key", 7) == 7


def test_parse_arg_defaults():
    a = parse_arg(None, res=84, token_len=8)
    assert a.res == 84 and a.token_len == 8


def test_parse_arg_kv():
    a = parse_arg("res=96,token_len=16", res=84, token_len=8)
    assert a.res == 96 and a.token_len == 16


def test_parse_arg_positional_single():
    a = parse_arg("96", res=84, runlocal=False)
    assert a.res == 96


def test_parse_arg_boolean_flag():
    a = parse_arg("runlocal,res=64", res=84, runlocal=False)
    assert a.runlocal is True and a.res == 64


def test_parse_arg_type_coercion():
    a = parse_arg("res=96.0,name=42", res=84, name="x")
    assert a.res == 96 and isinstance(a.res, int)
    assert a.name == "42" and isinstance(a.name, str)


def test_parse_arg_unknown_key_raises():
    with pytest.raises(KeyError):
        parse_arg("nosuch=1", res=84)


def test_steps_units():
    assert steps("total", {"total_steps": 100}) == 100
    assert steps("total", {"total_examples": 1000}, batch_size=10) == 100
    assert steps("total", {"total_epochs": 2}, data_size=500, batch_size=10) == 100
    assert steps("warmup", {"warmup_percent": 0.1}, total_steps=1000) == 100
    assert steps("warmup", {}, default=0) == 0
    with pytest.raises(ValueError):
        steps("warmup", {})
    with pytest.raises(ValueError):
        steps("x", {"x_steps": 1, "x_epochs": 1})


def test_apply_overrides():
    c = ConfigDict(input=ConfigDict(batch_size=8))
    apply_overrides(c, ["--config.input.batch_size=16", "--config.lr=0.1"])
    assert c.input.batch_size == 16 and c.lr == 0.1
