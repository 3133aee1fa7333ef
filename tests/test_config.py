"""Config system: _base_ inheritance, deep merge, _delete_, CLI overrides."""

import textwrap

import pytest

from probpose_code_tpu.config import Config, parse_cfg_option
from probpose_code_tpu.registry import Registry


def _write(tmp_path, name, content):
    p = tmp_path / name
    p.write_text(textwrap.dedent(content))
    return p


def test_base_inheritance_and_merge(tmp_path):
    _write(
        tmp_path,
        "base.py",
        """
        model = dict(type="TopdownPoseEstimator", head=dict(type="HeatmapHead", out_channels=17))
        train_cfg = dict(max_epochs=210)
        """,
    )
    child = _write(
        tmp_path,
        "child.py",
        """
        _base_ = ["base.py"]
        model = dict(head=dict(out_channels=133))
        extra = [1, 2, 3]
        """,
    )
    cfg = Config.fromfile(child)
    assert cfg.model.type == "TopdownPoseEstimator"
    assert cfg.model.head.type == "HeatmapHead"
    assert cfg.model.head.out_channels == 133
    assert cfg.train_cfg.max_epochs == 210
    assert cfg.extra == [1, 2, 3]


def test_delete_key(tmp_path):
    _write(tmp_path, "base.py", "opt = dict(type='AdamW', lr=1e-3, weight_decay=0.1)\n")
    child = _write(
        tmp_path,
        "child.py",
        """
        _base_ = ["base.py"]
        opt = dict(_delete_=True, type="SGD", lr=0.01)
        """,
    )
    cfg = Config.fromfile(child)
    assert cfg.opt == {"type": "SGD", "lr": 0.01}
    assert "weight_decay" not in cfg.opt


def test_cli_override():
    cfg = Config.fromdict(dict(model=dict(head=dict(sigma=2.0)), lr=1e-3))
    key, value = parse_cfg_option("model.head.sigma=3.5")
    cfg.merge_from_dict({key: value})
    assert cfg.model.head.sigma == 3.5
    cfg.merge_from_dict({"new.nested.key": "x"})
    assert cfg.new.nested.key == "x"


def test_registry_build():
    reg = Registry("test")

    @reg.register_module()
    class Foo:
        def __init__(self, a, b=2):
            self.a, self.b = a, b

    obj = reg.build(dict(type="Foo", a=1))
    assert (obj.a, obj.b) == (1, 2)
    with pytest.raises(KeyError):
        reg.build(dict(type="Bar"))
    # duplicate registration guard
    with pytest.raises(KeyError):
        @reg.register_module(name="Foo")
        class Foo2:
            pass
