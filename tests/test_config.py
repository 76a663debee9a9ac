"""Config system: load/merge/validate + both inheritance syntaxes."""

import pytest
import yaml

from msid_tpu.utils.config import (
    coerce_scheduler_params,
    load_config,
    merge_configs,
    save_config,
    validate_config,
)


@pytest.fixture
def base_yaml(tmp_path):
    base = {
        "seed": 42,
        "data": {"root_dir": "./data", "num_bands": 13, "image_size": 192},
        "model": {"encoder": {"depth": 12}, "decoder": {"channels": [384, 192, 96, 48]}},
        "training": {"epochs": 100, "micro_batch_size": 8, "optimizer": {"lr": "1e-4"}},
    }
    p = tmp_path / "base.yaml"
    p.write_text(yaml.dump(base))
    return p


def test_load_plain(base_yaml):
    cfg = load_config(base_yaml)
    assert cfg["data"]["num_bands"] == 13
    assert validate_config(cfg)


def test_comment_inheritance(base_yaml, tmp_path):
    child = tmp_path / "exp.yaml"
    child.write_text(
        "# Inherits from: base.yaml\n" + yaml.dump({"training": {"epochs": 5}})
    )
    cfg = load_config(child)
    assert cfg["training"]["epochs"] == 5
    assert cfg["training"]["micro_batch_size"] == 8  # inherited
    assert cfg["data"]["image_size"] == 192


def test_explicit_inherits_key(base_yaml, tmp_path):
    child = tmp_path / "exp2.yaml"
    child.write_text(yaml.dump({"inherits": "base.yaml", "seed": 7}))
    cfg = load_config(child)
    assert cfg["seed"] == 7
    assert cfg["training"]["epochs"] == 100
    assert "inherits" not in cfg


def test_merge_nested_override():
    base = {"a": {"b": 1, "c": 2}, "d": 3}
    override = {"a": {"b": 10}, "e": 4}
    merged = merge_configs(base, override)
    assert merged == {"a": {"b": 10, "c": 2}, "d": 3, "e": 4}
    assert base["a"]["b"] == 1  # base untouched


def test_validate_missing_section(base_yaml):
    cfg = load_config(base_yaml)
    del cfg["training"]
    with pytest.raises(ValueError, match="training"):
        validate_config(cfg)


def test_coerce_scheduler_params():
    cfg = {
        "training": {
            "optimizer": {"lr": "1e-4", "weight_decay": "0.05", "betas": ["0.9", "0.999"]},
            "scheduler": {"T_0": "10", "T_mult": "2", "eta_min": "1e-6"},
        }
    }
    cfg = coerce_scheduler_params(cfg)
    assert cfg["training"]["optimizer"]["lr"] == 1e-4
    assert cfg["training"]["scheduler"]["T_0"] == 10
    assert cfg["training"]["scheduler"]["eta_min"] == 1e-6


def test_save_roundtrip(tmp_path):
    cfg = {"a": 1, "b": {"c": [1, 2, 3]}}
    out = tmp_path / "sub" / "cfg.yaml"
    save_config(cfg, out)
    assert yaml.safe_load(out.read_text()) == cfg


def test_repo_configs_load_and_validate():
    """The shipped configs must load, inherit, and validate."""
    from msid_tpu.utils.config import get_project_root

    root = get_project_root()
    cfg = load_config(root / "configs" / "base.yaml")
    assert validate_config(cfg)
    for exp in (root / "configs" / "experiments").glob("*.yaml"):
        c = load_config(exp)
        assert validate_config(c), exp


def test_inheritance_cycle_reports_ordered_chain(tmp_path):
    import pytest
    import yaml as _yaml

    from msid_tpu.utils.config import load_config

    a, b, c = tmp_path / "a.yaml", tmp_path / "b.yaml", tmp_path / "c.yaml"
    a.write_text(_yaml.dump({"inherits": "b.yaml"}))
    b.write_text(_yaml.dump({"inherits": "c.yaml"}))
    c.write_text(_yaml.dump({"inherits": "a.yaml"}))
    with pytest.raises(ValueError, match="cycle") as exc:
        load_config(a)
    msg = str(exc.value)
    # the chain reflects actual traversal order: a -> b -> c -> a
    assert msg.index("a.yaml") < msg.index("b.yaml") < msg.index("c.yaml")
