import pytest

from sonicdiffusionbayeslab_tpu.config import ConfigError, ConfigNode, load_config, validate_config
from sonicdiffusionbayeslab_tpu.utils.class_registry import ClassRegistry, RegistryError


def test_register_and_lookup():
    reg = ClassRegistry("r")

    @reg.add_to_registry("foo")
    class Foo:
        def __init__(self, a, b=2):
            self.a, self.b = a, b

    assert reg["foo"] is Foo
    assert "foo" in reg
    obj = reg.build("foo", a=1)
    assert (obj.a, obj.b) == (1, 2)


def test_unknown_name_lists_registered():
    reg = ClassRegistry("r")
    with pytest.raises(RegistryError, match="unknown name"):
        reg["nope"]


def test_duplicate_registration_rejected():
    reg = ClassRegistry("r")

    @reg.add_to_registry("x")
    class A:
        pass

    with pytest.raises(RegistryError):

        @reg.add_to_registry("x")
        class B:
            pass


def test_validate_kwargs_unknown_and_missing():
    reg = ClassRegistry("r")

    @reg.add_to_registry("foo")
    class Foo:
        def __init__(self, a, b=2):
            pass

    with pytest.raises(TypeError, match="unknown config keys"):
        reg.validate_kwargs("foo", {"a": 1, "zz": 3})
    with pytest.raises(TypeError, match="missing required"):
        reg.validate_kwargs("foo", {"b": 1})
    reg.validate_kwargs("foo", {"a": 1})


def test_var_kwargs_signature_is_open():
    reg = ClassRegistry("r")

    @reg.add_to_registry("open")
    class Open:
        def __init__(self, a=1, **kw):
            pass

    reg.validate_kwargs("open", {"anything": 1})


def test_config_node_access():
    cfg = ConfigNode({"a": {"b": 3}, "c": [1, 2]})
    assert cfg.a.b == 3
    assert cfg["a"]["b"] == 3
    assert cfg.get("missing", 7) == 7
    assert cfg.a.get("b") == 3
    with pytest.raises(AttributeError):
        cfg.nope
    with pytest.raises(TypeError):
        cfg.a = 1


def test_validate_config_sections():
    good = ConfigNode(
        {
            "experiment": {"method": "ddim"},
            "model": {"model_name": "m"},
            "dataset": {},
            "inference": {},
        }
    )
    validate_config(good)
    with pytest.raises(ConfigError, match="missing required"):
        validate_config(ConfigNode({"experiment": {"method": "x"}}))
    with pytest.raises(ConfigError, match="unknown sections"):
        validate_config(good.replace(bogus={}))


def test_load_config_yaml(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        """
experiment_name: t
experiment: {method: ddim, seed: 29}
model: {model_name: stable_diffusion_model}
dataset: {image_size: 64}
inference: {batch_size: 2}
"""
    )
    cfg = load_config(p)
    assert cfg.experiment.seed == 29
    assert cfg.model.model_name == "stable_diffusion_model"


def test_load_config_overrides(tmp_path):
    """--set dotted overrides: applied pre-validation, YAML-typed values,
    intermediate sections created, scalar-in-path rejected."""
    p = tmp_path / "c.yaml"
    p.write_text(
        """
experiment: {method: ddim, seed: 29}
model: {model_name: stable_diffusion_model}
dataset: {image_size: 64}
inference: {batch_size: 2}
"""
    )
    cfg = load_config(p, {"dataset.max_count": 32, "inference.batch_size": 4})
    assert cfg.dataset.max_count == 32
    assert cfg.inference.batch_size == 4
    # creates missing intermediate sections (known ones pass validation)
    cfg2 = load_config(p, {"experiment_params.num_inference_steps": [10]})
    assert cfg2.experiment_params.num_inference_steps == [10]
    with pytest.raises(ConfigError, match="not a section"):
        load_config(p, {"experiment.seed.deep": 1})


def test_cli_parse_sets():
    from sonicdiffusionbayeslab_tpu.cli import _parse_sets

    out = _parse_sets(["dataset.max_count=32", "model.use_t5=true", "a.b=hi"])
    assert out == {"dataset.max_count": 32, "model.use_t5": True, "a.b": "hi"}
    with pytest.raises(SystemExit):
        _parse_sets(["noequals"])


def test_prompt_dataset_max_count(tmp_path):
    import json

    from sonicdiffusionbayeslab_tpu.data.dataset import PromptDataset

    f = tmp_path / "p.json"
    f.write_text(json.dumps({f"img_{i:03d}.jpg": f"prompt {i}" for i in range(10)}))
    assert len(PromptDataset(f)) == 10
    ds = PromptDataset(f, max_count=3)
    assert len(ds) == 3
    # deterministic: the sorted-first files survive
    assert ds.files == sorted(ds.img2prompt)[:3]
