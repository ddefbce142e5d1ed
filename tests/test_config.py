import os

import pytest

from siss_tpu.config import Config, get_object, instantiate, load_config, to_dict


@pytest.fixture
def cfg_dir(tmp_path):
    (tmp_path / "base.yaml").write_text(
        """
random_seed: 42
resolution: 28
unet:
  sample_size: ${resolution}
  channels: [64, 128]
optimizer:
  _target_: torch.optim.AdamW
  lr: 1e-4
deletion:
  img_name: [a.jpg, b.jpg]
"""
    )
    (tmp_path / "child.yaml").write_text(
        """
defaults:
  - base
  - _self_

random_seed: 46
deletion:
  scaling_norm: 5
img_path: data/${deletion.img_name[0]}
"""
    )
    return str(tmp_path)


def test_defaults_inheritance(cfg_dir):
    cfg = load_config("child", config_dir=cfg_dir)
    assert cfg.random_seed == 46          # child overrides
    assert cfg.resolution == 28           # inherited
    assert cfg.optimizer.lr == 1e-4       # nested inherited
    assert cfg.deletion.scaling_norm == 5
    assert cfg.deletion.img_name == ["a.jpg", "b.jpg"]  # merged sibling


def test_interpolation(cfg_dir):
    cfg = load_config("child", config_dir=cfg_dir)
    assert cfg.unet.sample_size == 28             # value interpolation
    assert cfg.img_path == "data/a.jpg"           # string + indexed


def test_overrides(cfg_dir):
    cfg = load_config("child", ["deletion.scaling_norm=99", "optimizer.lr=5e-6"], config_dir=cfg_dir)
    assert cfg.deletion.scaling_norm == 99
    assert cfg.optimizer.lr == 5e-6
    with pytest.raises(KeyError):
        load_config("child", ["nonexistent.key=1"], config_dir=cfg_dir)
    cfg = load_config("child", ["+new.key=1"], config_dir=cfg_dir)
    assert cfg.new.key == 1


def test_mutation_and_to_dict(cfg_dir):
    cfg = load_config("child", config_dir=cfg_dir)
    cfg.deletion.scaling_norm *= 2  # superfactor-decay-style runtime mutation
    assert cfg.deletion.scaling_norm == 10
    d = to_dict(cfg)
    assert isinstance(d, dict) and d["deletion"]["scaling_norm"] == 10


def test_get_object_and_instantiate():
    fn = get_object("siss_tpu.config.core.get_object")
    assert fn is get_object
    node = {"_target_": "siss_tpu.data.samplers.RepeatedSampler", "dataset_len": 3, "num_repeats": 2}
    obj = instantiate(node)
    assert len(obj) == 6
    # kwargs override node values
    obj = instantiate(node, num_repeats=5)
    assert len(obj) == 15


def test_shipped_configs_load():
    """The reference's Hydra config names must load from configs/."""
    for name in ["train_tshirt_mnist", "delete_tshirt", "delete_celeb", "delete_sd"]:
        cfg = load_config(name)
        assert "task" in cfg, name
    tshirt = load_config("delete_tshirt")
    assert tshirt.deletion.scaling_norm == 5
    assert tshirt.deletion.loss_fn == "importance_sampling_with_mixture"
    assert tshirt.train_batch_size == 64
    assert tshirt.unet.block_out_channels == [64, 128, 256]  # inherited
    celeb = load_config("delete_celeb")
    assert celeb.deletion.scaling_norm == 500
    assert celeb.gradient_accumulation_steps == 16
    sd = load_config("delete_sd")
    assert sd.deletion.scaling_norm == 750
