"""Export-to-diffusers (inverse converter) tests.

The import direction is golden-tested against torch implementations
(`test_celeb_converter_golden.py`, `test_sd_converter_golden.py`); these
tests pin the export direction as its exact inverse:

* round-trip: ``convert_*(export(params), template) == params`` bitwise
  for all three model families;
* torch-layout exactness: exporting params that were themselves imported
  from a torch state dict reproduces that state dict key-for-key,
  value-for-value (modern names);
* the bundle CLI writes diffusers dirs our own loader re-imports.
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from siss_tpu.models.unet2d import UNet2D, UNet2DConfig
from siss_tpu.models.unet2d_cond import UNet2DCondition, UNet2DConditionConfig
from siss_tpu.models.vae import AutoencoderKL, AutoencoderKLConfig
from siss_tpu.utils.export import (
    diffusers_config_for,
    export_diffusers_state_dict,
    save_diffusers_model_dir,
)
from siss_tpu.utils.hf_convert import convert_unet2d
from siss_tpu.utils.sd_convert import convert_sd_unet, convert_vae

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tree_equal(a, b):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat_b[path]),
                                      err_msg=jax.tree_util.keystr(path))


def test_roundtrip_unet2d():
    cfg = UNet2DConfig(sample_size=16, block_out_channels=(16, 32),
                       down_block_types=("DownBlock2D", "AttnDownBlock2D"),
                       up_block_types=("AttnUpBlock2D", "UpBlock2D"),
                       norm_num_groups=8, attention_head_dim=8)
    params = UNet2D(cfg).init_params(jax.random.PRNGKey(0))
    sd = export_diffusers_state_dict(params)
    # modern attention names, never legacy
    assert any(k.endswith("to_q.weight") for k in sd)
    assert not any(".query." in k or ".proj_attn." in k for k in sd)
    back = convert_unet2d(sd, params)
    _tree_equal(params, back)


def test_roundtrip_sd_unet_and_vae():
    ucfg = UNet2DConditionConfig.tiny()
    uparams = UNet2DCondition(ucfg).init_params(jax.random.PRNGKey(1), context_len=7)
    usd = export_diffusers_state_dict(uparams)
    assert any("ff.net.0.proj.weight" in k for k in usd)
    assert any(k.endswith("to_out.0.bias") for k in usd)
    _tree_equal(uparams, convert_sd_unet(usd, uparams))

    vcfg = AutoencoderKLConfig.tiny()
    vparams = AutoencoderKL(vcfg).init_params(jax.random.PRNGKey(2), image_size=16)
    vsd = export_diffusers_state_dict(vparams)
    _tree_equal(vparams, convert_vae(vsd, vparams))


def test_export_reproduces_torch_state_dict_exactly():
    """import(torch_sd) → export == torch_sd: keys AND values (the torch
    mimic uses diffusers-exact modern names, so this pins the export's
    key map and layout transposes against the golden-tested layout)."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_sd_converter_golden import TorchSDUNetRef

    cfg = UNet2DConditionConfig(
        sample_size=8, block_out_channels=(16, 32),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, num_attention_heads=2, cross_attention_dim=16,
        norm_num_groups=8,
    )
    torch.manual_seed(0)
    tsd = TorchSDUNetRef(cfg).eval().diffusers_state_dict()
    template = UNet2DCondition(cfg).init_params(jax.random.PRNGKey(0), context_len=7)
    params = convert_sd_unet(tsd, template)
    out = export_diffusers_state_dict(params)
    assert set(out) == set(tsd)
    for k in tsd:
        np.testing.assert_array_equal(out[k], np.asarray(tsd[k]), err_msg=k)


def test_save_dir_and_reimport(tmp_path):
    cfg = UNet2DConfig(sample_size=8, block_out_channels=(16, 32),
                       down_block_types=("DownBlock2D", "DownBlock2D"),
                       up_block_types=("UpBlock2D", "UpBlock2D"),
                       norm_num_groups=8)
    params = UNet2D(cfg).init_params(jax.random.PRNGKey(3))
    out = save_diffusers_model_dir(params, cfg, str(tmp_path / "unet"))

    with open(os.path.join(out, "config.json")) as f:
        meta = json.load(f)
    assert meta["_class_name"] == "UNet2DModel"
    assert meta["block_out_channels"] == [16, 32]

    from siss_tpu.utils.hf_convert import import_hf_unet

    back = import_hf_unet(out, params)
    _tree_equal(params, back)


def test_bfloat16_params_export_as_float32(tmp_path):
    cfg = UNet2DConfig(sample_size=8, block_out_channels=(16, 32),
                       down_block_types=("DownBlock2D", "DownBlock2D"),
                       up_block_types=("UpBlock2D", "UpBlock2D"),
                       norm_num_groups=8)
    params = UNet2D(cfg).init_params(jax.random.PRNGKey(4))
    bf16 = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    sd = export_diffusers_state_dict(bf16)
    assert all(v.dtype == np.float32 for v in sd.values())


def test_sd_config_json_head_dim_quirk():
    meta = diffusers_config_for(UNet2DConditionConfig.sd_v1())
    # diffusers SD-v1 configs carry the head COUNT under attention_head_dim
    assert meta["attention_head_dim"] == 8
    assert meta["_class_name"] == "UNet2DConditionModel"
    assert meta["use_linear_projection"] is False


@pytest.mark.slow
def test_cli_bundle_export(tmp_path):
    """orbax bundle → CLI → diffusers dirs for unet + unet_ema (subprocess
    with a cold JAX import, ~28s — full tier; the in-process export paths
    stay in the fast tier above)."""
    import orbax.checkpoint as ocp

    cfg = UNet2DConfig(sample_size=8, block_out_channels=(16, 32),
                       down_block_types=("DownBlock2D", "DownBlock2D"),
                       up_block_types=("UpBlock2D", "UpBlock2D"),
                       norm_num_groups=8)
    model = UNet2D(cfg)
    params = model.init_params(jax.random.PRNGKey(5))
    ema = jax.tree.map(lambda p: p * 0.5, params)
    bundle = tmp_path / "checkpoint-7"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(str(bundle / "unet"), params)
        ckptr.save(str(bundle / "unet_ema"), ema)

    run_cfg = {"unet": {
        "sample_size": 8, "block_out_channels": [16, 32],
        "down_block_types": ["DownBlock2D", "DownBlock2D"],
        "up_block_types": ["UpBlock2D", "UpBlock2D"], "norm_num_groups": 8,
    }}
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(run_cfg))

    out = tmp_path / "exported"
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/export_diffusers_checkpoint.py"),
         "--checkpoint", str(bundle), "--run-config", str(cfg_path), "--out", str(out)],
        capture_output=True, text=True, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]

    from siss_tpu.utils.hf_convert import import_hf_unet

    _tree_equal(params, import_hf_unet(str(out / "unet"), params))
    _tree_equal(ema, import_hf_unet(str(out / "unet_ema"), params))
