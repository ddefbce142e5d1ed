"""On-disk snapshot → converter script → orbax → task restore pipeline.

The converter goldens (`test_celeb_converter_golden.py`,
`test_sd_converter_golden.py`) validate the name maps and transposes with
IN-MEMORY state dicts. This file covers the remaining seam a real
checkpoint run crosses: the diffusers snapshot file formats on disk
(safetensors / torch ``.bin`` discovery in ``hf_convert.load_torch_state_dict``),
the ``scripts/convert_hf_checkpoint.py`` entry points, the orbax artifacts
they write, and the tasks' pretrained-restore branches
(``tasks/delete_celeb.py:50-68``, ``tasks/delete_sd.py:108-120``) — ending
with the tasks actually training from the converted weights instead of the
random-init fallback.

Reference load points being modeled: ``/root/reference/delete_celeb.py:181``
(``UNet2DModel.from_pretrained``), ``/root/reference/delete_sd.py:411-468``
(SD-1.x unet/vae/text_encoder ``from_pretrained``).
"""

import importlib.util
import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
safetensors_np = pytest.importorskip("safetensors.numpy")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from siss_tpu.config import load_config  # noqa: E402
from siss_tpu.models.unet2d import UNet2D, UNet2DConfig  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _converter_module():
    spec = importlib.util.spec_from_file_location(
        "convert_hf_checkpoint",
        os.path.join(_REPO, "scripts", "convert_hf_checkpoint.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------- formats

def test_load_torch_state_dict_formats(tmp_path):
    """File discovery + both serialization formats load identically."""
    from siss_tpu.utils.hf_convert import load_torch_state_dict

    arrays = {"conv.weight": np.arange(12, dtype=np.float32).reshape(3, 4),
              "conv.bias": np.ones(3, np.float32)}

    st_dir = tmp_path / "st"
    st_dir.mkdir()
    safetensors_np.save_file(arrays, str(st_dir / "diffusion_pytorch_model.safetensors"))

    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    torch.save({k: torch.from_numpy(v) for k, v in arrays.items()},
               str(bin_dir / "diffusion_pytorch_model.bin"))

    a = load_torch_state_dict(str(st_dir))
    b = load_torch_state_dict(str(bin_dir))
    assert set(a) == set(b) == set(arrays)
    for k in arrays:
        np.testing.assert_array_equal(np.asarray(a[k]), arrays[k])
        np.testing.assert_array_equal(np.asarray(b[k]), arrays[k])

    # discovery prefers safetensors when both files are present
    both = tmp_path / "both"
    both.mkdir()
    safetensors_np.save_file({"x": np.zeros(1, np.float32)},
                             str(both / "diffusion_pytorch_model.safetensors"))
    torch.save({"x": torch.ones(1)}, str(both / "diffusion_pytorch_model.bin"))
    np.testing.assert_array_equal(load_torch_state_dict(str(both))["x"],
                                  np.zeros(1, np.float32))

    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        load_torch_state_dict(str(empty))


# ------------------------------------------------------------------ celeb

def _tiny_celeb_cfg(in_ch=3):
    from tests.test_unet_torch_parity import CH, GROUPS, HEAD_DIM

    return UNet2DConfig(
        sample_size=32, in_channels=in_ch, out_channels=in_ch,
        block_out_channels=CH,
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        layers_per_block=2, attention_head_dim=HEAD_DIM,
        norm_num_groups=GROUPS, flip_sin_to_cos=True, freq_shift=0,
        downsample_padding=1,
    )


def _write_celeb_snapshot(snap_dir, in_ch=3, seed=0):
    """A diffusers-layout DDPM snapshot: unet/ subfolder with a safetensors
    model file + config.json, like a `google/ddpm-celebahq-256` download."""
    from tests.test_unet_torch_parity import TorchUNet2D

    torch.manual_seed(seed)
    tmodel = TorchUNet2D(in_ch=in_ch, out_ch=in_ch).eval()
    unet_dir = os.path.join(snap_dir, "unet")
    os.makedirs(unet_dir)
    safetensors_np.save_file(
        tmodel.diffusers_state_dict(),
        os.path.join(unet_dir, "diffusion_pytorch_model.safetensors"))
    with open(os.path.join(unet_dir, "config.json"), "w") as f:
        json.dump({"_class_name": "UNet2DModel", "sample_size": 32,
                   "in_channels": in_ch, "out_channels": in_ch}, f)
    return tmodel


def test_celeb_snapshot_convert_and_forward_parity(tmp_path):
    """snapshot dir → convert_celeb → orbax → restore → ε-output parity."""
    import orbax.checkpoint as ocp

    snap, dst = str(tmp_path / "snap"), str(tmp_path / "converted")
    tmodel = _write_celeb_snapshot(snap)
    cfg = _tiny_celeb_cfg()

    _converter_module().convert_celeb(snap, dst, config=cfg)

    fmodel = UNet2D(cfg)
    template = fmodel.init_params(jax.random.PRNGKey(0))
    with ocp.StandardCheckpointer() as ckptr:
        params = ckptr.restore(os.path.abspath(dst), template)

    x = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32)
    t = np.array([7, 891], np.int64)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    f_out = fmodel.apply({"params": params},
                         jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(f_out).transpose(0, 3, 1, 2), t_out,
                               rtol=5e-4, atol=5e-5)


@pytest.mark.slow
def test_delete_celeb_task_trains_from_converted_snapshot(tmp_path, capsys):
    """The DeleteCeleb restore branch consumes the converter's artifact —
    the random-init fallback warning must NOT fire."""
    snap, dst = str(tmp_path / "snap"), str(tmp_path / "converted")
    _write_celeb_snapshot(snap)
    _converter_module().convert_celeb(snap, dst, config=_tiny_celeb_cfg())

    from tests.test_celeb_task import _make_celeb_folder

    data_dir = str(tmp_path / "celeba")
    _make_celeb_folder(data_dir)
    cfg = load_config("delete_celeb", [
        f"data_dir={data_dir}",
        f"output_dir={tmp_path}/out",
        f"checkpoint_path={dst}",
        "training_steps=2",
        "train_batch_size=2",
        "gradient_accumulation_steps=2",
        "eval_batch_size=2",
        "sampling_steps=2",
        "mesh.data=2",
        "compute_dtype=float32",
        "pipeline.num_inference_steps=4",
        "metrics.denoising_injections.timestep=10",
        # must match the snapshot architecture exactly
        "unet._target_=siss_tpu.models.unet2d.UNet2DConfig",
        "+unet.sample_size=32",
        "+unet.in_channels=3",
        "+unet.out_channels=3",
        "+unet.block_out_channels=[16,32]",
        "+unet.down_block_types=[DownBlock2D,AttnDownBlock2D]",
        "+unet.up_block_types=[AttnUpBlock2D,UpBlock2D]",
        "+unet.attention_head_dim=8",
        "+unet.norm_num_groups=8",
    ])
    from siss_tpu.tasks.delete_celeb import DeleteCeleb

    DeleteCeleb(cfg).run()
    out = capsys.readouterr().out
    assert "WARNING: no pretrained weights" not in out
    assert os.path.exists(os.path.join(str(tmp_path), "out", "metrics.jsonl"))


# --------------------------------------------------------------------- sd

def _export_diffusers_named(params):
    """Flax param tree → diffusers-named numpy state dict (the inverse map
    the converter goldens pin; duplicated from test_sd_models so this file
    stands alone)."""
    from siss_tpu.utils.sd_convert import _SUFFIX, _expand_block_names, _fix_ff

    sd = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        names = tuple(p.key for p in path)
        parts = _expand_block_names(_fix_ff(names)[:-1])
        if parts[-1] == "to_out":
            parts = parts + ["0"]
        key = ".".join(parts + [_SUFFIX[names[-1]]])
        arr = np.asarray(leaf)
        if names[-1] == "kernel":
            arr = arr.transpose(3, 2, 0, 1) if arr.ndim == 4 else arr.transpose(1, 0)
        # safetensors serializes the raw buffer: transposed views must be
        # materialized in C order or the stored values are scrambled
        sd[key] = np.ascontiguousarray(arr)
    return sd


def _write_sd_snapshot(snap_dir):
    """A tiny SD-1.x-layout snapshot: unet/ vae/ (diffusers safetensors)
    + text_encoder/ (a REAL transformers CLIPTextModel state dict)."""
    import transformers

    from siss_tpu.models.unet2d_cond import UNet2DCondition, UNet2DConditionConfig
    from siss_tpu.models.vae import AutoencoderKL, AutoencoderKLConfig

    unet = UNet2DCondition(UNet2DConditionConfig.tiny())
    uparams = unet.init_params(jax.random.PRNGKey(1), context_len=7)
    vae = AutoencoderKL(AutoencoderKLConfig.tiny())
    vparams = vae.init_params(jax.random.PRNGKey(2), image_size=16)

    for sub, sd in (("unet", _export_diffusers_named(uparams)),
                    ("vae", _export_diffusers_named(vparams))):
        d = os.path.join(snap_dir, sub)
        os.makedirs(d)
        safetensors_np.save_file(sd, os.path.join(d, "diffusion_pytorch_model.safetensors"))

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=1000, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=16, hidden_act="quick_gelu")
    torch.manual_seed(0)
    hf_text = transformers.CLIPTextModel(hf_cfg).eval()
    d = os.path.join(snap_dir, "text_encoder")
    os.makedirs(d)
    safetensors_np.save_file(
        {k: v.numpy() for k, v in hf_text.state_dict().items()},
        os.path.join(d, "model.safetensors"))
    return uparams, vparams, hf_text


def test_sd_snapshot_convert_roundtrip(tmp_path):
    """snapshot dir → convert_sd(variant=tiny) → orbax; unet/vae restore
    bit-identical to the exported trees, text encoder forward-parity with
    the real transformers model the snapshot shipped."""
    import orbax.checkpoint as ocp

    from siss_tpu.models.unet2d_cond import UNet2DCondition, UNet2DConditionConfig
    from siss_tpu.models.vae import AutoencoderKL, AutoencoderKLConfig
    from siss_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel

    snap, dst = str(tmp_path / "snap"), str(tmp_path / "converted")
    uparams, vparams, hf_text = _write_sd_snapshot(snap)

    _converter_module().convert_sd(snap, dst, variant="tiny")

    with ocp.StandardCheckpointer() as ckptr:
        u2 = ckptr.restore(os.path.abspath(os.path.join(dst, "unet")),
                           UNet2DCondition(UNet2DConditionConfig.tiny())
                           .init_params(jax.random.PRNGKey(9), context_len=7))
        v2 = ckptr.restore(os.path.abspath(os.path.join(dst, "vae")),
                           AutoencoderKL(AutoencoderKLConfig.tiny())
                           .init_params(jax.random.PRNGKey(9), image_size=16))
        text = CLIPTextModel(CLIPTextConfig.tiny())
        t2 = ckptr.restore(os.path.abspath(os.path.join(dst, "text_encoder")),
                           text.init_params(jax.random.PRNGKey(9)))

    for a, b in zip(jax.tree_util.tree_leaves(uparams), jax.tree_util.tree_leaves(u2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(vparams), jax.tree_util.tree_leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ids = np.random.default_rng(0).integers(0, 1000, size=(2, 16))
    with torch.no_grad():
        hf_out = hf_text(torch.from_numpy(ids)).last_hidden_state.numpy()
    out = text.apply({"params": t2}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), hf_out, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_delete_sd_task_trains_from_converted_snapshot(tmp_path, capsys):
    """DeleteSD restores unet/vae/text_encoder from the converter's output
    directory — none of the three random-init fallbacks fire."""
    snap, dst = str(tmp_path / "snap"), str(tmp_path / "converted")
    _write_sd_snapshot(snap)
    _converter_module().convert_sd(snap, dst, variant="tiny")

    from tests.test_sd_pipeline import _make_sd_dataset

    root = str(tmp_path)
    _make_sd_dataset(root)
    embeds_path = os.path.join(root, "aug_prompt.npz")
    np.savez(embeds_path,
             embeds=np.random.default_rng(1).normal(size=(1, 16, 32)).astype(np.float32))
    cfg = load_config("delete_sd", [
        f"validation_prompts=[{embeds_path}]",
        f"base_dir={root}",
        f"output_dir={root}/out",
        "model_variant=tiny",
        "mesh.data=2",
        "training_steps=2",
        "train_batch_size=2",
        "gradient_accumulation_steps=2",
        "eval_batches=1",
        "eval_batch_size=1",
        "resolution=32",
        "gradient_checkpointing=false",
        f"pretrained_model_name_or_path={dst}",
        "og_prompts_path=/nonexistent.json",
        "modified_prompts_path=/nonexistent.json",
        "metrics.noise_norm=true",
    ])
    from siss_tpu.tasks.delete_sd import DeleteSD

    DeleteSD(cfg).run()
    out = capsys.readouterr().out
    assert "WARNING: no converted weights" not in out
    assert os.path.exists(os.path.join(root, "out", "metrics.jsonl"))
