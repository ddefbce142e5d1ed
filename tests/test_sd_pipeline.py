"""SD pipeline + DeleteSD task integration tests (tiny models, synthetic data)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from siss_tpu.config import load_config
from siss_tpu.diffusion.sd_pipeline import StableDiffusionPipeline, sd_noise_schedule


@pytest.fixture
def toy_pipeline():
    sched = sd_noise_schedule()
    w = 0.2

    def unet_apply(params, x, t, ctx):
        # conditioning enters through the context mean so text/uncond differ
        return w * x + ctx.mean(axis=(1, 2))[:, None, None, None]

    def vae_decode(params, z):
        return jnp.tanh(z.repeat(2, axis=1).repeat(2, axis=2)[..., :3])

    return StableDiffusionPipeline(
        unet_apply=unet_apply, unet_params={},
        vae_decode=vae_decode, vae_params={},
        schedule=sched, latent_channels=4, vae_scale_factor=2,
    )


def test_pipeline_call_with_noise_norm(toy_pipeline):
    pe = jnp.ones((2, 7, 16))
    ue = jnp.zeros((2, 7, 16))
    imgs, norms = toy_pipeline(pe, ue, jax.random.PRNGKey(0), height=16, width=16,
                               num_inference_steps=8, track_noise_norm=True)
    assert imgs.shape == (2, 16, 16, 3)
    assert imgs.min() >= 0 and imgs.max() <= 1
    assert norms["text_norm"].shape == (8, 2)
    # delta is exactly 1 per latent pixel → norm = sqrt(8·8·4)=16
    np.testing.assert_allclose(norms["text_norm"], 16.0, rtol=1e-4)


def test_img2img_shapes(toy_pipeline):
    init = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    pe, ue = jnp.ones((1, 7, 16)), jnp.zeros((1, 7, 16))
    out = toy_pipeline.img2img(init, pe, ue, jax.random.PRNGKey(2), strength=0.5,
                               num_inference_steps=8)
    assert out.shape == (1, 16, 16, 3)


def test_text_cond_grad_token_shape(toy_pipeline):
    pe, ue = jnp.ones((1, 7, 16)), jnp.zeros((1, 7, 16))
    grads = toy_pipeline.get_text_cond_grad(pe, ue, jax.random.PRNGKey(0), height=16,
                                            width=16, num_inference_steps=6, target_steps=[0, 2])
    assert grads.shape == (7,)
    assert np.all(np.isfinite(grads)) and grads.max() > 0


def test_aug_prompt_reduces_text_norm(toy_pipeline):
    """The Wen et al. mitigation must strictly reduce ‖ε_text−ε_uncond‖."""
    pe, ue = jnp.ones((1, 7, 16)), jnp.zeros((1, 7, 16))

    def text_norm(e):
        latents = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
        val, _ = toy_pipeline._text_norm_loss({}, latents, jnp.asarray(980), e, ue)
        return float(val)

    before = text_norm(pe)
    out = toy_pipeline.aug_prompt(pe, ue, jax.random.PRNGKey(0), height=16, width=16,
                                  num_inference_steps=6, optim_iters=20, lr=0.05)
    after = text_norm(out)
    assert after < before
    # BOS gradient is zeroed: BOS moves only by AdamW weight decay (torch
    # behaviour too), far less than optimized tokens
    bos_delta = np.abs(np.asarray(out[:, 0]) - np.asarray(pe[:, 0])).max()
    tok_delta = np.abs(np.asarray(out[:, 1:]) - np.asarray(pe[:, 1:])).max()
    assert bos_delta < 0.01 * tok_delta + 1e-3


def _make_sd_dataset(root):
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    labels = {}
    for i in range(6):
        name = f"img_{i}.png"
        arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, name))
        labels[name] = 1 if i == 0 else 0
    with open(os.path.join(root, "kmeans_labels.json"), "w") as f:
        json.dump(labels, f)
    with open(os.path.join(root, "clustering_info.json"), "w") as f:
        json.dump({"frac_deletion": 1 / 6, "mem_img_name": "img_0.png"}, f)
    return img_dir


@pytest.mark.slow
def test_delete_sd_resume_from_latest(tmp_path):
    """Interrupted-run resume: train 1 step w/ checkpointing, then resume
    'latest' and confirm the step counter continues (``delete_sd.py:780-801``)."""
    root = str(tmp_path)
    _make_sd_dataset(root)
    base_overrides = [
        f"base_dir={root}",
        f"output_dir={root}/out",
        "model_variant=tiny",
        "mesh.data=1",
        "train_batch_size=2",
        "gradient_accumulation_steps=1",
        "eval_batches=0",
        "resolution=32",
        "gradient_checkpointing=false",
        "pretrained_model_name_or_path=/nonexistent",
        "og_prompts_path=/nonexistent.json",
        "modified_prompts_path=/nonexistent.json",
        "checkpointing_steps=1",
    ]
    from siss_tpu.tasks.delete_sd import DeleteSD

    cfg = load_config("delete_sd", base_overrides + ["training_steps=1"])
    DeleteSD(cfg).run()
    assert os.path.isdir(os.path.join(root, "out", "checkpoint-1"))

    cfg2 = load_config("delete_sd", base_overrides + [
        "training_steps=3", "resume_from_checkpoint=latest"])
    DeleteSD(cfg2).run()
    # resumed run continued from step 1 → final bundle at step 3
    assert os.path.isdir(os.path.join(root, "out", "checkpoint-3"))
    rows = [json.loads(l) for l in open(os.path.join(root, "out", "metrics.jsonl"))]
    steps = [r["_step"] for r in rows if "loss_x/mean" in r]
    # first run logged img_count 2 (1 step × bs 2); resume logged 4 and 6
    assert steps == [2, 4, 6]


@pytest.mark.slow
def test_delete_sd_task_end_to_end(tmp_path):
    """Full DeleteSD graph (tiny models, zero conditioning, 2 steps)."""
    root = str(tmp_path)
    _make_sd_dataset(root)
    # precomputed prompt embeddings (tiny text cfg: 16 tokens × 32 dims) —
    # the reference's token-optimized .pt prompt path, as .npz
    embeds_path = os.path.join(root, "aug_prompt.npz")
    np.savez(embeds_path, embeds=np.random.default_rng(1).normal(size=(1, 16, 32)).astype(np.float32))
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
        "pretrained_model_name_or_path=/nonexistent",
        "og_prompts_path=/nonexistent.json",
        "modified_prompts_path=/nonexistent.json",
        "metrics.noise_norm=true",
    ])
    from siss_tpu.tasks.delete_sd import DeleteSD

    DeleteSD(cfg).run()
    metrics_path = os.path.join(root, "out", "metrics.jsonl")
    rows = [json.loads(l) for l in open(metrics_path)]
    keys = set().union(*[set(r) for r in rows])
    assert "loss_x/mean" in keys and "gradient/scaling_factor" in keys
    assert "importance_weight_x/mean" in keys      # SISS default loss
    assert any(k.startswith("noise_norms/") for k in keys)
    assert cfg.deletion.frac_deletion == pytest.approx(1 / 6)  # fill_cfg ran


@pytest.mark.slow
def test_delete_sd_task_adafactor_override(tmp_path):
    """`optimizer: {_target_: adafactor}` replaces the flat adam_* knobs
    (the round-4 single-chip memory lever) and the task still runs."""
    root = str(tmp_path)
    _make_sd_dataset(root)
    cfg = load_config("delete_sd", [
        "validation_prompts=[]",
        f"base_dir={root}",
        f"output_dir={root}/out",
        "model_variant=tiny",
        "mesh.data=2",
        "training_steps=1",
        "train_batch_size=2",
        "gradient_accumulation_steps=2",
        "eval_batches=0",
        "resolution=32",
        "gradient_checkpointing=false",
        "pretrained_model_name_or_path=/nonexistent",
        "og_prompts_path=/nonexistent.json",
        "modified_prompts_path=/nonexistent.json",
    ])
    cfg["optimizer"] = {"_target_": "adafactor"}
    from siss_tpu.tasks.delete_sd import DeleteSD

    DeleteSD(cfg).run()
    metrics_path = os.path.join(root, "out", "metrics.jsonl")
    rows = [json.loads(l) for l in open(metrics_path)]
    assert any("gradient/scaling_factor" in r for r in rows)
