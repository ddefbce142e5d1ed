"""Round-3 fixes: untracked noise norms never enter the sampling program,
honest FID metric keys, EMA in celeb bundles, and exact resume
reproducibility under ``steps_per_call`` folding (per-step key cadence).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from siss_tpu.diffusion import NoiseSchedule
from siss_tpu.diffusion.sampling import sample_ddim_cfg


def test_untracked_noise_norm_absent_from_program():
    """VERDICT r2 weak #6: with track_noise_norm=False the per-step norm
    reductions (sqrt of a full-image sum) must not exist in the program at
    all — not merely be discarded."""
    sched = NoiseSchedule.create(50, "linear", clip_sample=False)

    def eps_fn(x, t, cond):
        return x * 0.9  # no sqrt anywhere in the model

    def run(track):
        return sample_ddim_cfg(eps_fn, sched, jax.random.PRNGKey(0),
                               (2, 4, 4, 1), jnp.zeros((2, 3, 8)),
                               jnp.zeros((2, 3, 8)), num_inference_steps=4,
                               track_noise_norm=track)

    tracked = str(jax.make_jaxpr(lambda: run(True))())
    untracked = str(jax.make_jaxpr(lambda: run(False))())
    # the norms are sqrt(reduce_sum(.^2)) over image dims; ddim_step itself
    # has no reductions, so reduce_sum is the norm computation's signature
    assert "reduce_sum" in tracked
    assert "reduce_sum" not in untracked
    x, norms = run(False)
    assert norms is None
    xt, nt = run(True)
    assert set(nt) == {"uncond_norm", "text_norm"}
    # sampling result identical either way
    np.testing.assert_allclose(np.asarray(x), np.asarray(xt), rtol=1e-6)


def test_sd_pipeline_passes_track_flag_through():
    """The pipeline must not compute norms when the caller didn't ask."""
    import inspect

    from siss_tpu.diffusion import sd_pipeline

    src = inspect.getsource(sd_pipeline.StableDiffusionPipeline.__call__)
    assert "track_noise_norm=track_noise_norm" in src


def test_fid_metric_key_honesty():
    """VERDICT r2 weak #2: FID-rand must not log under metrics/fid."""
    from siss_tpu.metrics.fid import FIDEvaluator
    from siss_tpu.metrics.inception_v3 import make_inception_feature_fn

    feature_fn, name = make_inception_feature_fn(None)
    assert name == "rand"
    ev = FIDEvaluator(feature_fn, embedder=name)
    assert ev.metric_key == "metrics/fid_rand"
    assert FIDEvaluator(feature_fn).metric_key == "metrics/fid"


@pytest.mark.slow
def test_delete_tshirt_folded_resume_bitwise(tmp_path):
    """ADVICE r2 #1: with per-step key cadence, a run resumed from a
    mid-run checkpoint reproduces the uninterrupted folded run exactly
    (same keys, same data, same program)."""
    from siss_tpu.config import load_config
    from siss_tpu.data import make_synthetic_mnist_tshirt
    from siss_tpu.tasks.delete_tshirt import DeleteTShirt

    npz = str(tmp_path / "d.npz")
    images, labels = make_synthetic_mnist_tshirt(n_per_class=6)
    np.savez(npz, images=images, labels=labels)

    def overrides(out, resume=None):
        o = [
            f"dataset_all.path={npz}", f"dataset_deletion.path={npz}",
            f"dataset.path={npz}", f"output_dir={out}",
            "checkpoint_path=null",
            "training_steps=5", "train_batch_size=4", "eval_images=4",
            "eval_batch_size=4", "sampling_steps=0", "steps_per_call=2",
            "checkpointing_steps=2",
            "metrics.likelihood=null", "mesh.data=2",
            "pipeline.num_inference_steps=4",
            "unet.block_out_channels=[16,32]",
            "unet.down_block_types=[DownBlock2D,DownBlock2D]",
            "unet.up_block_types=[UpBlock2D,UpBlock2D]",
            "+unet.norm_num_groups=8",
        ]
        if resume:
            o.append(f"resume_from_checkpoint={resume}")
        return o

    out1 = str(tmp_path / "full")
    DeleteTShirt(load_config("delete_tshirt", overrides(out1))).run()
    # resume from the step-2 checkpoint into a fresh output dir
    out2 = str(tmp_path / "resumed")
    DeleteTShirt(load_config(
        "delete_tshirt", overrides(out2, resume=os.path.join(out1, "checkpoint-2")))).run()

    def rows(out):
        with open(os.path.join(out, "metrics.jsonl")) as f:
            return {r["_step"]: r for r in map(json.loads, f) if "loss_x/mean" in r}

    full, resumed = rows(out1), rows(out2)
    assert sorted(resumed) == [3, 4, 5]
    for step in (3, 4, 5):
        for k in ("loss_x/mean", "loss_a/mean", "gradient/norm_loss_a"):
            assert full[step][k] == resumed[step][k], (step, k)


def test_batchloader_skip_batches():
    """ADVICE r2 #2: resume fast-forward skips at the sampler/index level —
    skipped batches must not touch the dataset, and the post-skip stream
    must equal the suffix of an unskipped run."""
    from siss_tpu.data import BatchLoader, InfiniteSampler

    class CountingDataset:
        def __init__(self, n):
            self.data = np.arange(n, dtype=np.float32)
            self.reads = 0

        def __len__(self):
            return len(self.data)

        def __getitem__(self, i):
            self.reads += 1
            return self.data[i]

    def take(loader, n):
        it = iter(loader)
        return [next(it) for _ in range(n)]

    ds_full = CountingDataset(16)
    full = take(BatchLoader(ds_full, InfiniteSampler(16, seed=3), 4, prefetch=0), 5)

    ds_skip = CountingDataset(16)
    skipped = take(BatchLoader(ds_skip, InfiniteSampler(16, seed=3), 4,
                               prefetch=0, skip_batches=3), 2)
    for a, b in zip(full[3:], skipped):
        np.testing.assert_array_equal(a, b)
    assert ds_skip.reads == 2 * 4  # only the yielded batches were read

    # post-construction assignment (the tasks' resume path) works too
    ds_attr = CountingDataset(16)
    loader = BatchLoader(ds_attr, InfiniteSampler(16, seed=3), 4, prefetch=0)
    loader.skip_batches = 3
    for a, b in zip(full[3:], take(loader, 2)):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_delete_celeb_steps_per_call(tmp_path):
    """VERDICT r2 weak #5: the celeb task delivers the folded-dispatch
    throughput bench.py measures — all steps complete, per-step metric
    rows, cadences fire at block crossings."""
    import os

    from PIL import Image

    from siss_tpu.config import load_config
    from siss_tpu.tasks.delete_celeb import DeleteCeleb

    data_dir = str(tmp_path / "celeba")
    os.makedirs(data_dir)
    rng = np.random.default_rng(0)
    for i in range(6):
        arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(data_dir, f"1000{i}.jpg"))
    cfg = load_config("delete_celeb", [
        f"data_dir={data_dir}", f"output_dir={tmp_path}/out",
        "checkpoint_path=/nonexistent",
        "training_steps=3", "train_batch_size=2",
        "gradient_accumulation_steps=2", "eval_batch_size=2",
        "sampling_steps=2", "steps_per_call=2", "mesh.data=2",
        "compute_dtype=float32", "pipeline.num_inference_steps=4",
        "metrics.denoising_injections.timestep=10",
        "unet._target_=siss_tpu.models.unet2d.UNet2DConfig",
        "+unet.sample_size=32", "+unet.in_channels=3", "+unet.out_channels=3",
        "+unet.block_out_channels=[16,32]",
        "+unet.down_block_types=[DownBlock2D,DownBlock2D]",
        "+unet.up_block_types=[UpBlock2D,UpBlock2D]",
        "+unet.norm_num_groups=8",
    ])
    DeleteCeleb(cfg).run()
    rows = [json.loads(l) for l in open(os.path.join(str(tmp_path), "out", "metrics.jsonl"))]
    train_steps = sorted(r["_step"] for r in rows if "loss_x/mean" in r)
    assert train_steps == [1, 2, 3], train_steps
    # sampling cadence 2 crossed inside block 1 (steps 1-2) -> eval at 2
    eval_steps = sorted(r["_step"] for r in rows
                        if any(k.startswith("Sampled Images") for k in r))
    assert 2 in eval_steps, eval_steps


@pytest.mark.slow
def test_delete_sd_steps_per_call(tmp_path):
    """steps_per_call for the SD task: folded dispatch, image-count step
    keys preserved, all steps complete."""
    from tests.test_sd_pipeline import _make_sd_dataset

    from siss_tpu.config import load_config
    from siss_tpu.tasks.delete_sd import DeleteSD

    root = str(tmp_path)
    _make_sd_dataset(root)
    cfg = load_config("delete_sd", [
        f"base_dir={root}", f"output_dir={root}/out",
        "model_variant=tiny", "mesh.data=1",
        "training_steps=3", "train_batch_size=2",
        "gradient_accumulation_steps=1", "eval_batches=0",
        "resolution=32", "gradient_checkpointing=false",
        "pretrained_model_name_or_path=/nonexistent",
        "og_prompts_path=/nonexistent.json",
        "modified_prompts_path=/nonexistent.json",
        "steps_per_call=2", "checkpointing_steps=2",
    ])
    DeleteSD(cfg).run()
    rows = [json.loads(l) for l in open(os.path.join(root, "out", "metrics.jsonl"))]
    steps = sorted(r["_step"] for r in rows if "loss_x/mean" in r)
    # step key = image count (bs 2 × accum 1 per step)
    assert steps == [2, 4, 6], steps
    assert os.path.isdir(os.path.join(root, "out", "checkpoint-2"))
    assert os.path.isdir(os.path.join(root, "out", "checkpoint-3"))


def test_celeb_bundle_includes_ema():
    """VERDICT r2 weak #4: delete_celeb bundles save unet_ema when EMA is
    enabled (reference layout, delete_celeb.py:137-147)."""
    import inspect

    from siss_tpu.tasks import delete_celeb

    src = inspect.getsource(delete_celeb)
    saves = src.count("save_bundle")
    emas = src.count('"unet_ema": state.ema.params')
    assert saves == emas and saves >= 3
