"""TrainUnconditional task integration test (tiny UNet, synthetic data),
including checkpoint→unlearning-task weight hand-off."""

import json
import os

import numpy as np
import pytest

from siss_tpu.config import load_config

TINY_UNET = [
    "unet.block_out_channels=[16,32]",
    "unet.down_block_types=[DownBlock2D,DownBlock2D]",
    "unet.up_block_types=[UpBlock2D,UpBlock2D]",
    "+unet.norm_num_groups=8",
]


@pytest.mark.slow
def test_pretrain_then_delete_handoff(tmp_path):
    npz = str(tmp_path / "data.npz")
    from siss_tpu.data import make_synthetic_mnist_tshirt

    images, labels = make_synthetic_mnist_tshirt(n_per_class=8)
    np.savez(npz, images=images, labels=labels)

    cfg = load_config("train_tshirt_mnist", [
        f"dataset.path={npz}",
        f"output_dir={tmp_path}/base",
        "num_epochs=1",
        "train_batch_size=16",
        "eval_batch_size=4",
        "sampling_steps=5",
        "lr_warmup_steps=2",
        "pipeline.num_inference_steps=4",
        "mesh.data=2",
        *TINY_UNET,
    ])
    from siss_tpu.tasks.train_unconditional import TrainUnconditional

    TrainUnconditional(cfg).run()
    out = str(tmp_path / "base")
    rows = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    assert any("loss" in r for r in rows)
    ckpts = [d for d in os.listdir(out) if d.startswith("checkpoint-")]
    assert ckpts
    # bundle layout: state + unet + unet_ema subfolders
    sub = os.listdir(os.path.join(out, ckpts[-1]))
    assert {"state", "unet", "unet_ema"} <= set(sub)

    # hand-off: DeleteTShirt loads unet_ema as its start (reference behavior)
    del_cfg = load_config("delete_tshirt", [
        f"dataset_all.path={npz}",
        f"dataset_deletion.path={npz}",
        f"dataset.path={npz}",
        f"output_dir={tmp_path}/del",
        f"checkpoint_path={out}/latest",
        "training_steps=1",
        "train_batch_size=4",
        "eval_images=4",
        "eval_batch_size=4",
        "sampling_steps=5",
        "metrics.likelihood=null",
        "mesh.data=2",
        "pipeline.num_inference_steps=4",
        *TINY_UNET,
    ])
    from siss_tpu.tasks.delete_tshirt import DeleteTShirt

    DeleteTShirt(del_cfg).run()
    rows = [json.loads(l) for l in open(os.path.join(str(tmp_path), "del", "metrics.jsonl"))]
    keys = set().union(*[set(r) for r in rows])
    assert "gradient/scaling_factor" in keys
    assert "metrics/deletion_class_fraction" in keys


@pytest.mark.slow
def test_steps_per_call_fused_pretrain(tmp_path):
    """steps_per_call=4 (K optimizer steps fused into one lax.scan program,
    the dispatch-amortization mode for tiny models) must finish the same
    number of steps, fire cadences that are NOT multiples of K, and write
    the usual checkpoint bundle."""
    npz = str(tmp_path / "data.npz")
    from siss_tpu.data import make_synthetic_mnist_tshirt

    images, labels = make_synthetic_mnist_tshirt(n_per_class=8)
    np.savez(npz, images=images, labels=labels)

    cfg = load_config("train_tshirt_mnist", [
        f"dataset.path={npz}",
        f"output_dir={tmp_path}/fused",
        "num_epochs=2",
        "train_batch_size=16",
        "eval_batch_size=4",
        "sampling_steps=0",
        "lr_warmup_steps=2",
        "pipeline.num_inference_steps=4",
        "mesh.data=2",
        "+steps_per_call=4",
        "checkpointing_steps=6",   # not a multiple of 4: crossing must fire
        *TINY_UNET,
    ])
    from siss_tpu.tasks.train_unconditional import TrainUnconditional

    TrainUnconditional(cfg).run()
    out = str(tmp_path / "fused")
    ckpts = sorted(int(d.split("-")[1]) for d in os.listdir(out)
                   if d.startswith("checkpoint-") and not d.endswith(".tmp"))
    # dataset = 88 imgs / bs 16 -> 5 steps/epoch x 2 epochs = 10 steps,
    # executed as K-blocks of 4,4,2. Exact expectations:
    total_steps = 10
    assert ckpts and ckpts[-1] == total_steps, (
        f"final checkpoint must be at step {total_steps}: {ckpts}")
    # the cadence-6 crossing happens inside the second block -> saved at
    # the block end, step 8 (6 % 4 != 0 is the whole point of the test)
    assert 8 in ckpts, f"mid-run cadence-6 crossing never fired: {ckpts}"
    rows = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    assert any("loss" in r for r in rows)
