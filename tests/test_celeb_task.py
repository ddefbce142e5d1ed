"""DeleteCeleb task integration test (tiny UNet, synthetic JPEG folder)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from siss_tpu.config import load_config


def _make_celeb_folder(root, n=6, size=32):
    os.makedirs(root)
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(root, f"1000{i}.jpg"))


@pytest.mark.slow
def test_delete_celeb_task_end_to_end(tmp_path):
    data_dir = str(tmp_path / "celeba")
    _make_celeb_folder(data_dir)
    cfg = load_config("delete_celeb", [
        f"data_dir={data_dir}",
        f"output_dir={tmp_path}/out",
        "checkpoint_path=/nonexistent",      # random init start
        "training_steps=2",
        "train_batch_size=2",
        "gradient_accumulation_steps=2",
        "eval_batch_size=2",
        "sampling_steps=2",
        "mesh.data=2",
        "compute_dtype=float32",
        "pipeline.num_inference_steps=4",
        "metrics.denoising_injections.timestep=10",
        # tiny arch in place of the 113M celeb UNet
        "unet._target_=siss_tpu.models.unet2d.UNet2DConfig",
        "+unet.sample_size=32",
        "+unet.in_channels=3",
        "+unet.out_channels=3",
        "+unet.block_out_channels=[16,32]",
        "+unet.down_block_types=[DownBlock2D,DownBlock2D]",
        "+unet.up_block_types=[UpBlock2D,UpBlock2D]",
        "+unet.norm_num_groups=8",
    ])
    from siss_tpu.tasks.delete_celeb import DeleteCeleb

    DeleteCeleb(cfg).run()

    rows = [json.loads(l) for l in open(os.path.join(str(tmp_path), "out", "metrics.jsonl"))]
    keys = set().union(*[set(r) for r in rows])
    # SISS step metrics with the t≡999 window + surgery
    assert "gradient/scaling_factor" in keys
    assert "importance_weight_x/mean" in keys
    # denoising-injection panels were produced
    assert any(k.startswith("Target Image Generations") for k in keys)
    assert any(k.startswith("Sampled Images") for k in keys)
    # checkpoint bundle written
    ckpts = [d for d in os.listdir(os.path.join(str(tmp_path), "out")) if d.startswith("checkpoint-")]
    assert ckpts
