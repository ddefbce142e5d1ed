"""Preemption guard: SIGTERM requests a graceful stop exactly once."""

import os
import signal
import time

from siss_tpu.utils.preemption import PreemptionGuard
import pytest


def test_sigterm_sets_stop_flag():
    guard = PreemptionGuard().reset().install()
    assert not guard.should_stop
    os.kill(os.getpid(), signal.SIGTERM)
    # signal delivery is synchronous for same-process kill in CPython
    time.sleep(0.05)
    assert guard.should_stop
    # handler restored the previous disposition after first delivery
    assert signal.getsignal(signal.SIGTERM) is not guard._handler


def test_install_is_idempotent():
    g = PreemptionGuard().reset()
    g.install()
    g.install()
    assert g._installed


@pytest.mark.slow
def test_task_loop_breaks_and_checkpoints(tmp_path):
    """End-to-end: SIGTERM mid-pretraining saves a resumable bundle."""
    import threading

    import numpy as np

    from siss_tpu.config import load_config
    from siss_tpu.data import make_synthetic_mnist_tshirt
    from siss_tpu.tasks.train_unconditional import TrainUnconditional

    npz = str(tmp_path / "d.npz")
    images, labels = make_synthetic_mnist_tshirt(n_per_class=8)
    np.savez(npz, images=images, labels=labels)
    cfg = load_config("train_tshirt_mnist", [
        f"dataset.path={npz}",
        f"output_dir={tmp_path}/base",
        "num_epochs=1000",          # would run ~5000 steps without the signal
        "train_batch_size=16",
        "sampling_steps=0",
        "lr_warmup_steps=1",
        "mesh.data=1",
        "unet.block_out_channels=[8,16]",
        "unet.down_block_types=[DownBlock2D,DownBlock2D]",
        "unet.up_block_types=[UpBlock2D,UpBlock2D]",
        "+unet.norm_num_groups=4",
    ])
    PreemptionGuard().reset()
    # deliver SIGTERM shortly after training starts (the process-wide flag
    # catches it even if it lands before the task's guard installs)
    timer = threading.Timer(10.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
    timer.start()
    try:
        TrainUnconditional(cfg).run()  # returns instead of running 5000 steps
    finally:
        timer.cancel()
    ckpts = [d for d in os.listdir(tmp_path / "base") if d.startswith("checkpoint-")]
    assert ckpts, "preemption checkpoint not written"
