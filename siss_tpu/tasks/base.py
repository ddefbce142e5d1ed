"""Task ABC + shared wiring (mesh, tracker, model/dataset builders).

Equivalent of the reference's abstract ``Task`` (``main.py:9-12``) plus the
boilerplate every reference task repeats (Accelerator/tracker init, dataset
and model construction) — here built once, TPU-style: a ``Mesh`` replaces
the Accelerator, shardings replace ``.to(device)``.
"""

from __future__ import annotations

import abc
import os
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from siss_tpu.config import Config, instantiate, to_dict
from siss_tpu.data import LabeledImageDataset, make_synthetic_mnist_tshirt
from siss_tpu.diffusion import NoiseSchedule
from siss_tpu.models import UNet2D, UNet2DConfig
from siss_tpu.parallel import MeshConfig, make_mesh
from siss_tpu.utils import Tracker


def boundary_crossed(prev_step: int, step: int, every) -> bool:
    """True when the half-open interval ``(prev_step, step]`` contains a
    multiple of ``every`` — the step-frequency test that stays correct
    when the loop advances ``steps_per_call`` optimizer steps at a time
    (``step % every == 0`` would silently skip gates whenever the folded
    boundary lands past the multiple). Falsy ``every`` disables the gate.
    With ``prev_step = step - 1`` this reduces exactly to
    ``step % every == 0`` (including firing at step 0 with prev -1)."""
    if not every:
        return False
    every = int(every)
    return (step // every) > (prev_step // every)


class Task(abc.ABC):
    def __init__(self, cfg: Config):
        self.cfg = cfg

    @abc.abstractmethod
    def run(self) -> None:
        ...

    # ------------------------------------------------------------- helpers
    def make_mesh(self):
        mcfg = self.cfg.get("mesh")
        mesh_cfg = (MeshConfig(data=int(mcfg.get("data", -1)),
                               fsdp=int(mcfg.get("fsdp", 1)),
                               tensor=int(mcfg.get("tensor", 1)))
                    if mcfg else MeshConfig())
        return make_mesh(mesh_cfg)

    def make_tracker(self) -> Tracker:
        logging_cfg = self.cfg.get("logging") or Config({"logger": "jsonl"})
        return Tracker(
            project_name=str(self.cfg.project_name),
            output_dir=str(self.cfg.output_dir),
            logger=str(logging_cfg.get("logger", "jsonl")),
            config=to_dict(self.cfg),
            main_process=jax.process_index() == 0,
        )

    def compute_dtype(self):
        name = str(self.cfg.get("compute_dtype", "float32"))
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16}[name]

    def build_unet(self) -> Tuple[UNet2D, Any]:
        """UNet2D module from the cfg.unet node (UNet2DConfig target or a
        preset classmethod)."""
        node = to_dict(self.cfg.unet)
        target = node.pop("_target_", "siss_tpu.models.unet2d.UNet2DConfig")
        from siss_tpu.config.core import get_object

        fn = get_object(target)
        # tuple-ify list fields for the frozen dataclass
        for k in ("block_out_channels", "down_block_types", "up_block_types"):
            if k in node and isinstance(node[k], list):
                node[k] = tuple(node[k])
        ucfg = fn(**node)  # UNet2DConfig(...) or a preset classmethod
        model = UNet2D(ucfg, dtype=self.compute_dtype())
        return model, ucfg

    def build_schedule(self) -> NoiseSchedule:
        s = self.cfg.scheduler
        return NoiseSchedule.create(
            num_train_timesteps=int(s.get("num_train_timesteps", 1000)),
            beta_schedule=str(s.get("beta_schedule", "linear")),
            beta_start=float(s.get("beta_start", 1e-4)),
            beta_end=float(s.get("beta_end", 0.02)),
            prediction_type=str(s.get("prediction_type", "epsilon")),
        )

    def build_dataset(self, node: Config):
        """Instantiate a dataset node; for the MNIST-tshirt npz path, fall
        back to synthesizing the dataset (offline envs, SURVEY §4)."""
        node_d = to_dict(node)
        target = node_d.get("_target_", "")
        if target.endswith("LabeledImageDataset.from_npz"):
            path = node_d["path"]
            if not os.path.exists(path):
                os.makedirs(os.path.dirname(path), exist_ok=True)
                images, labels = make_synthetic_mnist_tshirt(n_per_class=256)
                np.savez_compressed(path, images=images, labels=labels)
        return instantiate(node)
