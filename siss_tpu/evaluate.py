"""Sampling/evaluation harness — the reference ``Evaluator`` surface
(``evaluate.py``) over the fused `lax.scan` samplers.

* ``sample_images``  ← ``evaluate.py:37-50`` (DDPM pipeline ancestral loop;
  output numpy NHWC in [0,1], like diffusers' ``output_type="numpy"``)
* ``denoise_images`` ← ``evaluate.py:64-79`` (manual reverse loop from a
  given timestep — used for denoising-injection metrics)
* ``make_grid_from_images`` ← ``evaluate.py:81-90`` (torch-free grid maker,
  1-channel aware)

Sampling functions are jit-cached per (batch-shape, steps) and optionally
seeded for reproducible panels (``set_generator`` semantics).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from siss_tpu.diffusion.sampling import (
    denoise_from_t, denoise_from_t_dpm, sample_ddpm, sample_dpm_solver_2m)
from siss_tpu.diffusion.schedule import NoiseSchedule


class Evaluator:
    """Wraps an eps-model + schedule into a sampling/eval harness."""

    def __init__(self, eps_apply: Callable, schedule: NoiseSchedule,
                 sample_shape: tuple, num_inference_steps: int = 50,
                 random_seed: int = 0, solver: str = "ddpm", mesh=None,
                 injection_steps: int = 10):
        """``eps_apply(params, x, t, cond) -> eps``; ``sample_shape`` is
        (H, W, C). ``solver``: "ddpm" (reference-parity ancestral loop) or
        "dpm" (DPM-Solver++(2M) — comparable quality in 10-20 steps).
        ``mesh``: optional device mesh — the sampling batch is then sharded
        over the data axes, so the 50-step eval loop (which the celeb
        workload runs every grad step) scales with the slice instead of
        replicating. Draws are identical either way (partitionable
        threefry), verified by ``test_tensor_parallel.py``."""
        self.eps_apply = eps_apply
        self.schedule = schedule
        self.sample_shape = tuple(sample_shape)
        self.num_inference_steps = num_inference_steps
        self.random_seed = random_seed
        if solver not in ("ddpm", "dpm"):
            raise ValueError(f"Unknown solver {solver!r}: choose ddpm or dpm")
        self.solver = solver
        # "dpm" also routes denoising injections (``denoise_images``,
        # reference ``evaluate.py:64-79``) through the DPM-Solver++(2M)
        # reverse ODE in ~injection_steps model calls instead of the
        # ancestral loop's t_start+1 calls
        self.injection_steps = injection_steps
        self._batch_sharding = None
        if mesh is not None and mesh.devices.size > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            data_axes = (("data", "fsdp") if mesh.shape.get("fsdp", 1) > 1
                         else "data")
            self._batch_sharding = NamedSharding(mesh, P(data_axes))
        self._sample_jit = functools.lru_cache(maxsize=8)(self._build_sample)
        self._denoise_jit = functools.lru_cache(maxsize=8)(self._build_denoise)

    def _shardable(self, batch_size: int):
        """Batch sharding when the eval batch divides the data axes (odd
        batches fall back to the propagated layout)."""
        if self._batch_sharding is None:
            return None
        m = self._batch_sharding.mesh
        axes = self._batch_sharding.spec[0]
        axes = (axes,) if isinstance(axes, str) else axes
        data_size = int(np.prod([m.shape[a] for a in axes]))
        return self._batch_sharding if batch_size % data_size == 0 else None

    def _build_sample(self, batch_size: int, steps: int):
        shape = (batch_size, *self.sample_shape)
        sampler = sample_dpm_solver_2m if self.solver == "dpm" else sample_ddpm
        sh = self._shardable(batch_size)

        @functools.partial(jax.jit, out_shardings=sh)
        def fn(params, key):
            def eps_fn(x, t, cond):
                return self.eps_apply(params, x, t, cond)

            return sampler(eps_fn, self.schedule, key, shape, steps)

        return fn

    def _build_denoise(self, t_start: int, batch_size: int):
        sh = self._shardable(batch_size)

        @functools.partial(jax.jit, out_shardings=sh)
        def fn(params, x_t, key):
            def eps_fn(x, t, cond):
                return self.eps_apply(params, x, t, cond)

            if self.solver == "dpm":
                return denoise_from_t_dpm(eps_fn, self.schedule, x_t, t_start,
                                          num_inference_steps=self.injection_steps)
            return denoise_from_t(eps_fn, self.schedule, key, x_t, t_start)

        return fn

    def sample_images(self, params, num_samples: int, num_inference_steps: Optional[int] = None,
                      set_generator: bool = False, key: Optional[jax.Array] = None) -> np.ndarray:
        """Ancestral DDPM samples as numpy NHWC float in [0, 1]."""
        steps = num_inference_steps or self.num_inference_steps
        if key is None:
            key = jax.random.PRNGKey(self.random_seed if set_generator else np.random.randint(2**31))
        imgs = self._sample_jit(num_samples, steps)(params, key)
        imgs = (np.asarray(imgs) + 1.0) / 2.0
        return np.clip(imgs, 0.0, 1.0)

    def denoise_images(self, params, noisy_image_batch, timestep: int,
                       set_generator: bool = True, key: Optional[jax.Array] = None) -> np.ndarray:
        """Reverse-diffuse a noised batch from ``timestep`` → 0; numpy NHWC
        in [0, 1] (``evaluate.py:64-79``)."""
        if key is None:
            key = jax.random.PRNGKey(self.random_seed if set_generator else np.random.randint(2**31))
        x_t = jnp.asarray(noisy_image_batch)
        out = self._denoise_jit(int(timestep), x_t.shape[0])(params, x_t, key)
        out = (np.asarray(out) + 1.0) / 2.0
        return np.clip(out, 0.0, 1.0)

    @staticmethod
    def make_grid_from_images(images: np.ndarray, padding: int = 2) -> np.ndarray:
        """Square grid of NHWC images (numpy re-implementation of
        torchvision ``make_grid``; keeps 1-channel images 1-channel)."""
        n, h, w, c = images.shape
        ncol = int(np.ceil(np.sqrt(n)))
        nrow = int(np.ceil(n / ncol))
        grid = np.zeros(
            (nrow * h + padding * (nrow + 1), ncol * w + padding * (ncol + 1), c),
            dtype=images.dtype,
        )
        for idx in range(n):
            r, col = divmod(idx, ncol)
            y = padding + r * (h + padding)
            x = padding + col * (w + padding)
            grid[y:y + h, x:x + w] = images[idx]
        return grid
