"""LiRA-motivated membership loss (``metrics/class_membership.py:7-130``).

Mean ε-MSE (summed over pixels) over an image×noise grid at fixed
timesteps, for keep and forget sets. The reference's Python batching loop
over the flattened N·M grid collapses here into one jitted scan over
MXU-sized chunks; logged as ``membership_loss/{all,deletion,ratio}_t=…``.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from siss_tpu.diffusion.schedule import NoiseSchedule, q_sample


class MembershipLoss:
    def __init__(self, eps_apply: Callable, schedule: NoiseSchedule,
                 dataset_all, dataset_deletion,
                 num_image_samples: int, num_noise_samples: int,
                 eval_batch_size: int = 4096, seed: int = 0):
        self.eps_apply = eps_apply
        self.schedule = schedule
        self.dataset_all = dataset_all
        self.dataset_deletion = dataset_deletion
        self.num_image_samples = num_image_samples
        self.num_noise_samples = num_noise_samples
        self.eval_batch_size = eval_batch_size
        self.rng = np.random.default_rng(seed)
        self._grid_fn = None

    def sample_images(self):
        n_all = len(self.dataset_all)
        n_del = len(self.dataset_deletion)
        all_idx = self.rng.choice(n_all, self.num_image_samples, replace=n_all < self.num_image_samples)
        if n_del == 1:
            del_idx = np.zeros(self.num_image_samples, np.int64)  # reference :42-44
        else:
            del_idx = self.rng.choice(n_del, self.num_image_samples, replace=n_del < self.num_image_samples)
        self.all_images = np.stack([np.asarray(self.dataset_all[int(i)]) for i in all_idx])
        self.del_images = np.stack([np.asarray(self.dataset_deletion[int(i)]) for i in del_idx])

    def sample_noises(self, key=None):
        key = key if key is not None else jax.random.PRNGKey(self.rng.integers(2**31))
        self.noise = jax.random.normal(key, (self.num_noise_samples, *self.all_images.shape[1:]))

    def _build_grid_fn(self):
        N, M = self.num_image_samples, self.num_noise_samples
        bs = min(self.eval_batch_size, N * M)
        n_chunks = -(-(N * M) // bs)
        pad = n_chunks * bs - N * M
        schedule = self.schedule
        eps_apply = self.eps_apply

        @jax.jit
        def grid_mean_loss(params, images, noise, t):
            # Build the N×M (image, noise) grid by indexing: chunk over it.
            img_idx = jnp.arange(N * M + pad) // M % N
            noi_idx = jnp.arange(N * M + pad) % M
            valid = jnp.arange(N * M + pad) < N * M

            def body(carry, chunk):
                total, count = carry
                ii, ni, v = chunk
                x0 = images[ii]
                eps = noise[ni]
                ts = jnp.full((bs,), t)
                noisy = q_sample(schedule, x0, eps, ts)
                pred = eps_apply(params, noisy, ts, None)
                per = jnp.sum((pred - eps) ** 2, axis=tuple(range(1, x0.ndim)))
                total = total + jnp.sum(per * v)
                count = count + jnp.sum(v)
                return (total, count), None

            chunks = (img_idx.reshape(n_chunks, bs), noi_idx.reshape(n_chunks, bs),
                      valid.reshape(n_chunks, bs).astype(jnp.float32))
            (total, count), _ = jax.lax.scan(body, (jnp.zeros(()), jnp.zeros(())), chunks)
            return total / count

        return grid_mean_loss

    def compute_membership_losses(self, params, timesteps: Sequence[int]) -> List[Tuple[float, float]]:
        """Returns [(all_loss, deletion_loss), …] per timestep
        (``class_membership.py:69-130``)."""
        if self._grid_fn is None:
            self._grid_fn = self._build_grid_fn()
        all_imgs = jnp.asarray(self.all_images)
        del_imgs = jnp.asarray(self.del_images)
        out = []
        for t in timesteps:
            a = float(self._grid_fn(params, all_imgs, self.noise, jnp.asarray(t)))
            d = float(self._grid_fn(params, del_imgs, self.noise, jnp.asarray(t)))
            out.append((a, d))
        return out
