"""DDPM pretraining task (``train_unconditional.py:69-567`` equivalent).

Epsilon-MSE (or SNR-weighted sample-prediction) training with EMA, periodic
sampling panels, checkpoint rotation and resume — as one jitted step over a
sharded mesh batch.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from siss_tpu.data import BatchLoader, InfiniteSampler
from siss_tpu.evaluate import Evaluator
from siss_tpu.parallel import global_batch_from_local, process_batch_slice, shard_params_fsdp
from siss_tpu.tasks.base import Task
from siss_tpu.train import TrainState, build_pretrain_step
from siss_tpu.train.optim import build_optimizer
from siss_tpu.utils import CheckpointManager
from siss_tpu.utils.preemption import PreemptionGuard


class TrainUnconditional(Task):
    def run(self) -> None:
        cfg = self.cfg
        tracker = self.make_tracker()
        mesh = self.make_mesh()
        key = jax.random.PRNGKey(int(cfg.random_seed))

        dataset = self.build_dataset(cfg.dataset)
        model, ucfg = self.build_unet()
        schedule = self.build_schedule()

        steps_per_epoch = max(len(dataset) // int(cfg.train_batch_size), 1)
        total_steps = int(cfg.num_epochs) * steps_per_epoch
        tx = build_optimizer(cfg.optimizer, str(cfg.lr_scheduler),
                             int(cfg.lr_warmup_steps), total_steps)

        key, init_key = jax.random.split(key)
        params = model.init_params(init_key)
        params = shard_params_fsdp(params, mesh)
        use_ema = bool(cfg.ema.use_ema)
        state = TrainState.create(params, tx, use_ema=use_ema)

        def eps_apply(p, x, t, cond):
            return model.apply({"params": p}, x, t)

        base_step = build_pretrain_step(
            eps_apply, schedule, tx,
            prediction_type=str(schedule.prediction_type),
            ema_inv_gamma=float(cfg.ema.ema_inv_gamma),
            ema_power=float(cfg.ema.ema_power),
            ema_max_decay=float(cfg.ema.ema_max_decay),
        )
        if bool(cfg.get("random_flip")):
            # keyed in-jit horizontal flip (reference torchvision transform)
            def one_step(state, batch, key):
                k_flip, k_step = jax.random.split(key)
                flip = jax.random.bernoulli(k_flip, 0.5, (batch.shape[0], 1, 1, 1))
                batch = jnp.where(flip, batch[:, :, ::-1, :], batch)
                return base_step(state, batch, k_step)
        else:
            one_step = base_step

        # For tiny models (the MNIST regime) the per-dispatch overhead of
        # the single-chip tunnel rivals the compute; folding K optimizer
        # steps into one lax.scan program amortizes it. K=1 is the plain
        # per-step path.
        steps_per_call = max(int(cfg.get("steps_per_call", 1) or 1), 1)

        if steps_per_call == 1:
            step_fn = jax.jit(one_step)
        else:
            from siss_tpu.train import fold_steps

            step_fn = jax.jit(fold_steps(one_step), donate_argnums=0)

        ckpt = CheckpointManager(str(cfg.output_dir), cfg.get("checkpoints_total_limit"),
                                 async_save=bool(cfg.get("async_checkpointing", False)))

        def save_checkpoint(step, st):
            # state + unet/unet_ema subfolders (reference layout,
            # ``delete_celeb.py:137-147``)
            ckpt.save_bundle(step, {
                "state": st,
                "unet": st.params,
                "unet_ema": st.ema.params if st.ema is not None else None,
            })

        global_step = 0
        if cfg.get("resume_from_checkpoint"):
            path = ckpt.latest() if cfg.resume_from_checkpoint == "latest" else str(cfg.resume_from_checkpoint)
            state = ckpt.restore_item(path, "state", state)
            from siss_tpu.parallel import shard_state

            # restored leaves come back committed to the template
            # leaves' (mixed) devices; re-place consistently on the mesh
            state = shard_state(state, mesh)
            global_step = int(state.step)

        evaluator = Evaluator(
            eps_apply, schedule,
            (ucfg.sample_size, ucfg.sample_size, ucfg.in_channels),
            num_inference_steps=int(cfg.pipeline.num_inference_steps),
            random_seed=int(cfg.random_seed),
            solver=str(cfg.pipeline.get("solver", "ddpm")),
            mesh=mesh,
        )

        # cfg.train_batch_size is GLOBAL; each process loads only its slice
        # (same contract as the deletion tasks)
        loader = BatchLoader(dataset, InfiniteSampler(len(dataset), rank=jax.process_index(), num_replicas=jax.process_count(), seed=int(cfg.random_seed)),
                             process_batch_slice(int(cfg.train_batch_size)))
        it = iter(loader)
        guard = PreemptionGuard().install()
        t_last = time.time()
        last_logged_step = 0
        while global_step < total_steps:
            if guard.should_stop:
                save_checkpoint(global_step, state)
                print(f"[preemption] saved checkpoint-{global_step}; exiting")
                break
            if steps_per_call == 1:
                key, step_key = jax.random.split(key)
                batch = global_batch_from_local(next(it), mesh)
                state, metrics = step_fn(state, batch, step_key)
                k_done = 1
            else:
                k_done = min(steps_per_call, total_steps - global_step)
                # stacked [K, local_batch, ...]: the BATCH axis is axis 1,
                # so use the microbatch assembler (axis-0 sharding would
                # data-parallelize over the K step axis instead)
                from siss_tpu.parallel import global_microbatches_from_local

                batches = global_microbatches_from_local(
                    np.stack([next(it) for _ in range(k_done)]), mesh)
                # one split per optimizer step — same chain cadence as the
                # unfolded loop, so folding never changes the noise sequence
                step_keys = []
                for _ in range(k_done):
                    key, sk = jax.random.split(key)
                    step_keys.append(sk)
                # a short tail block changes the leading shape; jit
                # recompiles once for it — rare and harmless
                state, metrics = step_fn(state, batches, jnp.stack(step_keys))
                # metrics leaves have a leading [K] axis; report the mean
                metrics = jax.tree.map(lambda m: m.mean(), metrics)
            global_step += k_done

            if global_step - last_logged_step >= 50 or last_logged_step == 0:
                dt = time.time() - t_last
                t_last = time.time()
                n_steps = global_step - last_logged_step
                tracker.log({
                    "loss": metrics["loss"],
                    "gradient/pre_clip_norm": metrics["gradient/pre_clip_norm"],
                    "images_per_sec": (n_steps * int(cfg.train_batch_size) / dt
                                       if last_logged_step > 0 else 0.0),
                }, step=global_step)
                last_logged_step = global_step

            fired = (lambda every: bool(every) and
                     (global_step // int(every)) > ((global_step - k_done) // int(every)))
            if int(cfg.sampling_steps) and fired(cfg.sampling_steps):
                eval_params = state.ema.params if use_ema else state.params
                imgs = evaluator.sample_images(eval_params, int(cfg.eval_batch_size), set_generator=True)
                tracker.log_images("Sampled Images", Evaluator.make_grid_from_images(imgs), step=global_step)

            if cfg.get("checkpointing_steps") and fired(cfg.checkpointing_steps):
                save_checkpoint(global_step, state)

        if not guard.should_stop:
            save_checkpoint(global_step, state)
        ckpt.wait()  # drain async checkpoint writes before exit
        tracker.finish()
