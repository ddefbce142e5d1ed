"""MNIST t-shirt unlearning task (``delete_tshirt.py:71-820`` equivalent).

Dual keep/forget infinite streams feed the fused deletion train step
(SISS mixture by default, full-range timesteps); metrics mirror the
reference: t-shirt fraction via the L2 detector with a steps-to-deletion
summary, NLL on a forget image every ``step_frequency``, optional
Inception Score with the t-shirt class removed, membership loss.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from siss_tpu.config import to_dict
from siss_tpu.data import BatchLoader, InfiniteSampler, dual_stream
from siss_tpu.diffusion.sde import VPSDE
from siss_tpu.evaluate import Evaluator
from siss_tpu.metrics import InceptionScore, MembershipLoss, TShirtClassifier
from siss_tpu.metrics.likelihood import LikelihoodEvaluator
from siss_tpu.parallel import (
    global_microbatches_from_local,
    process_batch_slice,
    shard_params_fsdp,
)
from siss_tpu.tasks.base import Task, boundary_crossed
from siss_tpu.train import DeletionStepConfig, TrainState, build_deletion_train_step
from siss_tpu.train.optim import build_optimizer
from siss_tpu.utils import CheckpointManager
from siss_tpu.utils.preemption import PreemptionGuard


class DeleteTShirt(Task):
    def run(self) -> None:
        cfg = self.cfg
        tracker = self.make_tracker()
        mesh = self.make_mesh()
        key = jax.random.PRNGKey(int(cfg.random_seed))

        dataset_all = self.build_dataset(cfg.dataset_all)
        dataset_deletion = self.build_dataset(cfg.dataset_deletion)
        model, ucfg = self.build_unet()
        schedule = self.build_schedule()

        # ---- pretrained start (EMA weights by default; reference
        # ``delete_tshirt.py:180-183`` loads unet_ema when use_ema=false)
        key, init_key = jax.random.split(key)
        params = model.init_params(init_key)
        if cfg.get("checkpoint_path"):
            path = str(cfg.checkpoint_path)
            subfolder = str(cfg.subfolders.get("unet", "unet"))
            root, leaf = os.path.split(path.rstrip("/"))
            mgr = CheckpointManager(root) if leaf == "latest" else CheckpointManager(os.path.dirname(path) or ".")
            params = mgr.restore_item("latest" if leaf == "latest" else path, subfolder, params)
        params = shard_params_fsdp(params, mesh)

        def eps_apply(p, x, t, cond):
            return model.apply({"params": p}, x, t)

        # ---- fused deletion step
        training_steps = int(cfg.training_steps)
        tx = build_optimizer(cfg.optimizer, str(cfg.lr_scheduler),
                             int(cfg.lr_warmup_steps), training_steps)
        loss_params = tuple(sorted(to_dict(cfg.deletion.get("loss_params") or {}).items()))
        step_cfg = DeletionStepConfig(
            loss_fn=str(cfg.deletion.loss_fn),
            loss_params=loss_params,
            scaling_norm=float(cfg.deletion.get("scaling_norm", 1.0)),
            eta=float(cfg.deletion.get("eta", 1e-3)),
            grad_accum_steps=int(cfg.get("gradient_accumulation_steps", 1)),
            t_min=int(cfg.deletion.get("t_min", 0)),
            t_max=int(cfg.deletion.get("t_max", schedule.num_train_timesteps)),
            use_ema=bool(cfg.ema.use_ema),
            batched_dual_backward=bool(cfg.deletion.get("batched_dual_backward", False)),
            grad_accum_dtype=str(cfg.deletion.get("grad_accum_dtype", "float32")),
            param_cast_dtype=cfg.deletion.get("param_cast_dtype"),
            fused_surgery=bool(cfg.deletion.get("fused_surgery", True)),
        )
        raw_step = build_deletion_train_step(eps_apply, schedule, tx, step_cfg)
        # donate the carried TrainState (in-place update, no 2x state peak)
        step_fn = jax.jit(raw_step, donate_argnums=0)
        state = TrainState.create(params, tx, use_ema=step_cfg.use_ema)

        # ---- data streams (reference ``delete_tshirt.py:272-288``)
        accum = step_cfg.grad_accum_steps
        bs = int(cfg.train_batch_size)
        # per-process stripes of the global batch (reference DDP
        # rank/num_replicas contract, infinite_sampler.py:5-13)
        bs_local = process_batch_slice(bs)
        rank, nrep = jax.process_index(), jax.process_count()
        keep_loader = BatchLoader(dataset_all, InfiniteSampler(
            len(dataset_all), rank=rank, num_replicas=nrep, seed=int(cfg.random_seed)), bs_local)
        forget_loader = BatchLoader(dataset_deletion, InfiniteSampler(
            len(dataset_deletion), rank=rank, num_replicas=nrep, seed=int(cfg.random_seed) + 1), bs_local)
        stream = dual_stream(iter(keep_loader), iter(forget_loader), accum)

        # ---- metric components
        evaluator = Evaluator(eps_apply, schedule,
                              (ucfg.sample_size, ucfg.sample_size, ucfg.in_channels),
                              num_inference_steps=int(cfg.pipeline.num_inference_steps),
                              random_seed=int(cfg.random_seed),
                              solver=str(cfg.pipeline.get("solver", "ddpm")),
                              injection_steps=int(cfg.pipeline.get("injection_steps", 10)),
                              mesh=mesh)
        metrics_cfg = cfg.get("metrics") or {}
        # canonical t-shirt image: from file if present, else first forget
        # image (synthetic envs)
        tshirt_path = str(metrics_cfg.get("classifier", {}).get("tshirt_path", "")) if metrics_cfg.get("classifier") else ""
        if tshirt_path and os.path.exists(tshirt_path):
            from PIL import Image

            tshirt_img = np.asarray(Image.open(tshirt_path), np.float32) / 255.0
            if tshirt_img.ndim == 2:
                tshirt_img = tshirt_img[..., None]
        else:
            tshirt_img = (np.asarray(dataset_deletion[0]) + 1.0) / 2.0

        likelihood_cfg = metrics_cfg.get("likelihood")
        likelihood = None
        if likelihood_cfg:
            likelihood = LikelihoodEvaluator(eps_apply, VPSDE(), schedule=schedule, method="rk45")

        membership_cfg = metrics_cfg.get("membership_loss")
        membership = None
        if membership_cfg:
            mc = membership_cfg.class_cfg
            membership = MembershipLoss(
                eps_apply, schedule, dataset_all, dataset_deletion,
                int(mc.num_image_samples), int(mc.num_noise_samples),
                int(mc.eval_batch_size), seed=int(cfg.random_seed))
            membership.sample_images()
            membership.sample_noises(jax.random.PRNGKey(int(cfg.random_seed)))

        is_cfg = metrics_cfg.get("inception_score")
        inception = None
        if is_cfg:
            from siss_tpu.config.core import get_object
            clf_cfg = cfg.metrics.classifier_cfg
            arch_fn = get_object(str(clf_cfg.classifier_arch))
            clf_model = arch_fn(**to_dict(clf_cfg.get("classifier_args") or {}))
            # classifier checkpoint: torch .pt (reference artifact) or orbax;
            # optional in offline envs
            try:
                from siss_tpu.metrics import Classifier

                ckpt_path = str(clf_cfg.classifier_ckpt)
                if ckpt_path.endswith((".pt", ".pth", ".bin")):
                    from siss_tpu.models.resnet import load_torch_resnet

                    clf_params = load_torch_resnet(ckpt_path, clf_model)
                else:
                    clf_params = CheckpointManager(os.path.dirname(ckpt_path)).restore(
                        ckpt_path, clf_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 1))))
                inception = InceptionScore(
                    Classifier(lambda p, x: clf_model.apply(p, x, train=False), clf_params),
                    remove_class=int(cfg.deletion.class_label))
            except Exception as e:
                print(f"[delete_tshirt] inception classifier unavailable ({e}); IS disabled")
                inception = None

        deletion_steps_logged = False
        ckpt = CheckpointManager(str(cfg.output_dir), cfg.get("checkpoints_total_limit"),
                                 async_save=bool(cfg.get("async_checkpointing", False)))

        def log_metrics(step, prev_step=None):
            # inner step_frequency gates fire on boundary crossings in
            # (prev_step, step]; with steps_per_call>1 the visited step is
            # generally not itself a multiple (ADVICE r3)
            if prev_step is None:
                prev_step = step - 1
            nonlocal deletion_steps_logged
            eval_params = state.ema.params if state.ema is not None else state.params
            imgs = evaluator.sample_images(eval_params, int(cfg.eval_images), set_generator=True)
            tracker.log_images("Sampled Images", Evaluator.make_grid_from_images(imgs[:64]), step=step)
            freq, _ = TShirtClassifier.get_tshirt_frequency(imgs, tshirt_img)
            m = {"metrics/deletion_class_fraction": freq}
            if freq == 0.0 and not deletion_steps_logged:
                tracker.log_summary("deletion_steps", step)  # reference :492-498
                deletion_steps_logged = True
            if likelihood is not None and boundary_crossed(prev_step, step, likelihood_cfg.step_frequency):
                forget_img = jnp.asarray(dataset_deletion[0])[None]
                bpd, _, nfe = likelihood.evaluate_likelihood(eval_params, forget_img)
                m["metrics/likelihood"] = float(np.asarray(bpd).mean())
            if membership is not None and boundary_crossed(prev_step, step, membership_cfg.step_frequency):
                for t, (a, d) in zip(membership_cfg.timesteps,
                                     membership.compute_membership_losses(eval_params, [int(t) for t in membership_cfg.timesteps])):
                    m[f"membership_loss/all_t={t}"] = a
                    m[f"membership_loss/deletion_t={t}"] = d
                    m[f"membership_loss/ratio_t={t}"] = d / a if a else float("nan")
            if inception is not None and boundary_crossed(prev_step, step, is_cfg.step_frequency):
                n = int(is_cfg.num_imgs_to_generate)
                done = imgs
                while len(done) < n:
                    done = np.concatenate([done, evaluator.sample_images(eval_params, int(is_cfg.batch_size))])
                inception.update(done[:n])
                mean, std = inception.compute()
                m["metrics/is_mean"], m["metrics/is_std"] = mean, std
            tracker.log(m, step=step)

        # ---- mid-run resume (reference has it commented out for tshirt;
        # kept here for preemptible TPU runs)
        start_step = 0
        if cfg.get("resume_from_checkpoint"):
            rpath = str(cfg.resume_from_checkpoint)
            state = ckpt.restore_item("latest" if rpath == "latest" else rpath, "state", state)
            from siss_tpu.parallel import shard_state

            # restored leaves come back committed to the template
            # leaves' (mixed) devices; re-place consistently on the mesh
            state = shard_state(state, mesh)
            start_step = int(state.step)
            # fast-forward the data streams to the same sample offset at
            # the SAMPLER level (indices only — no image loads, so resume
            # cost doesn't grow with prior data volume): each optimizer
            # step consumed `accum` microbatches from each loader
            keep_loader.skip_batches = start_step * accum
            forget_loader.skip_batches = start_step * accum
            for _ in range(start_step):
                key, _ = jax.random.split(key)
            print(f"[delete_tshirt] resumed from step {start_step}")

        # ---- training loop
        superfactor = cfg.deletion.loss_params.get("superfactor") if cfg.deletion.get("loss_params") else None
        decay = cfg.deletion.get("superfactor_decay")
        if superfactor is not None and decay:
            superfactor = float(superfactor) * float(decay) ** (start_step * accum)
        if start_step == 0:
            log_metrics(0)

        # K optimizer steps per dispatched program (same mechanism as the
        # pretrain task's steps_per_call; +11% there at tiny-model scale).
        # Kept at 1 when superfactor is configured — its per-microbatch
        # host-side decay varies across the fold.
        steps_per_call = max(int(cfg.get("steps_per_call", 1) or 1), 1)
        if superfactor is not None and steps_per_call > 1:
            print("[delete_tshirt] steps_per_call>1 incompatible with "
                  "superfactor decay; running per-step")
            steps_per_call = 1
        if steps_per_call > 1:
            from siss_tpu.parallel import global_folded_microbatches_from_local
            from siss_tpu.train import fold_steps

            multi_fn = jax.jit(fold_steps(lambda st, b, k: raw_step(st, b, k, {})),
                              donate_argnums=0)

        guard = PreemptionGuard().install()
        t_last = time.time()
        global_step = start_step
        while global_step < training_steps:
            if guard.should_stop:
                ckpt.save_bundle(global_step, {
                    "state": state, "unet": state.params,
                    "unet_ema": state.ema.params if state.ema is not None else None,
                })
                print(f"[preemption] saved checkpoint-{global_step}; exiting")
                break
            if steps_per_call == 1:
                key, step_key = jax.random.split(key)
                batch = global_microbatches_from_local(next(stream), mesh)
                # per-microbatch decay inside the accumulation loop
                # (reference ``delete_tshirt.py`` analog of ``:658-662``)
                dyn = {}
                if superfactor is not None:
                    d = float(decay) if decay else 1.0
                    dyn = {"superfactor": jnp.asarray(
                        [float(superfactor) * d**i for i in range(accum)], jnp.float32)}
                state, metrics = step_fn(state, batch, step_key, dyn)
                if superfactor is not None and decay:
                    superfactor = float(superfactor) * float(decay) ** accum
                    metrics["superfactor"] = superfactor
                k_done = 1
                per_step_metrics = [metrics]
            else:
                k_done = min(steps_per_call, training_steps - global_step)
                batches = global_folded_microbatches_from_local(
                    jax.tree.map(lambda *xs: np.stack(xs),
                                 *[next(stream) for _ in range(k_done)]), mesh)
                # one key split per optimizer step — the SAME chain cadence
                # as the unfolded loop, so folded runs are bitwise-identical
                # to per-step runs and resume fast-forward (one split per
                # completed step) stays exact for any steps_per_call
                step_keys = []
                for _ in range(k_done):
                    key, sk = jax.random.split(key)
                    step_keys.append(sk)
                state, metrics = multi_fn(state, batches, jnp.stack(step_keys))
                # metrics leaves are stacked [K]; log each step's own row
                per_step_metrics = [
                    jax.tree.map(lambda m, i=i: m[i], metrics) for i in range(k_done)
                ]
            dt = time.time() - t_last
            t_last = time.time()
            for i, m in enumerate(per_step_metrics):
                m["images_per_sec"] = k_done * bs * accum / dt
                tracker.log(m, step=global_step + i + 1)
            prev_step, global_step = global_step, global_step + k_done
            fired = lambda every: boundary_crossed(prev_step, global_step, every)  # noqa: E731
            if int(cfg.sampling_steps) and fired(cfg.sampling_steps):
                log_metrics(global_step, prev_step)
            if cfg.get("checkpointing_steps") and fired(cfg.checkpointing_steps):
                ckpt.save_bundle(global_step, {
                    "state": state, "unet": state.params,
                    "unet_ema": state.ema.params if state.ema is not None else None,
                })

        if not guard.should_stop:
            ckpt.save_bundle(training_steps, {
                "state": state, "unet": state.params,
                "unet_ema": state.ema.params if state.ema is not None else None,
            })
        ckpt.wait()  # drain async checkpoint writes before exit
        tracker.finish()
