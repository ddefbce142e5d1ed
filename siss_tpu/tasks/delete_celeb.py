"""CelebA-HQ-256 celebrity unlearning task (``delete_celeb.py:72-876``).

Unlearns specific JPEGs from the pretrained google/ddpm-celebahq-256 model
(weights imported via ``scripts/convert_hf_checkpoint.py``). Preserves the
reference's distinctive behaviors: the forget stream is a ``RepeatedSampler``
sized exactly ``training_steps × accum × bs`` (``:278``), timesteps are
fixed at 999 (``:593-598``, a config knob here), the loop runs
``training_steps × len(img_name)`` optimizer steps (``:557``), and metrics
include sampled grids, deletion-class fraction with a steps-to-deletion
summary, denoising injections from the noised target at t=250
(``:404-436``), NLL on the forget image, membership loss, IS, and FID.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from siss_tpu.config import to_dict
from siss_tpu.data import BatchLoader, InfiniteSampler, RepeatedSampler, dual_stream
from siss_tpu.diffusion.schedule import q_sample
from siss_tpu.diffusion.sde import VPSDE
from siss_tpu.evaluate import Evaluator
from siss_tpu.metrics import MembershipLoss
from siss_tpu.metrics.likelihood import LikelihoodEvaluator
from siss_tpu.parallel import shard_params_fsdp
from siss_tpu.tasks.base import Task, boundary_crossed
from siss_tpu.train import DeletionStepConfig, TrainState, build_deletion_train_step
from siss_tpu.train.optim import build_optimizer
from siss_tpu.utils import CheckpointManager
from siss_tpu.utils.preemption import PreemptionGuard


class DeleteCeleb(Task):
    def run(self) -> None:
        cfg = self.cfg
        tracker = self.make_tracker()
        mesh = self.make_mesh()
        key = jax.random.PRNGKey(int(cfg.random_seed))

        dataset_all = self.build_dataset(cfg.dataset_all)
        dataset_deletion = self.build_dataset(cfg.dataset_deletion)
        model, ucfg = self.build_unet()
        schedule = self.build_schedule()

        # ---- pretrained start: converted HF params (orbax) or a bundle
        key, init_key = jax.random.split(key)
        params = model.init_params(init_key)
        path = str(cfg.checkpoint_path)
        if os.path.isdir(os.path.join(path, "unet")) or path.endswith("latest"):
            root, leaf = os.path.split(path.rstrip("/"))
            mgr = CheckpointManager(root if leaf == "latest" else os.path.dirname(path) or ".")
            params = mgr.restore_item("latest" if leaf == "latest" else path,
                                      str(cfg.subfolders.get("unet", "unet") if cfg.get("subfolders") else "unet"),
                                      params)
        elif os.path.exists(path):
            import orbax.checkpoint as ocp

            with ocp.StandardCheckpointer() as ckptr:
                params = ckptr.restore(os.path.abspath(path), params)
        else:
            print(f"[delete_celeb] WARNING: no pretrained weights at {path}; "
                  "using random init (convert google/ddpm-celebahq-256 with "
                  "scripts/convert_hf_checkpoint.py for real runs)")
        params = shard_params_fsdp(params, mesh)

        def eps_apply(p, x, t, cond):
            return model.apply({"params": p}, x, t)

        # ---- step
        n_forget = len(cfg.deletion.img_name)
        training_steps = int(cfg.training_steps) * n_forget  # reference :557
        tx = build_optimizer(cfg.optimizer, str(cfg.lr_scheduler),
                             int(cfg.lr_warmup_steps), training_steps)
        accum = int(cfg.gradient_accumulation_steps)
        bs = int(cfg.train_batch_size)
        step_cfg = DeletionStepConfig(
            loss_fn=str(cfg.deletion.loss_fn),
            loss_params=tuple(sorted(to_dict(cfg.deletion.get("loss_params") or {}).items())),
            scaling_norm=float(cfg.deletion.get("scaling_norm", 1.0)),
            eta=float(cfg.deletion.get("eta", 1e-3)),
            grad_accum_steps=accum,
            t_min=int(cfg.deletion.get("t_min", 999)),
            t_max=int(cfg.deletion.get("t_max", 1000)),
            use_ema=bool(cfg.ema.use_ema),
            batched_dual_backward=bool(cfg.deletion.get("batched_dual_backward", False)),
            grad_accum_dtype=str(cfg.deletion.get("grad_accum_dtype", "float32")),
            param_cast_dtype=cfg.deletion.get("param_cast_dtype"),
            fused_surgery=bool(cfg.deletion.get("fused_surgery", True)),
        )
        raw_step = build_deletion_train_step(eps_apply, schedule, tx, step_cfg)
        # donate the carried TrainState so params/opt-state update in place
        # (halves peak state memory; matters at SD/celeb scale)
        step_fn = jax.jit(raw_step, donate_argnums=0)
        state = TrainState.create(params, tx, use_ema=step_cfg.use_ema)

        # ---- streams: infinite keep; repeated forget sized for the run (:278).
        # Each process loads only its rank's stripe of the global batch
        # (reference rank/num_replicas DDP contract, infinite_sampler.py:5-13)
        # and the slices are stitched into one globally-sharded array.
        from siss_tpu.parallel import global_microbatches_from_local, process_batch_slice

        bs_local = process_batch_slice(bs)
        keep_sampler = InfiniteSampler(len(dataset_all), rank=jax.process_index(),
                                       num_replicas=jax.process_count(),
                                       seed=int(cfg.random_seed))
        keep_loader = BatchLoader(dataset_all, keep_sampler, bs_local)
        forget_sampler = RepeatedSampler(len(dataset_deletion), training_steps * accum * bs_local)
        forget_loader = BatchLoader(dataset_deletion, forget_sampler, bs_local)
        stream = dual_stream(iter(keep_loader), iter(forget_loader), accum)

        evaluator = Evaluator(eps_apply, schedule,
                              (ucfg.sample_size, ucfg.sample_size, ucfg.in_channels),
                              num_inference_steps=int(cfg.pipeline.num_inference_steps),
                              random_seed=int(cfg.random_seed),
                              solver=str(cfg.pipeline.get("solver", "ddpm")),
                              injection_steps=int(cfg.pipeline.get("injection_steps", 10)),
                              mesh=mesh)

        metrics_cfg = cfg.get("metrics") or {}
        inj_cfg = metrics_cfg.get("denoising_injections")
        target_image = None
        if inj_cfg:
            from PIL import Image

            img = np.asarray(Image.open(str(inj_cfg.img_path)), np.float32) / 255.0
            target_image = jnp.asarray(img * 2.0 - 1.0)
            if target_image.ndim == 2:
                target_image = target_image[..., None]

        likelihood_cfg = metrics_cfg.get("likelihood")
        likelihood = LikelihoodEvaluator(eps_apply, VPSDE(), schedule=schedule) if likelihood_cfg else None

        membership_cfg = metrics_cfg.get("membership_loss")
        membership = None
        if membership_cfg:
            mc = membership_cfg.class_cfg
            membership = MembershipLoss(eps_apply, schedule, dataset_all, dataset_deletion,
                                        int(mc.num_image_samples), int(mc.num_noise_samples),
                                        int(mc.eval_batch_size), seed=int(cfg.random_seed))
            membership.sample_images()
            membership.sample_noises(jax.random.PRNGKey(int(cfg.random_seed)))

        fid_cfg = metrics_cfg.get("fid")
        fid_eval = None
        if fid_cfg:
            from siss_tpu.metrics.inception_v3 import build_fid_evaluator

            fid_eval = build_fid_evaluator(to_dict(fid_cfg.class_cfg), dataset_all)

        # optional image classifier for deletion-class fraction (the shipped
        # celeb config disables it, reference parity; wired when provided)
        classifier = None
        if metrics_cfg.get("classifier_cfg"):
            from siss_tpu.config.core import get_object
            from siss_tpu.metrics import Classifier

            clf_cfg = metrics_cfg.classifier_cfg
            try:
                arch_fn = get_object(str(clf_cfg.classifier_arch))
                clf_model = arch_fn(**to_dict(clf_cfg.get("classifier_args") or {}))
                ckpt_path = str(clf_cfg.classifier_ckpt)
                if ckpt_path.endswith((".pt", ".pth", ".bin")):
                    from siss_tpu.models.resnet import load_torch_resnet

                    clf_params = load_torch_resnet(ckpt_path, clf_model)
                else:
                    clf_params = CheckpointManager(os.path.dirname(ckpt_path)).restore(
                        ckpt_path,
                        clf_model.init(jax.random.PRNGKey(0),
                                       jnp.zeros((1, ucfg.sample_size, ucfg.sample_size, ucfg.in_channels))))
                classifier = Classifier(lambda p, x: clf_model.apply(p, x, train=False), clf_params)
            except Exception as e:
                print(f"[delete_celeb] classifier unavailable ({e}); fraction metric disabled")

        deletion_tracker = {"reached": False, "step": None}

        def evaluate_unlearning_timestep(eval_params, timestep, clean_image, n, ekey):
            """Denoising injections (``:404-436``): noise the target to t,
            reverse-diffuse, return [0,1] images."""
            noise = jax.random.normal(ekey, (n, *clean_image.shape))
            ts = jnp.full((n,), timestep)
            noisy = q_sample(schedule, jnp.broadcast_to(clean_image, (n, *clean_image.shape)), noise, ts)
            return evaluator.denoise_images(eval_params, noisy, int(timestep))

        def log_metrics(step, prev_step=None):
            # prev_step: the step count at the previous metrics visit; the
            # inner step_frequency gates fire when a multiple was crossed in
            # (prev_step, step] — with steps_per_call>1 the visited step is
            # generally NOT itself a multiple (ADVICE r3)
            if prev_step is None:
                prev_step = step - 1
            eval_params = state.ema.params if state.ema is not None else state.params
            m = {}
            imgs = evaluator.sample_images(eval_params, int(cfg.eval_batch_size), set_generator=True)
            tracker.log_images("Sampled Images", Evaluator.make_grid_from_images(imgs), step=step)
            if metrics_cfg.get("fraction_deletion") and classifier is not None:
                frac = classifier.compute_class_frequency(imgs, int(cfg.deletion.get("class_label", 0)))
                m["metrics/deletion_class_fraction"] = frac
                if frac == 0.0 and not deletion_tracker["reached"]:
                    deletion_tracker.update(reached=True, step=step)
                    tracker.log_summary("deletion_steps", step)  # reference :492-498
            if inj_cfg is not None:
                gen = evaluate_unlearning_timestep(
                    eval_params, int(inj_cfg.timestep), target_image,
                    int(cfg.eval_batch_size), jax.random.PRNGKey(int(cfg.random_seed)))
                tracker.log_images(f"Target Image Generations (t={int(inj_cfg.timestep)})",
                                   Evaluator.make_grid_from_images(gen), step=step)
            if likelihood is not None and boundary_crossed(prev_step, step, likelihood_cfg.step_frequency):
                bpd, _, _ = likelihood.evaluate_likelihood(eval_params, target_image[None])
                m["metrics/likelihood"] = float(np.asarray(bpd)[0])
            if membership is not None and boundary_crossed(prev_step, step, membership_cfg.step_frequency):
                ts = [int(t) for t in membership_cfg.timesteps]
                for t, (a, d) in zip(ts, membership.compute_membership_losses(eval_params, ts)):
                    m[f"membership_loss/all_membership_loss_t={t}"] = a
                    m[f"membership_loss/deletion_membership_loss_t={t}"] = d
                    m[f"membership_loss/membership_ratio_t={t}"] = d / a if a else float("nan")
            if fid_eval is not None and boundary_crossed(prev_step, step, fid_cfg.step_frequency):
                n = int(fid_cfg.num_imgs_to_generate)
                batch_n = int(fid_cfg.batch_size)
                done = 0
                while done < n:
                    fid_eval.update(evaluator.sample_images(eval_params, min(batch_n, n - done)))
                    done += batch_n
                fid, secs = fid_eval.compute()
                # metrics/fid only with real InceptionV3 features; the
                # weight-less fallback logs metrics/fid_rand (not comparable)
                m[fid_eval.metric_key] = fid
            if m:
                tracker.log(m, step=step)

        ckpt = CheckpointManager(str(cfg.output_dir), cfg.get("checkpoints_total_limit"),
                                 async_save=bool(cfg.get("async_checkpointing", False)))

        # ---- mid-run resume (the reference left this commented out for
        # celeb/tshirt; we support it for preemptible TPU runs)
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
            # the SAMPLER level (indices only — no image decodes, so resume
            # cost doesn't grow with prior data volume): each optimizer
            # step consumed `accum` microbatches from each loader
            keep_loader.skip_batches = start_step * accum
            forget_loader.skip_batches = start_step * accum
            for _ in range(start_step):
                key, _ = jax.random.split(key)
            print(f"[delete_celeb] resumed from step {start_step}")

        # per-microbatch superfactor decay (``delete_celeb.py:658-662``:
        # decays inside the accumulation loop, once per logged microbatch)
        superfactor = None
        decay = cfg.deletion.get("superfactor_decay")
        if cfg.deletion.get("loss_params") and cfg.deletion.loss_params.get("superfactor") is not None:
            superfactor = float(cfg.deletion.loss_params.superfactor)
            if decay:
                superfactor *= float(decay) ** (start_step * accum)

        if start_step == 0:
            log_metrics(0)

        # K optimizer steps per dispatched program — the mechanism bench.py
        # measures (52.0 → 54.2 img/s at K=4, celeb scale): per-step math is
        # identical, only the host dispatch is amortized. Guarded off when
        # superfactor decay is configured (its per-microbatch host-side
        # schedule varies across the fold), same as delete_tshirt.
        steps_per_call = max(int(cfg.get("steps_per_call", 1) or 1), 1)
        if superfactor is not None and steps_per_call > 1:
            print("[delete_celeb] steps_per_call>1 incompatible with "
                  "superfactor; running per-step")
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
                dyn = {}
                superfactor_logged = superfactor
                if superfactor is not None:
                    d = float(decay) if decay else 1.0
                    dyn = {"superfactor": jnp.asarray(
                        [superfactor * d**i for i in range(accum)], jnp.float32)}
                    superfactor *= d**accum
                state, metrics = step_fn(state, batch, step_key, dyn)
                if superfactor_logged is not None:
                    # pre-decay value (the one used for this step's first
                    # microbatch) — matches the reference's per-microbatch
                    # telemetry cadence (delete_celeb.py:658-663)
                    metrics["superfactor"] = superfactor_logged
                k_done = 1
                per_step_metrics = [metrics]
            else:
                k_done = min(steps_per_call, training_steps - global_step)
                batches = global_folded_microbatches_from_local(
                    jax.tree.map(lambda *xs: np.stack(xs),
                                 *[next(stream) for _ in range(k_done)]), mesh)
                # one split per optimizer step — same chain cadence as the
                # unfolded loop (exact resume for any steps_per_call)
                step_keys = []
                for _ in range(k_done):
                    key, sk = jax.random.split(key)
                    step_keys.append(sk)
                state, metrics = multi_fn(state, batches, jnp.stack(step_keys))
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
