"""Optimizer / LR-schedule builders from the config surface.

Maps the reference's torch optimizer configs (AdamW with betas/eps/wd,
``config/delete_celeb.yaml:127-134``) and Accelerate LR schedules
("constant"/"cosine" with warmup, ``config/train_tshirt_mnist.yaml:60-63``)
onto optax.
"""

from __future__ import annotations

from typing import Any, Optional

import optax


def build_lr_schedule(name: str, base_lr: float, warmup_steps: int = 0,
                      total_steps: Optional[int] = None):
    name = (name or "constant").lower()
    if name == "constant":
        sched = optax.constant_schedule(base_lr)
    elif name == "cosine":
        decay_steps = max((total_steps or 10000) - warmup_steps, 1)
        sched = optax.cosine_decay_schedule(base_lr, decay_steps)
    elif name == "linear":
        decay_steps = max((total_steps or 10000) - warmup_steps, 1)
        sched = optax.linear_schedule(base_lr, 0.0, decay_steps)
    else:
        raise ValueError(f"Unknown lr_scheduler {name!r}")
    if warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, base_lr, warmup_steps)
        sched = optax.join_schedules([warmup, sched], [warmup_steps])
    return sched


def cast_nu_dtype(tx: optax.GradientTransformation, nu_dtype) -> optax.GradientTransformation:
    """Store Adam's second moment in ``nu_dtype`` (e.g. bfloat16, whose
    exponent range matches fp32 — only mantissa precision is traded).
    optax exposes ``mu_dtype`` natively but not ``nu_dtype``; this wrapper
    casts ν down after every update. Part of the single-chip SD
    memory-efficient mode (saves another 1.7G for SD-1.x; BASELINE.md)."""
    import jax
    import jax.numpy as jnp

    nu_dtype = jnp.dtype(nu_dtype)

    def _cast(state):
        def down(s):
            if hasattr(s, "nu"):
                return s._replace(nu=jax.tree.map(lambda x: x.astype(nu_dtype), s.nu))
            return s
        return jax.tree_util.tree_map(down, state,
                                      is_leaf=lambda s: hasattr(s, "nu"))

    def init(params):
        return _cast(tx.init(params))

    def update(updates, state, params=None):
        updates, state = tx.update(updates, state, params)
        return updates, _cast(state)

    return optax.GradientTransformation(init, update)


def _add_lr_scaled_decay(wd: float, sched) -> optax.GradientTransformation:
    """AdamW-semantics decoupled weight decay for a hand-built chain:
    adds ``lr_t · wd · p`` to the (already lr-scaled, pre-sign-flip)
    update. ``optax.add_decayed_weights`` cannot express the per-step lr
    factor, and optax.adafactor's own ``weight_decay_rate`` is an
    absolute decay applied after lr scaling (ADVICE round-4 medium)."""
    import jax
    import jax.numpy as jnp

    def init_fn(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("weight decay requires params")
        lr = sched(state.count)
        updates = jax.tree.map(lambda u, p: u + lr * wd * p, updates, params)
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def _keys(cfg) -> set:
    try:
        return set(cfg.keys())
    except Exception:
        return set()


def build_optimizer(cfg: Any, lr_scheduler: str = "constant", warmup_steps: int = 0,
                    total_steps: Optional[int] = None) -> optax.GradientTransformation:
    """``cfg``: config node with keys mirroring torch.optim.AdamW
    (lr, betas, weight_decay, eps). ``_target_`` is accepted and mapped."""
    target = str(cfg.get("_target_", "torch.optim.AdamW")) if hasattr(cfg, "get") else "torch.optim.AdamW"
    lr = float(cfg["lr"]) if hasattr(cfg, "__getitem__") else float(cfg.lr)
    betas = cfg.get("betas", [0.9, 0.999])
    wd = float(cfg.get("weight_decay", 0.0))
    eps = float(cfg.get("eps", cfg.get("adam_epsilon", 1e-8)))
    # mu_dtype=bfloat16 halves the first-moment memory (part of the
    # single-chip SD memory-efficient mode; see BASELINE.md)
    import jax.numpy as jnp

    mu_dtype = cfg.get("mu_dtype", None)
    mu_dtype = jnp.dtype(str(mu_dtype)) if mu_dtype else None
    nu_dtype = cfg.get("nu_dtype", None)
    sched = build_lr_schedule(lr_scheduler, lr, warmup_steps, total_steps)
    name = target.rsplit(".", 1)[-1].lower()
    if name in ("adamw",):
        tx = optax.adamw(sched, b1=float(betas[0]), b2=float(betas[1]), eps=eps,
                         weight_decay=wd, mu_dtype=mu_dtype)
        return cast_nu_dtype(tx, str(nu_dtype)) if nu_dtype else tx
    if name in ("adam",):
        tx = optax.adam(sched, b1=float(betas[0]), b2=float(betas[1]), eps=eps,
                        mu_dtype=mu_dtype)
        return cast_nu_dtype(tx, str(nu_dtype)) if nu_dtype else tx
    if name in ("adafactor",):
        # TPU memory-lean option (T5X-style): factored second moments store
        # O(rows+cols) per matrix instead of O(rows*cols), and momentum is
        # off by default — for SD-1.x this replaces ~6.9G of fp32 Adam state
        # with a few MB, unlocking microbatch>1 on a single v5e (BASELINE.md
        # round-4 SD table). Not a reference optimizer (delete_*.yaml all
        # ship torch.optim.AdamW) — opt-in via `optimizer._target_:
        # adafactor`. `multiply_by_parameter_scale` defaults OFF so the
        # update magnitude stays lr-scaled like the AdamW it substitutes.
        if mu_dtype or nu_dtype:
            raise ValueError("mu_dtype/nu_dtype are Adam-state options; "
                             "adafactor's factored state is already small — "
                             "remove them or switch the optimizer target")
        # Compose the chain by hand instead of calling optax.adafactor:
        # optax applies `weight_decay_rate` AFTER lr scaling, as an
        # absolute per-step decay fraction (wd=1e-2 would shrink every
        # param 1%/step — ~1e5x the AdamW decay this target substitutes
        # for at the reference's lr=1e-5). AdamW semantics put the decay
        # term *inside* the final -lr*(update + wd*param) scaling; build
        # that ordering explicitly so a `weight_decay` carried over from
        # an AdamW config means the same thing here.
        txs = [optax.scale_by_factored_rms(
            factored=True,
            decay_rate=float(cfg.get("decay_rate", 0.8)),
            # adafactor's eps regularizes the RMS, not the denominator —
            # Adam's 1e-8 default would swamp it, so only honour an
            # explicitly-set value
            epsilon=float(cfg.get("eps", 1e-30)) if "eps" in _keys(cfg) else 1e-30,
        ), optax.clip_by_block_rms(1.0)]
        if bool(cfg.get("multiply_by_parameter_scale", False)):
            txs.append(optax.scale_by_param_block_rms())
        # lr BEFORE momentum, matching optax.adafactor's ordering: under a
        # warmup/decay schedule the EMA must smooth lr-scaled updates, not
        # accumulate full-magnitude directions that a later lr multiply
        # would shrink. (flip_sign happens in the final scale(-1.0).)
        txs.append(optax.scale_by_schedule(sched))
        momentum = cfg.get("momentum", None)
        if momentum is not None:
            txs.append(optax.ema(float(momentum), debias=False))
        if wd:
            # AdamW-style decoupled decay, lr-scaled per step and OUTSIDE
            # the momentum EMA (like torch AdamW): update += lr_t·wd·p.
            # With momentum=None this is identical to the previous
            # add_decayed_weights-then-scale_by_learning_rate chain.
            txs.append(_add_lr_scaled_decay(wd, sched))
        txs.append(optax.scale(-1.0))
        return optax.chain(*txs)
    if name in ("sgd",):
        if mu_dtype or nu_dtype:
            raise ValueError("mu_dtype/nu_dtype are Adam-state options; "
                             "they have no effect with SGD — remove them "
                             "or switch the optimizer target")
        return optax.sgd(sched, momentum=float(cfg.get("momentum", 0.0)))
    raise ValueError(f"Unsupported optimizer target {target!r}")
