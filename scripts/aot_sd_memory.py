#!/usr/bin/env python
"""AOT per-chip memory analysis for the reference-exact fp32 DeleteSD step
under FSDP sharding (VERDICT r4 #6).

BASELINE.md previously *asserted from arithmetic* that the reference-exact
fp32 training state (~17.2G: fp32 params + fp32 Adam moments + the
surgery's two fp32 gradient accumulators) does not fit one v5e (15.75G)
but shards onto >=2 chips over the ``fsdp`` mesh axis. This script
replaces the arithmetic with XLA's own numbers: it AOT-compiles the exact
jitted SISS surgery step (SD-1.x conditional UNet, t==999, scaling_norm
750, remat on, einsum attention — the ``config/delete_sd.yaml`` workload,
reference shape ``/root/reference/config/delete_sd.yaml:89-90``) for a
``data=1 x fsdp=N`` mesh of N virtual CPU devices and reports
``compiled.memory_analysis()`` — argument/temp/output/alias bytes of the
per-device SPMD module. Nothing is materialized: lowering happens on
``jax.ShapeDtypeStruct``s carrying the same NamedShardings the task would
use (``siss_tpu.parallel.shard_state``).

Caveat recorded with the numbers: this compiles the XLA:CPU backend, so
temp-buffer sizes reflect CPU layout/fusion choices, not the TPU
compiler's exact padding — argument/output sizes (the dominant, static
part: the sharded state) are layout-independent and exact.

Usage:
    python scripts/aot_sd_memory.py --fsdp 2 --accum 8
    python scripts/aot_sd_memory.py --fsdp 4 --accum 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("XLA_FLAGS", "")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--fsdp", type=int, default=2)
    p.add_argument("--data", type=int, default=1)
    p.add_argument("--per-dev-batch", type=int, default=1,
                   help="microbatch per device; global microbatch = this x "
                        "data x fsdp (the task's global_bs rule)")
    p.add_argument("--accum", type=int, default=8,
                   help="grad-accum steps; keep per_dev*data*fsdp*accum = 16 "
                        "for the reference-exact effective batch")
    p.add_argument("--variant", default="sd_v1", choices=("sd_v1", "tiny"))
    p.add_argument("--optimizer", default="adamw", choices=("adamw", "adafactor"))
    args = p.parse_args()

    n_dev = args.data * args.fsdp
    if f"host_platform_device_count" not in os.environ["XLA_FLAGS"]:
        os.environ["XLA_FLAGS"] += f" --xla_force_host_platform_device_count={n_dev}"

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_platforms", "cpu")  # sitecustomize forces axon; env alone won't

    from siss_tpu.diffusion.sd_pipeline import sd_noise_schedule
    from siss_tpu.models.unet2d_cond import UNet2DCondition, UNet2DConditionConfig
    from siss_tpu.parallel import MeshConfig, make_mesh, microbatched_sharding
    from siss_tpu.parallel.mesh import _param_spec, _path_names
    from jax.sharding import NamedSharding
    from siss_tpu.train import DeletionStepConfig, TrainState, build_deletion_train_step

    mesh = make_mesh(MeshConfig(data=args.data, fsdp=args.fsdp, tensor=1))

    if args.variant == "tiny":
        cfg = UNet2DConditionConfig(**{**UNet2DConditionConfig.tiny().__dict__,
                                       "gradient_checkpointing": True,
                                       "attention_impl": "einsum"})
    else:
        cfg = UNet2DConditionConfig.sd_v1(gradient_checkpointing=True,
                                          attention_impl="einsum")
    model = UNet2DCondition(cfg, dtype=jnp.bfloat16)

    def eps_apply(pp, x, t, cond):
        return model.apply({"params": pp}, x.astype(jnp.bfloat16), t, cond)

    # reference-exact fp32 state: fp32 AdamW moments (delete_sd trains with
    # adam_weight_decay=1e-2, /root/reference/config/delete_sd.yaml) and
    # fp32 surgery gradient accumulators
    if args.optimizer == "adafactor":
        from siss_tpu.config.core import Config
        from siss_tpu.train.optim import build_optimizer

        tx = build_optimizer(Config({"_target_": "adafactor", "lr": 1e-5,
                                     "weight_decay": 1e-2}))
    else:
        tx = optax.adamw(1e-5, weight_decay=1e-2)
    step_cfg = DeletionStepConfig(
        loss_fn="importance_sampling_with_mixture",
        loss_params=(("lambd", 0.5),),
        scaling_norm=750.0,
        grad_accum_steps=args.accum,
        t_min=999, t_max=1000,
        grad_accum_dtype="float32",
    )
    latent_step = build_deletion_train_step(eps_apply, schedule := sd_noise_schedule(), tx, step_cfg)
    del schedule

    # Abstract state with the task's exact shardings — nothing materialized
    aparams = jax.eval_shape(model.init_params, jax.random.PRNGKey(0))
    astate = jax.eval_shape(lambda q: TrainState.create(q, tx), aparams)
    state_sds = jax.tree_util.tree_map_with_path(
        lambda path, a: jax.ShapeDtypeStruct(
            a.shape, a.dtype,
            sharding=NamedSharding(mesh, _param_spec(_path_names(path), a.shape, mesh))),
        astate)

    gbs = args.per_dev_batch * args.data * args.fsdp
    hw, ch, ctx = cfg.sample_size, cfg.in_channels, cfg.cross_attention_dim
    mb_sh = microbatched_sharding(mesh)
    batch_sds = {
        "all": jax.ShapeDtypeStruct((args.accum, gbs, hw, hw, ch), jnp.float32, sharding=mb_sh),
        "deletion": jax.ShapeDtypeStruct((args.accum, gbs, hw, hw, ch), jnp.float32, sharding=mb_sh),
        "conditioning": jax.ShapeDtypeStruct((args.accum, gbs, 77, ctx), jnp.float32, sharding=mb_sh),
    }
    k = jax.random.PRNGKey(0)
    key_sd = jax.ShapeDtypeStruct(k.shape, k.dtype)

    print(f"[aot] lowering+compiling sd step: mesh data={args.data} fsdp={args.fsdp}, "
          f"global microbatch {gbs} x accum {args.accum} "
          f"(effective {gbs * args.accum}), optimizer={args.optimizer}", file=sys.stderr)
    compiled = (jax.jit(latent_step, donate_argnums=0)
                .lower(state_sds, batch_sds, key_sd, {})
                .compile())
    ma = compiled.memory_analysis()

    gib = 1024 ** 3
    arg, out = ma.argument_size_in_bytes, ma.output_size_in_bytes
    tmp, alias = ma.temp_size_in_bytes, ma.alias_size_in_bytes
    # donated state aliases input<->output, so peak live = args + temps +
    # (outputs not aliased to an input)
    peak = arg + tmp + max(out - alias, 0)
    print(json.dumps({
        "metric": "sd_fp32_step_aot_memory",
        "mesh": {"data": args.data, "fsdp": args.fsdp},
        "per_dev_batch": args.per_dev_batch,
        "global_microbatch": gbs,
        "accum": args.accum,
        "optimizer": args.optimizer,
        "variant": args.variant,
        "per_device_bytes": {
            "argument": arg, "output": out, "temp": tmp, "alias": alias,
            "peak_estimate": peak,
        },
        "per_device_gib": {
            "argument": round(arg / gib, 3), "output": round(out / gib, 3),
            "temp": round(tmp / gib, 3), "alias": round(alias / gib, 3),
            "peak_estimate": round(peak / gib, 3),
        },
        "fits_v5e_15p75g": bool(peak / gib < 15.75),
        "backend": "cpu-aot",
        "note": "argument/output sizes are exact sharded-state bytes; temp "
                "reflects XLA:CPU buffer assignment (TPU padding may differ)",
    }))


if __name__ == "__main__":
    main()
