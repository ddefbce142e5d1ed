#!/usr/bin/env python
"""CLI driver — the reference's Hydra entry point (``main.py:1-39``)
re-implemented over siss_tpu's config system.

Usage (same surface as the reference README):
    python main.py --config-name=delete_tshirt [key=value ...]
    python main.py --config-name=delete_celeb deletion.scaling_norm=250
"""

from __future__ import annotations

import argparse
import datetime
import os
import sys
import uuid

from siss_tpu.config import get_object, load_config


def _expand_multirun(overrides):
    """Cartesian product of comma-valued overrides (the reference's forked
    hydra-sweep role, ``environment.yml:291``)."""
    import itertools

    axes = []
    for ov in overrides:
        key, _, raw = ov.partition("=")
        values = raw.split(",") if "," in raw and not raw.startswith("[") else [raw]
        axes.append([(key, v) for v in values])
    for combo in itertools.product(*axes):
        yield [f"{k}={v}" for k, v in combo]


def _run_one(config_name, overrides, config_dir, profile=False):
    cfg = load_config(config_name, overrides, config_dir)

    # Timestamp+uuid the output dir unless resuming (``main.py:20-27``).
    if not cfg.get("resume_from_checkpoint"):
        stamp = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
        cfg.output_dir = os.path.join(str(cfg.output_dir), f"{stamp}_{uuid.uuid4().hex[:8]}")
    else:
        cfg.output_dir = os.path.dirname(str(cfg.resume_from_checkpoint))

    task_cls = get_object(str(cfg.task._target_))
    task = task_cls(cfg)
    print(f"[siss_tpu] task={task_cls.__name__} output_dir={cfg.output_dir}")
    if profile:
        import jax

        os.makedirs(cfg.output_dir, exist_ok=True)
        with jax.profiler.trace(os.path.join(str(cfg.output_dir), "profile")):
            task.run()
    else:
        task.run()


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-name", required=True, dest="config_name")
    parser.add_argument("--config-dir", default=os.path.join(os.path.dirname(__file__), "configs"))
    parser.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    parser.add_argument("--platform", default=os.environ.get("SISS_PLATFORM"),
                        help="force a jax platform (e.g. cpu); overrides any "
                             "sitecustomize plugin selection")
    parser.add_argument("--multirun", "-m", action="store_true",
                        help="sweep: comma-separated override values expand to "
                             "a cartesian product of runs")
    parser.add_argument("--profile", action="store_true",
                        help="capture a jax.profiler trace under output_dir/profile")
    args = parser.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # Persistent XLA compilation cache: repeated runs of the same config
    # (sweeps, resume, eval re-runs) skip the multi-minute first compile.
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("SISS_COMPILE_CACHE", "/tmp/siss_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from siss_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()

    if args.multirun:
        for i, ovs in enumerate(_expand_multirun(args.overrides)):
            print(f"[siss_tpu] multirun job {i}: {ovs}")
            _run_one(args.config_name, ovs, args.config_dir, args.profile)
    else:
        _run_one(args.config_name, args.overrides, args.config_dir, args.profile)


if __name__ == "__main__":
    main()
