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


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-name", required=True, dest="config_name")
    parser.add_argument("--config-dir", default=os.path.join(os.path.dirname(__file__), "configs"))
    parser.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    parser.add_argument("--platform", default=os.environ.get("SISS_PLATFORM"),
                        help="force a jax platform (e.g. cpu); overrides any "
                             "sitecustomize plugin selection")
    args = parser.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    cfg = load_config(args.config_name, args.overrides, args.config_dir)

    # Timestamp+uuid the output dir unless resuming (``main.py:20-27``).
    if not cfg.get("resume_from_checkpoint"):
        stamp = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
        cfg.output_dir = os.path.join(str(cfg.output_dir), f"{stamp}_{uuid.uuid4().hex[:8]}")
    else:
        cfg.output_dir = os.path.dirname(str(cfg.resume_from_checkpoint))

    task_cls = get_object(str(cfg.task._target_))
    task = task_cls(cfg)
    print(f"[siss_tpu] task={task_cls.__name__} output_dir={cfg.output_dir}")
    task.run()


if __name__ == "__main__":
    main()
