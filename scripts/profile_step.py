#!/usr/bin/env python
"""Capture + summarize a jax.profiler trace of the SISS train step.

Usage:
    python scripts/profile_step.py --batch-size 16 --accum 1 --steps 3
    python scripts/profile_step.py --summarize /tmp/siss_trace   # re-summarize

Writes the raw trace under --out (tensorboard-compatible) and prints a
per-HLO-category decomposition plus the slowest fusions with achieved
TF/s and GB/s — the workflow behind BASELINE.md's roofline analysis.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import sys


def capture(args) -> str:
    sys.path.insert(0, ".")
    import jax

    import bench

    if args.workload == "sd":
        step, state, batch = bench.build_sd(
            args.batch_size, args.accum, remat=args.remat, memory_efficient=True,
            attention_impl=args.attention_impl,
            remat_attention=not args.no_remat_attention)
    else:
        step, state, batch, _ = bench.build(args.batch_size, args.accum,
                                            args.image_size, args.remat)
    key = jax.random.PRNGKey(0)
    state, _ = step(state, batch, key, {})
    jax.block_until_ready(state.params)
    jax.profiler.start_trace(args.out)
    for i in range(args.steps):
        state, _ = step(state, batch, jax.random.fold_in(key, i), {})
    jax.block_until_ready(state.params)
    jax.profiler.stop_trace()
    return args.out


def summarize(trace_dir: str, steps: int | None, top: int = 25) -> None:
    path = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        data = json.load(f)
    events = data["traceEvents"]
    pids, tids = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pids[e["pid"]] = e["args"].get("name", "")
            if e.get("name") == "thread_name":
                tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
    if steps is None:
        # infer the captured step count from the device 'Steps' track;
        # auxiliary micro-programs (key folds, transfers) also appear there,
        # so count only entries comparable to the longest one
        durs = [e["dur"] for e in events
                if e.get("ph") == "X" and "dur" in e
                and tids.get((e["pid"], e["tid"])) == "Steps"
                and "TPU" in pids.get(e["pid"], "")]
        steps = max(1, sum(1 for d in durs if d > 0.1 * max(durs))) if durs else 1
        print(f"(inferred {steps} steps from the trace)")
    cat = collections.Counter()
    ops = collections.defaultdict(lambda: [0.0, 0, 0])
    for e in events:
        if (e.get("ph") == "X" and "dur" in e
                and "TPU" in pids.get(e["pid"], "")
                and "XLA Ops" in tids.get((e["pid"], e["tid"]), "")):
            a = e.get("args") or {}
            cat[a.get("hlo_category", "?")] += e["dur"]
            op = (a.get("tf_op", "?")).replace("jit(step)/while/body/closed_call/", "")[:90]
            v = ops[op]
            v[0] += e["dur"]
            v[1] += int(a.get("model_flops", 0) or 0)
            v[2] += int(a.get("raw_bytes_accessed", 0) or 0)
    total = sum(cat.values()) / steps
    print(f"per-step device time {total / 1e6:.4f}s")
    print("\nby hlo_category (per step):")
    for k, v in cat.most_common():
        print(f"  {k:25s} {v / steps / 1e6:8.4f}s")
    print(f"\ntop {top} ops by time:")
    print(f"{'ms/step':>9} {'TF/s':>7} {'GB/s':>6}  op")
    for op, (d, f, b) in sorted(ops.items(), key=lambda kv: -kv[1][0])[:top]:
        tf = f / (d / 1e6) / 1e12 if d else 0.0
        gb = b / (d / 1e6) / 1e9 if d else 0.0
        print(f"{d / steps / 1e3:9.3f} {tf:7.1f} {gb:6.0f}  {op}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--accum", type=int, default=1)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--workload", choices=("celeb", "sd"), default="celeb")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--attention-impl", default="auto",
                   choices=("auto", "einsum", "flash"))
    p.add_argument("--no-remat-attention", action="store_true")
    p.add_argument("--steps", type=int, default=None,
                   help="capture: number of steps (default 3); summarize: "
                        "override the trace-inferred step count")
    p.add_argument("--out", default="/tmp/siss_trace")
    p.add_argument("--summarize", default=None,
                   help="skip capture; summarize an existing trace dir")
    args = p.parse_args()
    if args.summarize:
        # steps inferred from the trace unless given explicitly
        summarize(args.summarize, args.steps)
    else:
        args.steps = args.steps or 3
        summarize(capture(args), args.steps)


if __name__ == "__main__":
    main()
