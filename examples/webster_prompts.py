#!/usr/bin/env python
"""Select memorized SD prompts from a Webster et al. parquet — script
equivalent of ``notebooks/webster_prompts.ipynb``: filter the extraction
parquet for strongly-memorized captions and emit the
original/modified-prompts JSON files ``delete_sd.fill_cfg`` reads.

  python examples/webster_prompts.py --parquet groundtruth.parquet \
      --name sylvester_stallone --out-dir data/datasets
"""

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--parquet", required=True)
    p.add_argument("--name", required=True, help="subject key, e.g. sylvester_stallone")
    p.add_argument("--caption-col", default="caption")
    p.add_argument("--score-col", default="sscd_score")
    p.add_argument("--min-score", type=float, default=0.5)
    p.add_argument("--out-dir", default="data/datasets")
    args = p.parse_args()

    import pandas as pd

    df = pd.read_parquet(args.parquet)
    if args.score_col in df.columns:
        df = df[df[args.score_col] >= args.min_score]
    captions = df[args.caption_col].dropna().tolist()
    if not captions:
        raise SystemExit("no memorized captions found")
    original = captions[0]
    # crude "modified" neighbour: drop the last token (reference uses
    # hand-edited variants; see config/delete_sd.yaml comments)
    modified = " ".join(original.split()[:-1])

    os.makedirs(args.out_dir, exist_ok=True)
    for fname, value in [("original_prompts.json", original), ("modified_prompts.json", modified)]:
        path = os.path.join(args.out_dir, fname)
        data = {}
        if os.path.exists(path):
            data = json.load(open(path))
        data[args.name] = value
        json.dump(data, open(path, "w"), indent=2)
        print(f"updated {path}: {args.name} -> {value[:60]}...")


if __name__ == "__main__":
    main()
