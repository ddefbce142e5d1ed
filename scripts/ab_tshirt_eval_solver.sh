#!/usr/bin/env bash
# A/B: DPM-Solver++(2M) fast eval vs the reference's 50-step DDPM eval on
# the LIVE tshirt unlearning workflow (VERDICT r4 next #3).
#
# Both runs share the same pretrained checkpoint, dataset, and seed, so the
# training trajectory is identical; the only difference is the sampler the
# eval harness uses to draw the 128 images scored by the t-shirt detector
# (reference eval set-point: /root/reference/config/delete_tshirt.yaml
# sampling_steps 5 / num_inference_steps 50). Quality match = same
# deletion_steps summary + overlapping deletion-fraction and NLL series.
#
# Usage: bash scripts/ab_tshirt_eval_solver.sh [workdir]
set -euo pipefail
ROOT=${1:-/tmp/ab_solver}
OUT=docs/bench/ab_tshirt_eval_solver.json
mkdir -p "$ROOT"

DATA="$ROOT/mnist_with_tshirt.npz"
[ -f "$DATA" ] || python scripts/make_tshirt_dataset.py --out "$DATA"

# ---- pretrain once (round-1 recipe: 60 epochs x 44 steps = 2640 steps)
if ! ls "$ROOT"/base/*/latest >/dev/null 2>&1; then
  python main.py --config-name=train_tshirt_mnist \
    "dataset.path=$DATA" num_epochs=60 sampling_steps=1000 \
    "output_dir=$ROOT/base"
fi
BASE=$(ls -dt "$ROOT"/base/*/ | head -1)

run_variant() {  # $1 tag, extra overrides after
  local tag=$1; shift
  python main.py --config-name=delete_tshirt \
    "dataset_all.path=$DATA" "dataset_deletion.path=$DATA" \
    "checkpoint_path=${BASE}latest" \
    "metrics.classifier.tshirt_path=$ROOT/tshirt.png" \
    "output_dir=$ROOT/$tag" "$@"
}

run_variant ddpm50
run_variant dpm10 +pipeline.solver=dpm pipeline.num_inference_steps=10

python - "$ROOT" "$OUT" <<'EOF'
import glob, json, sys
root, out = sys.argv[1], sys.argv[2]
res = {}
for tag in ("ddpm50", "dpm10"):
    run = sorted(glob.glob(f"{root}/{tag}/*/metrics.jsonl"))[-1]
    rows = [json.loads(l) for l in open(run)]
    frac = [(r["_step"], r["metrics/deletion_class_fraction"]) for r in rows
            if "metrics/deletion_class_fraction" in r]
    nll = [(r["_step"], r["metrics/likelihood"]) for r in rows
           if "metrics/likelihood" in r]
    summ = {}
    sp = run.replace("metrics.jsonl", "summary.json")
    try:
        summ = json.load(open(sp))
    except FileNotFoundError:
        pass
    res[tag] = {"deletion_fraction": frac, "nll_bits_dim": nll,
                "deletion_steps": summ.get("deletion_steps")}
json.dump(res, open(out, "w"), indent=1)
a, b = res["ddpm50"], res["dpm10"]
print(f"deletion_steps: ddpm50={a['deletion_steps']} dpm10={b['deletion_steps']}")
print("frac ddpm50:", a["deletion_fraction"][:8], "...")
print("frac dpm10 :", b["deletion_fraction"][:8], "...")
print("nll  ddpm50:", a["nll_bits_dim"])
print("nll  dpm10 :", b["nll_bits_dim"])
EOF
