#!/bin/bash
# In-sandbox accuracy proxy (BASELINE.md): train pairnet (staged unfreeze)
# then fusionnet (warm-started from pairnet, 3 stages) on temporally
# disjoint hololens splits through the REAL training driver — exercising
# staged unfreeze transitions, mid-stage resume, and validation-gated
# checkpointing — then evaluate both on the held-out frames and compare
# (the reference's fusion-over-backbone claim, ~19.3% abs on ScanNet).
#
# Usage: bash scripts/accuracy_proxy.sh [output_root]
set -euo pipefail
cd "$(dirname "$0")/.."

ROOT=${1:-data_proxy}
RUNS=training-runs/proxy
RES=128   # train resolution (reference trains 256x256; 128 fits the proxy budget)
PAIR_EPOCHS=${PAIR_EPOCHS:-8}
FUSION_EPOCHS=${FUSION_EPOCHS:-8}

echo "=== 1/5 prepare splits"
python scripts/prepare_hololens_splits.py --output "$ROOT"

echo "=== 2/5 train pairnet (2-stage unfreeze; reference stage-1 = 2 epochs)"
python -m dvmvs_tpu.apps.run_training --model pairnet --dataset "$ROOT/train" \
    --image-size $RES $RES --batch-size 8 --epochs "$PAIR_EPOCHS" --seed 0 \
    --run-directory "$RUNS/pairnet" --print-frequency 20
PAIR_RUN=$(ls -td "$RUNS"/pairnet/*/ | head -1)
# model selection on VALIDATION L1: pick the saved epoch with the best
# validation among checkpoints (they are saved on any-metric improvement)
select_best() {  # args: run_dirs...; prints best checkpoint path
    python - "$@" <<'PYEOF'
import json, os, sys, glob
best = (float("inf"), None)
for run in sys.argv[1:]:
    vals = {}
    for line in open(os.path.join(run, "metrics.jsonl")):
        rec = json.loads(line)
        if rec.get("tag") == "validation":
            v = rec.get("values", rec)
            if "epoch" in v:
                vals[int(v["epoch"])] = v["l1"]
    for ck in glob.glob(os.path.join(run, "*_epoch*.msgpack")):
        e = int(ck.rsplit("epoch", 1)[1].split(".")[0])
        if e in vals and vals[e] < best[0]:
            best = (vals[e], ck)
print(best[1] or "")
PYEOF
}
PAIR_CKPT=$(select_best "$PAIR_RUN")
echo "pairnet checkpoint: $PAIR_CKPT"

echo "=== 3/5 train fusionnet stage 0+1, interrupt, then RESUME mid-run"
python -m dvmvs_tpu.apps.run_training --model fusionnet --dataset "$ROOT/train" \
    --image-size $RES $RES --batch-size 4 --subsequence-length 4 \
    --epochs 3 --seed 0 --warm-start "$PAIR_CKPT" \
    --run-directory "$RUNS/fusionnet" --print-frequency 20
FUSION_RUN=$(ls -td "$RUNS"/fusionnet/*/ | head -1)

echo "=== 4/5 resume fusionnet to completion from the saved train state"
python -m dvmvs_tpu.apps.run_training --model fusionnet --dataset "$ROOT/train" \
    --image-size $RES $RES --batch-size 4 --subsequence-length 4 \
    --epochs "$FUSION_EPOCHS" --seed 0 \
    --resume "$FUSION_RUN/fusionnet_latest.state.msgpack" \
    --run-directory "$RUNS/fusionnet_resumed" --print-frequency 20
FUSION_RUN2=$(ls -td "$RUNS"/fusionnet_resumed/*/ | head -1)
FUSION_CKPT=$(select_best "$FUSION_RUN" "$FUSION_RUN2")
echo "fusionnet checkpoint: $FUSION_CKPT"

echo "=== 5/5 evaluate both on the held-out split"
python -m dvmvs_tpu.apps.run_testing --model pairnet --data "$ROOT/eval" \
    --checkpoint "$PAIR_CKPT" --output results/proxy_pairnet
python -m dvmvs_tpu.apps.run_testing --model fusionnet --data "$ROOT/eval" \
    --checkpoint "$FUSION_CKPT" --output results/proxy_fusionnet

python - <<'EOF'
import numpy as np
p = np.load("results/proxy_pairnet/keyframe_hololens-eval_320_256_2_dvmvs_tpu_pairnet_errors_000.npz")["arr_0"]
f = np.load("results/proxy_fusionnet/keyframe_hololens-eval_320_256_2_dvmvs_tpu_fusionnet_errors_000.npz")["arr_0"]
pm, fm = np.nanmean(p, 0), np.nanmean(f, 0)
names = ["abs", "abs_rel", "abs_inv", "sq_rel", "rmse", "d1.25", "d1.25^2", "d1.25^3"]
print("held-out metrics     pairnet   fusionnet   fusion-gain")
for i, n in enumerate(names):
    sign = 1 if i < 5 else -1  # first 5: lower is better
    gain = sign * (pm[i] - fm[i]) / max(abs(pm[i]), 1e-9) * 100
    print(f"{n:>18} {pm[i]:9.4f} {fm[i]:10.4f} {gain:10.1f}%")
EOF
