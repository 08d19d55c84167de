"""Multi-scene, multi-seed accuracy proxy: the statistically meaningful
version of scripts/accuracy_proxy.sh (round-2 verdict: one hololens scene
is noise-dominated — run B had pairnet beating fusionnet on 4/6 metrics).

Pipeline per seed:
  1. (once) generate a procedural corpus (data/synthetic.py): N train
     scenes + val scenes + HELD-OUT eval scenes with exact GT, plus
     keyframe index files for the eval scenes (reference heuristic).
  2. train pairnet on the reference 2-stage schedule.
  3. train fusionnet warm-started from the best-val pairnet checkpoint,
     3-stage schedule (reference fusionnet/run-training.py:118-181).
  4. evaluate BOTH on the held-out eval scenes through the real offline
     driver; collect the 8 reference metrics.
Finally aggregate across seeds: mean +/- std of each metric per model and
the fusion-vs-backbone delta with its sign consistency — the reference's
headline claim is fusion -19.3% abs over the pairnet backbone (poster).

Usage:
  python scripts/accuracy_proxy_multiscene.py --seeds 0 1 2 \
      [--root data_synth] [--res 256] [--subseq 8] \
      [--pair-batch 14] [--fusion-batch 4] [--epochs 6]
  python scripts/accuracy_proxy_multiscene.py --report-only   # re-aggregate
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import signal
import subprocess
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

METRIC_NAMES = ["abs", "abs_rel", "abs_inv", "sq_rel", "rmse",
                "d<1.25", "d<1.25^2", "d<1.25^3"]
LOWER_BETTER = [True] * 5 + [False] * 3

# the remote-TPU relay occasionally drops an RPC mid-flight and JAX blocks
# forever on the reply (observed: 2h+ silent hang mid-epoch). Every child
# process is therefore run under an output-staleness watchdog: no stdout for
# STALE_SECS -> kill -9 the child and retry, resuming training from the
# latest full-state checkpoint. Normal silent windows (validation pass +
# state serialization) are < 10 min; 15 min is comfortably above them.
STALE_SECS = int(os.environ.get("PROXY_STALE_SECS", "900"))

# children write through a pipe now; force line-visible output so the
# staleness watchdog never mistakes python block-buffering for a hang
CHILD_ENV = {**os.environ, "PYTHONUNBUFFERED": "1"}


def run(cmd, **kw):
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=REPO, env=CHILD_ENV, **kw)


def tpu_alive(probe_timeout=90):
    """The relay TPU goes down for stretches (observed: jax.devices() itself
    blocks forever). Probe it in a bounded subprocess."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(len(jax.devices()))"],
            timeout=probe_timeout, capture_output=True, env=CHILD_ENV)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def wait_for_tpu():
    waited = 0
    while not tpu_alive():
        print(f"TPU relay unreachable (waited {waited}s); retrying in 120s",
              flush=True)
        time.sleep(120)
        waited += 120
    if waited:
        print(f"TPU relay back after {waited}s", flush=True)


def run_watchdog(cmd, stale_secs=STALE_SECS):
    """Run cmd streaming its output; kill it if output stalls. Returns
    (returncode, stalled: bool)."""
    print("+", " ".join(cmd), flush=True)
    proc = subprocess.Popen(cmd, cwd=REPO, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True,
                            start_new_session=True, env=CHILD_ENV)
    last = [time.time()]

    def pump():
        for line in proc.stdout:
            sys.stdout.write(line)
            sys.stdout.flush()
            last[0] = time.time()

    t = threading.Thread(target=pump, daemon=True)
    t.start()
    while True:
        rc = proc.poll()
        if rc is not None:
            t.join(timeout=10)
            return rc, False
        if time.time() - last[0] > stale_secs:
            print(f"\nWATCHDOG: no output for {stale_secs}s, killing pid "
                  f"{proc.pid}", flush=True)
            try:  # kill the whole session (child may have forked helpers)
                os.killpg(proc.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                proc.kill()
            proc.wait()
            return -9, True
        time.sleep(20)


def latest_state(parent_dir, kind):
    """Newest RESUMABLE full-state checkpoint under parent_dir/*/: the
    checkpoint writer is atomic (state then meta, run_training.py), so a
    state without a loadable meta means a kill landed between the two
    replaces — fall back to the next-newest pair."""
    paths = glob.glob(os.path.join(
        parent_dir, "*", f"{kind}_latest.state.msgpack"))
    for p in sorted(paths, key=os.path.getmtime, reverse=True):
        try:
            json.load(open(p + ".meta.json"))
            return p
        except (OSError, ValueError) as e:
            print(f"skipping unreadable checkpoint meta {p}: {e}", flush=True)
    return None


def train_resilient(kind, parent_dir, base_cmd, target_epochs,
                    max_failures=5):
    """Run a training command to completion, resuming from the latest
    full-state checkpoint after a watchdog kill (or any crash). Watchdog
    stalls are environment flakes (relay outage) and don't count against
    max_failures — each retry is gated on the relay being reachable."""
    failures = 0
    while failures < max_failures:
        wait_for_tpu()
        cmd = list(base_cmd)
        st = latest_state(os.path.join(REPO, parent_dir), kind)
        if st:
            meta = json.load(open(st + ".meta.json"))
            if meta["epoch"] >= target_epochs:
                print(f"{kind}: already trained to epoch {meta['epoch']}, "
                      f"skipping", flush=True)
                return
            cmd += ["--resume", os.path.relpath(st, REPO)]
        rc, stalled = run_watchdog(cmd)
        if rc == 0:
            return
        if not stalled:
            failures += 1
        print(f"{kind}: attempt exited rc={rc} (stalled={stalled}, "
              f"failures={failures}); retrying with resume", flush=True)
        time.sleep(30)
    raise RuntimeError(f"{kind} training failed {max_failures}x")


def eval_resilient(cmd, max_attempts=4):
    for attempt in range(max_attempts):
        wait_for_tpu()
        rc, stalled = run_watchdog(cmd)
        if rc == 0:
            return
        print(f"eval attempt {attempt} rc={rc} stalled={stalled}; retrying",
              flush=True)
        time.sleep(30)
    raise RuntimeError(f"eval failed after {max_attempts} attempts")


def select_best(run_dirs):
    """Best-validation-L1 checkpoint across run directories (same logic as
    accuracy_proxy.sh)."""
    best = (float("inf"), None)
    for rd in run_dirs:
        vals = {}
        metrics = os.path.join(rd, "metrics.jsonl")
        if not os.path.exists(metrics):
            continue
        for line in open(metrics):
            rec = json.loads(line)
            if rec.get("tag") == "validation":
                v = rec.get("values", rec)
                if "epoch" in v:
                    vals[int(v["epoch"])] = v["l1"]
        for ck in glob.glob(os.path.join(rd, "*_epoch*.msgpack")):
            e = int(ck.rsplit("epoch", 1)[1].split(".")[0])
            if e in vals and vals[e] < best[0]:
                best = (vals[e], ck)
    return best[1]


def eval_metrics(result_dir):
    """Mean of the 8 metrics over every *errors*.npz in result_dir."""
    rows = []
    for f in sorted(glob.glob(os.path.join(result_dir, "*errors*.npz"))):
        rows.append(np.load(f)["arr_0"])
    if not rows:
        raise FileNotFoundError(f"no errors npz under {result_dir}")
    return np.nanmean(np.concatenate(rows, 0), 0)


def train_and_eval_seed(args, seed):
    runs = os.path.join("training-runs", "proxy_ms", f"seed{seed}")
    res_root = os.path.join("results", "proxy_ms", f"seed{seed}")
    summary = os.path.join(res_root, "summary.json")
    if os.path.exists(summary):
        print(f"seed {seed}: summary exists, skipping", flush=True)
        return json.load(open(summary))
    common = ["--dataset", os.path.join(args.root, "train"),
              "--image-size", str(args.res), str(args.res),
              "--seed", str(seed), "--print-frequency", "25",
              "--finetune-epochs", str(args.finetune_epochs),
              # uint8 wire format: ~3.6x less host->device traffic — the
              # relay tunnel's upload bandwidth dominates step time here
              "--wire-compact"]
    if args.max_steps is not None:
        # single-core hosts: cap optimizer steps/epoch so a multi-seed run
        # fits a wall-clock budget (epoch shuffling still varies samples)
        common += ["--max-steps", str(args.max_steps)]

    train_resilient(
        "pairnet", os.path.join(runs, "pairnet"),
        [sys.executable, "-m", "dvmvs_tpu.apps.run_training",
         "--model", "pairnet", "--batch-size", str(args.pair_batch),
         "--epochs", str(args.epochs),
         "--run-directory", os.path.join(runs, "pairnet")] + common,
        target_epochs=args.epochs)
    pair_ckpt = select_best(glob.glob(os.path.join(runs, "pairnet", "*")))
    print("pairnet checkpoint:", pair_ckpt, flush=True)

    # fusionnet gets its own (longer) epoch budget: its natural epoch is
    # ~4x smaller than pairnet's (subsequences vs pairs — 32 steps vs 100+
    # at the corpus defaults), and each stage-unfreeze transition shocks
    # the loss (fresh Adam moments); the final full-unfreeze stage needs
    # room to recover or the best-val selection degenerates to the
    # barely-trained epoch-0 checkpoint
    fusion_epochs = (args.fusion_epochs if args.fusion_epochs is not None
                     else args.epochs)
    train_resilient(
        "fusionnet", os.path.join(runs, "fusionnet"),
        [sys.executable, "-m", "dvmvs_tpu.apps.run_training",
         "--model", "fusionnet", "--batch-size", str(args.fusion_batch),
         "--subsequence-length", str(args.subseq),
         "--epochs", str(fusion_epochs), "--warm-start", pair_ckpt,
         "--run-directory", os.path.join(runs, "fusionnet")] + common,
        target_epochs=fusion_epochs)
    fusion_ckpt = select_best(glob.glob(os.path.join(runs, "fusionnet", "*")))
    print("fusionnet checkpoint:", fusion_ckpt, flush=True)

    out = {}
    for kind, ckpt in (("pairnet", pair_ckpt), ("fusionnet", fusion_ckpt)):
        rd = os.path.join(res_root, kind)
        eval_resilient(
            [sys.executable, "-m", "dvmvs_tpu.apps.run_testing",
             "--model", kind, "--data", os.path.join(args.root, "eval"),
             "--checkpoint", ckpt, "--output", rd])
        out[kind] = eval_metrics(rd).tolist()
    with open(os.path.join(res_root, "summary.json"), "w") as f:
        json.dump(out, f)
    return out


def report(seeds):
    per_seed = []
    for seed in seeds:
        p = os.path.join(REPO, "results", "proxy_ms", f"seed{seed}",
                         "summary.json")
        if not os.path.exists(p):
            print(f"seed {seed}: no summary yet ({p})")
            continue
        per_seed.append((seed, json.load(open(p))))
    if not per_seed:
        return
    # persist the raw per-seed table outside the gitignored results/ tree so
    # a completed run survives sandbox resets (BASELINE.md cites this file).
    # REPO-anchored (children run with cwd=REPO; the report must match) and
    # MERGED with any previously recorded seeds so a later --report-only run
    # over a subset never clobbers a complete table (round-3 advisor finding)
    report_path = os.path.join(REPO, "proxy_ms_report.json")
    merged = {}
    if os.path.exists(report_path):
        try:
            merged = json.load(open(report_path)).get("seeds", {})
        except ValueError:
            pass
    merged.update({str(s): v for s, v in per_seed})
    with open(report_path, "w") as f:
        json.dump({"metrics": METRIC_NAMES, "seeds": merged}, f, indent=1)
    per_seed = sorted(((int(s), v) for s, v in merged.items()))
    pair = np.array([s["pairnet"] for _, s in per_seed])
    fusion = np.array([s["fusionnet"] for _, s in per_seed])
    print(f"\n=== multi-scene proxy, {len(per_seed)} seed(s) "
          f"{[s for s, _ in per_seed]} (held-out synthetic scenes) ===")
    print(f"{'metric':>10} {'pairnet':>16} {'fusionnet':>16} "
          f"{'fusion-gain':>12} {'sign-consistent':>16}")
    for i, name in enumerate(METRIC_NAMES):
        pm, ps = pair[:, i].mean(), pair[:, i].std()
        fm, fs = fusion[:, i].mean(), fusion[:, i].std()
        sign = 1.0 if LOWER_BETTER[i] else -1.0
        # gain of the POOLED means — a mean of per-seed ratios is dominated
        # by whichever seed has the smallest denominator (see
        # scripts/proxy_ms_analysis.py for the full paired statistics)
        gain = sign * (pm - fm) / max(abs(pm), 1e-9) * 100
        deltas = sign * (pair[:, i] - fusion[:, i])
        consistent = np.all(deltas > 0) or np.all(deltas < 0)
        print(f"{name:>10} {pm:8.4f}+-{ps:6.4f} {fm:8.4f}+-{fs:6.4f} "
              f"{gain:10.1f}% {str(bool(consistent)):>16}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default="data_synth")
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--subseq", type=int, default=8)
    ap.add_argument("--pair-batch", type=int, default=14)
    ap.add_argument("--fusion-batch", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--fusion-epochs", type=int, default=None,
                    help="fusionnet epoch budget (default: --epochs); its "
                         "natural epochs are ~4x smaller than pairnet's")
    ap.add_argument("--max-steps", type=int, default=None,
                    help="cap optimizer steps per epoch (wall-clock budget)")
    ap.add_argument("--finetune-epochs", type=int, default=2,
                    help="epochs per non-final unfreeze stage; keep "
                         "epochs > finetune_epochs*(n_stages-1) so the "
                         "full-unfreeze stage actually runs")
    # corpus defaults = the EXACT config of the recorded round-4 run
    # (verified: eval keyframe counts 30/30/28 and fusionnet's 32
    # steps/epoch at B=4 are reproduced only by 8 train + 2 val scenes at
    # 120 frames, seed base 100). The corpus is gitignored; regeneration
    # must be bit-identical for new seeds to be comparable with
    # proxy_ms_report.json — check with scripts/corpus_fingerprint.py
    # --expect docs/corpus_fingerprint.json before adding seeds.
    ap.add_argument("--train-scenes", type=int, default=8)
    ap.add_argument("--val-scenes", type=int, default=2)
    ap.add_argument("--eval-scenes", type=int, default=3)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--report-only", action="store_true")
    args = ap.parse_args()

    if args.report_only:
        report(args.seeds)
        return

    if not os.path.exists(os.path.join(args.root, "train", "train.txt")):
        run([sys.executable, "scripts/make_synth_scenes.py",
             "--output", args.root,
             "--train-scenes", str(args.train_scenes),
             "--val-scenes", str(args.val_scenes),
             "--eval-scenes", str(args.eval_scenes),
             "--frames", str(args.frames)])
        run([sys.executable, "-m", "dvmvs_tpu.apps.simulate_keyframe_buffer",
             "--dataset", os.path.join(args.root, "eval", "synth-eval"),
             "--output", os.path.join(args.root, "eval", "indices"),
             "--nmeas", "2"])
    # the corpus is gitignored and regenerated after sandbox resets; new
    # seeds are only comparable with proxy_ms_report.json's recorded ones
    # if regeneration was bit-identical — verify against the pinned digest
    fp = os.path.join(REPO, "docs", "corpus_fingerprint.json")
    if args.root == "data_synth" and os.path.exists(fp):
        run([sys.executable, "scripts/corpus_fingerprint.py",
             "--root", args.root, "--expect", fp])

    for seed in args.seeds:
        print(f"\n########## seed {seed} ##########", flush=True)
        train_and_eval_seed(args, seed)
    report(args.seeds)


if __name__ == "__main__":
    main()
