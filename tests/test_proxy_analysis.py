"""Statistical-analysis script correctness (scripts/proxy_ms_analysis.py):
exact tests, asymmetric-run-dir handling, and the BASELINE.md drift check
(VERDICT r4 task 8 + advisor r4 findings 2-4)."""

import importlib.util
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mod():
    spec = importlib.util.spec_from_file_location(
        "proxy_ms_analysis",
        os.path.join(REPO, "scripts", "proxy_ms_analysis.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_permutation_and_sign_tests_exact():
    m = _mod()
    # all-same-sign deltas: two-sided exact p = 2 * (1/2^n)
    d = np.ones(8)
    assert abs(m.paired_permutation_p(d) - 2 / 2 ** 8) < 1e-12
    assert abs(m.sign_test_p(8, 0) - 2 / 2 ** 8) < 1e-12
    # perfectly balanced: p = 1
    assert m.sign_test_p(4, 4) == 1.0
    # empty: degenerate p = 1
    assert m.paired_permutation_p(np.array([])) == 1.0
    # NaNs are dropped, not propagated
    assert np.isfinite(m.paired_permutation_p(np.array([1.0, np.nan, 2.0])))


def _write_scene(root, seed, kind, scene, arr):
    d = os.path.join(root, f"seed{seed}", kind)
    os.makedirs(d, exist_ok=True)
    np.savez(os.path.join(d, f"errors_{scene}.npz"), arr_0=arr)


def test_load_seed_intersects_asymmetric_scene_sets(tmp_path):
    """A scene evaluated for one model only must be dropped, not crash the
    table (advisor r4 #3); a single-keyframe scene must not inject NaN
    into the stability appendix (advisor r4 #2)."""
    m = _mod()
    rng = np.random.RandomState(0)
    root = str(tmp_path)
    _write_scene(root, 0, "pairnet", "000", rng.rand(5, 8))
    _write_scene(root, 0, "fusionnet", "000", rng.rand(5, 8))
    _write_scene(root, 0, "pairnet", "001", rng.rand(4, 8))  # pairnet-only
    _write_scene(root, 0, "pairnet", "002", rng.rand(1, 8))  # 1 keyframe
    _write_scene(root, 0, "fusionnet", "002", rng.rand(1, 8))
    data = m.load_seed(os.path.join(root, "seed0"))
    assert sorted(data["pairnet"]) == ["000", "002"]
    assert sorted(data["fusionnet"]) == ["000", "002"]

    # full script end-to-end on the tiny fixture: no crash, no NaN rows
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "proxy_ms_analysis.py"),
         "--root", root],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert "nan" not in r.stdout.lower()


def test_check_mode_detects_drift(tmp_path):
    """--check must fail when BASELINE.md's table numbers do not match the
    recomputed per-seed means, and pass when they do."""
    m = _mod()
    pair = np.tile(np.arange(8, dtype=float) + 1.0, (2, 1))
    fus = pair * 0.5

    good = "\n".join(
        f"| {m.BASELINE_ROW_NAMES[name][0]} | "
        f"{pair[:, i].mean():.4f}±{pair[:, i].std():.4f} | "
        f"**{fus[:, i].mean():.4f}±{fus[:, i].std():.4f}** | x |"
        for i, name in enumerate(m.METRICS)
        if name in m.BASELINE_ROW_NAMES)
    p_good = tmp_path / "BASELINE_good.md"
    p_good.write_text(good + "\n")
    m.check_baseline_md(pair, fus, path=str(p_good))  # must not raise

    bad = good.replace(f"{pair[:, 0].mean():.4f}", "9.9999")
    p_bad = tmp_path / "BASELINE_bad.md"
    p_bad.write_text(bad + "\n")
    with pytest.raises(SystemExit):
        m.check_baseline_md(pair, fus, path=str(p_bad))


@pytest.mark.heavy
@pytest.mark.skipif(
    not os.path.isdir(os.path.join(REPO, "results", "proxy_ms")),
    reason="no proxy results on this machine")
def test_baseline_md_matches_recorded_results():
    """The shipped BASELINE.md table must match the per-keyframe npz
    artifacts it cites (regenerate via scripts/proxy_ms_analysis.py
    --markdown docs/proxy_ms_analysis.md after adding seeds)."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "proxy_ms_analysis.py"), "--check"],
        capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0, r.stdout + r.stderr
