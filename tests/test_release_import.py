"""Release-layout import round trip through the ACTUAL CLI.

The reference's released weights are a directory of per-module torch
pickles loaded by sorted-filename order (fusionnet/run-testing.py:31-41;
naming written by dvmvs/utils.py:294-305:
``<idx>_<name>_checkpoint.pth.tar_epoch:N_l1:..._...``), plus one release
file per baseline (e.g. deltas/run-testing.py:103-109: a single pickle with
three state dicts). The real files cannot transit this sandbox (zero
egress), so these tests synthesize a release directory with the exact file
NAMING and state_dict KEY SPACE — from the same torch replicas that proved
the converters' numerics (test_mnasnet_parity / test_module_parity /
test_baseline_convert) — and drive ``scripts/import_torch_weights.py``
end-to-end: CLI -> msgpack -> loadable values that match the torch source.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
import torch
import torch.nn as nn

import flax.serialization

pytestmark = pytest.mark.heavy

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "import_torch_weights.py")

# the reference's loss-encoded checkpoint filename suffix (utils.py:294-305)
SUFFIX = ("_checkpoint.pth.tar_epoch:15"
          "_l1:0.0600_l1-inv:0.0300_l1-rel:0.0300_huber:0.0100")


def run_cli(*argv):
    env = {**os.environ, "DVMVS_FORCE_CPU": "1",
           "XLA_FLAGS": (os.environ.get("XLA_FLAGS", "")
                         + " --xla_backend_optimization_level=1").strip()}
    r = subprocess.run([sys.executable, SCRIPT, *argv],
                       capture_output=True, text=True, env=env, cwd=REPO)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    return r.stdout


def restore(path):
    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())


def test_main_release_dir_roundtrip(tmp_path, rng):
    """5-module release dir (the fusionnet release layout) -> one msgpack
    the drivers load with --checkpoint."""
    from test_mnasnet_parity import TorchFPN, TorchFeatureExtractor
    from test_module_parity import TorchDecoder, TorchEncoder

    wdir = tmp_path / "weights"
    wdir.mkdir()
    lstm_conv = nn.Conv2d(1024, 2048, 3, padding=1, bias=False)
    modules = [
        ("0_feature_extractor", TorchFeatureExtractor().state_dict()),
        ("1_feature_pyramid", TorchFPN().state_dict()),
        ("2_encoder", TorchEncoder().state_dict()),
        ("3_lstm_fusion", {"lstm_cell.conv.weight": lstm_conv.weight.detach()}),
        ("4_decoder", TorchDecoder().state_dict()),
    ]
    for name, sd in modules:
        torch.save(sd, wdir / (name + SUFFIX))

    out = tmp_path / "fusionnet_release.msgpack"
    stdout = run_cli("--weights-dir", str(wdir), "--model", "fusionnet",
                     "--output", str(out))
    assert "5/5 modules converted" in stdout
    variables = restore(str(out))
    # values actually came from the torch files (OIHW -> HWIO)
    got = variables["params"]["lstm_fusion"]["lstm_cell"]["conv"]["kernel"]
    want = lstm_conv.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(np.asarray(got), want)
    dec_sd = dict(modules[4][1])
    got = variables["params"]["cost_volume_decoder"]["decoder_block1"][
        "convolution1"]["conv"]["kernel"]
    want = dec_sd["decoder_block1.convolution1.0.weight"].numpy().transpose(
        2, 3, 1, 0)
    np.testing.assert_array_equal(np.asarray(got), want)


def _write_mvdepth_release(wdir, rng):
    from test_baseline_convert import TorchMVDDecoder, TorchMVDEncoder
    torch.save(TorchMVDEncoder().state_dict(),
               wdir / "finetuned_mvdepthnet_encoder")
    torch.save(TorchMVDDecoder().state_dict(),
               wdir / "finetuned_mvdepthnet_decoder")


def _write_gpmvs_release(wdir, rng):
    from test_baseline_convert import TorchMVDDecoder, TorchMVDEncoder
    torch.save(TorchMVDEncoder().state_dict(), wdir / "finetuned_gpmvs_encoder")
    torch.save(TorchMVDDecoder().state_dict(), wdir / "finetuned_gpmvs_decoder")
    # gplayer: log-space scalars (reference gplayer.py:29-31)
    torch.save({"gamma2": torch.tensor([0.1]), "ell": torch.tensor([-0.3]),
                "sigma2": torch.tensor([-2.0])}, wdir / "finetuned_gpmvs_gplayer")


def _write_dpsnet_release(wdir, rng):
    from test_baseline_convert import TorchPSNetTail, _randomize_bn
    model = TorchPSNetTail().eval()
    _randomize_bn(model, rng)
    torch.save(model.state_dict(), wdir / "dpsnet_model_best.pth.tar")


def _write_deltas_release(wdir, rng):
    from test_baseline_convert import _deltas_weights
    _, _, weights = _deltas_weights(rng)
    torch.save({k: {n: torch.tensor(v) for n, v in sd.items()}
                for k, sd in weights.items()}, wdir / "deltas_release.pth.tar")


@pytest.mark.parametrize("name,writer", [
    ("mvdepthnet", _write_mvdepth_release),
    ("gpmvs", _write_gpmvs_release),
    ("dpsnet", _write_dpsnet_release),
    ("deltas", _write_deltas_release),
])
def test_baseline_release_import_roundtrip(tmp_path, rng, name, writer):
    wdir = tmp_path / name
    wdir.mkdir()
    writer(wdir, rng)
    out = tmp_path / f"{name}_release.msgpack"
    stdout = run_cli("--weights-dir", str(wdir), "--baseline", name,
                     "--output", str(out))
    assert f"wrote {out}" in stdout
    variables = restore(str(out))
    if name == "gpmvs":
        # hyperparameters stored exp()'d exactly once + shared U-Net present
        assert np.isclose(float(np.asarray(variables["gamma2"])), np.e ** 0.1)
        assert "encoder" in variables and "decoder" in variables
    elif name == "mvdepthnet":
        assert "encoder" in variables and "decoder" in variables
    else:
        assert "params" in variables and len(variables["params"]) > 0
