"""One-command import of the reference's released PyTorch module weights
into an engine-loadable checkpoint.

The reference loads its 5 per-module torch pickles by SORTED filename order
matched to [feature_extractor, feature_shrinker, cost_volume_encoder,
lstm_fusion, cost_volume_decoder] (fusionnet/run-testing.py:29-41; pairnet
has 4 modules, no lstm). Point --weights-dir at that folder (e.g. the
GitHub release's fusionnet/weights/) and this writes a single msgpack
checkpoint consumable by `--checkpoint` on every driver.

Partial imports work: modules without a matching file keep the template
initialization (this sandbox's mount ships only 1_feature_pyramid).
The per-module mappings are oracle-tested in tests/test_mnasnet_parity.py
and tests/test_module_parity.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODULE_ORDER = [
    "feature_extractor",
    "feature_shrinker",
    "cost_volume_encoder",
    "lstm_fusion",
    "cost_volume_decoder",
]


def import_baseline(args):
    """--baseline mode: convert a baseline's released torch weights
    (mvdepthnet/gpmvs: per-module encoder/gplayer/decoder files in
    --weights-dir, matched by name; dpsnet: one whole-model file) into a
    msgpack loadable by apps/run_testing_baseline.py --checkpoint.
    Mappings oracle-tested in tests/test_baseline_convert.py."""
    from dvmvs_tpu.utils.baseline_convert import (
        convert_deltas,
        convert_dpsnet,
        convert_gplayer,
        convert_gpmvs,
        convert_mvdepthnet,
    )
    from dvmvs_tpu.utils.checkpoint import save_checkpoint
    from dvmvs_tpu.utils.torch_convert import load_torch_state_dict

    def locate(hint):
        for f in sorted(os.listdir(args.weights_dir)):
            if hint in f:
                return os.path.join(args.weights_dir, f)
        return None

    def find(hint):
        p = locate(hint)
        if p is None:
            raise FileNotFoundError(f"no '*{hint}*' file in {args.weights_dir}")
        return load_torch_state_dict(p)

    name = args.baseline
    if name == "mvdepthnet":
        variables = convert_mvdepthnet(find("encoder"), find("decoder"))
    elif name == "gpmvs":
        if locate("encoder") and locate("decoder"):
            variables = convert_gpmvs(
                find("encoder"), find("gplayer"), find("decoder"))
        else:
            # partial import: the repository ships ONLY the finetuned
            # GPlayer (encoder/decoder are gitignored release downloads,
            # gpmvs/run-testing.py:34-39) — convert the hyperparameters and
            # keep the template-initialized U-Net, mirroring the main-net
            # partial-import behavior.
            from dvmvs_tpu.baselines.gpmvs import GPMVS
            from dvmvs_tpu.utils.jax_setup import setup_jax
            setup_jax()
            model = GPMVS(seed=0)
            variables = {"encoder": model.enc_vars,
                         "decoder": model.dec_vars}
            variables.update(convert_gplayer(find("gplayer")))
            print("partial import: gplayer hyperparameters only "
                  "(U-Net left at template init)")
    elif name == "dpsnet":
        files = sorted(os.listdir(args.weights_dir))
        variables = convert_dpsnet(load_torch_state_dict(
            os.path.join(args.weights_dir, files[0])))
    elif name == "deltas":
        # one file with three state dicts (deltas/run-testing.py:103-109)
        import torch
        files = [f for f in sorted(os.listdir(args.weights_dir))
                 if not f.startswith(".")]
        raw = torch.load(os.path.join(args.weights_dir, files[0]),
                         map_location="cpu")
        variables = convert_deltas({
            k: {n: v.detach().numpy() for n, v in sd.items()}
            for k, sd in raw.items()
            if k in ("state_dict", "state_dict_tri", "state_dict_depth")})
    else:
        raise SystemExit(f"no converter for baseline '{name}'")
    save_checkpoint(args.output, variables)
    print(f"wrote {args.output} (baseline {name})")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--weights-dir", required=True,
                    help="folder with the reference's sorted per-module files")
    ap.add_argument("--model", choices=["pairnet", "fusionnet"], default="fusionnet")
    ap.add_argument("--baseline", default=None,
                    choices=["mvdepthnet", "gpmvs", "dpsnet", "deltas"],
                    help="convert a baseline's released weights instead of "
                         "the main network's")
    ap.add_argument("--output", required=True, help="output .msgpack checkpoint")
    args = ap.parse_args()

    if args.baseline:
        import_baseline(args)
        return

    from dvmvs_tpu.apps.engine import InferenceEngine
    from dvmvs_tpu.utils.checkpoint import save_checkpoint
    from dvmvs_tpu.utils.jax_setup import setup_jax
    from dvmvs_tpu.utils.torch_convert import convert_torch_checkpoints

    setup_jax()
    modules = [m for m in MODULE_ORDER
               if args.model == "fusionnet" or m != "lstm_fusion"]
    files = sorted(
        os.path.join(args.weights_dir, f)
        for f in os.listdir(args.weights_dir)
        if not f.startswith("."))
    if len(files) == len(modules):
        mapping = dict(zip(modules, files))
    else:
        # partial set: match by the conventional index prefix / name hints
        hints = {"feature_extractor": ("0", "extractor"),
                 "feature_shrinker": ("1", "pyramid", "shrinker"),
                 "cost_volume_encoder": ("2", "encoder"),
                 "lstm_fusion": ("3", "lstm"),
                 "cost_volume_decoder": ("4", "decoder")}
        mapping = {}
        for m in modules:
            for f in files:
                base = os.path.basename(f)
                if any(base.startswith(h) or h in base for h in hints[m]):
                    mapping[m] = f
                    break
        print(f"partial import: matched {sorted(mapping)} from {len(files)} files")

    engine = InferenceEngine(args.model, seed=0)
    variables = convert_torch_checkpoints(mapping, engine.variables)
    save_checkpoint(args.output, variables)
    print(f"wrote {args.output} ({len(mapping)}/{len(modules)} modules converted)")


if __name__ == "__main__":
    main()
