"""Content fingerprint of a synthetic proxy corpus (data_synth/).

The multi-seed accuracy proxy (scripts/accuracy_proxy_multiscene.py) trains
every seed on the SAME procedural corpus; seeds are comparable only if the
corpus is bit-identical across regenerations (the corpus itself is
gitignored and does not survive sandbox resets — data/synthetic.py renders
it deterministically from scene seeds). This script hashes the ARRAY
CONTENTS (not the npz container, whose zip metadata may embed timestamps)
of every frame plus the poses/K text files, so a regenerated corpus can be
checked against the recorded digest before new seeds are added to
proxy_ms_report.json.

Usage:
  python scripts/corpus_fingerprint.py [--root data_synth] \
      [--expect docs/corpus_fingerprint.json]   # exit 1 on mismatch
  python scripts/corpus_fingerprint.py --write docs/corpus_fingerprint.json
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import json
import os
import sys

import numpy as np


def hash_corpus(root):
    """Per-scene sha256 over frame arrays + pose/K text, plus a total."""
    scenes = {}
    # train scenes live at <root>/train/<scene>/NNNNN.npz; eval scenes at
    # <root>/eval/<dataset>/<scene>/{images,depth}/NNNNN.png — identify a
    # scene dir by its poses.txt rather than by depth in the tree
    scene_dirs = sorted(
        os.path.dirname(p) for p in
        glob.glob(os.path.join(root, "**", "poses.txt"), recursive=True))
    for sd in scene_dirs:
        h = hashlib.sha256()
        for f in sorted(glob.glob(os.path.join(sd, "*.npz"))):
            with np.load(f) as z:
                for key in sorted(z.files):
                    arr = np.ascontiguousarray(z[key])
                    h.update(key.encode())
                    h.update(str(arr.dtype).encode())
                    h.update(str(arr.shape).encode())
                    h.update(arr.tobytes())
        # eval-scene pngs are lossless containers; hash their bytes
        for f in sorted(glob.glob(os.path.join(sd, "*", "*.png"))):
            h.update(os.path.relpath(f, sd).encode())
            h.update(open(f, "rb").read())
        for name in ("poses.txt", "K.txt"):
            p = os.path.join(sd, name)
            if os.path.exists(p):
                h.update(open(p, "rb").read())
        rel = os.path.relpath(sd, root)
        scenes[rel] = h.hexdigest()
    total = hashlib.sha256(
        json.dumps(scenes, sort_keys=True).encode()).hexdigest()
    return {"total": total, "scenes": scenes}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default="data_synth")
    ap.add_argument("--write", default=None,
                    help="record the digest to this json file")
    ap.add_argument("--expect", default=None,
                    help="compare against a recorded digest; exit 1 on "
                         "mismatch")
    args = ap.parse_args()

    fp = hash_corpus(args.root)
    print(json.dumps({"total": fp["total"],
                      "n_scenes": len(fp["scenes"])}))
    if args.write:
        with open(args.write, "w") as f:
            json.dump(fp, f, indent=1, sort_keys=True)
        print(f"wrote {args.write}")
    if args.expect:
        want = json.load(open(args.expect))
        if want["total"] == fp["total"]:
            print("corpus MATCHES recorded fingerprint")
            return
        bad = [s for s, d in fp["scenes"].items()
               if want["scenes"].get(s) != d]
        missing = [s for s in want["scenes"] if s not in fp["scenes"]]
        print(f"corpus MISMATCH: differing scenes {bad}, "
              f"missing {missing}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
