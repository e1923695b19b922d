"""scp manifest generation from dataset directory trees.

Replaces the reference's four near-identical generator scripts
(data/create_scp/create_scp_{wsjmin_8k_min,libri_8k,wham_8k,whamr_8k}.py):
walk the dataset root, write ``<filename> <abs-path>`` lines per partition
and signal role.

Dataset layouts (as produced by the official corpus creation tools):

  wsj0-2mix:  <root>/wav8k/min/{tr,cv,tt}/{mix,s1,s2}/*.wav
  wham:       <root>/wav8k/min/{tr,cv,tt}/{mix_both,s1,s2,noise}/*.wav
  whamr:      <root>/wav8k/min/{tr,cv,tt}/{mix_both_reverb,s1_anechoic,
              s2_anechoic,s1_reverb,s2_reverb,noise}/*.wav
  libri2mix:  <root>/wav8k/min/{train-*,dev,test}/{mix_clean,s1,s2}/*.wav

Usage: ``python -m sepreformer_tpu.data.create_scp --dataset wsj0-2mix
--root /data/wsj0-mix --out data/scp_ss_8k``
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, List, Tuple

_PART_NAMES = {"tr": "tr", "cv": "cv", "tt": "tt"}

# dataset -> {partition_dir: [(subdir, scp_suffix), ...]}
_LAYOUTS: Dict[str, Dict[str, List[Tuple[str, str]]]] = {
    "wsj0-2mix": {
        p: [("mix", "mix"), ("s1", "s1"), ("s2", "s2")] for p in ("tr", "cv", "tt")
    },
    "wham": {
        p: [("mix_both", "mix"), ("s1", "s1"), ("s2", "s2"), ("noise", "n")]
        for p in ("tr", "cv", "tt")
    },
    "whamr": {
        p: [
            ("mix_both_reverb", "mix"),
            ("s1_anechoic", "s1"),
            ("s2_anechoic", "s2"),
            ("s1_reverb", "s1_reverb"),
            ("s2_reverb", "s2_reverb"),
            ("noise", "n"),
        ]
        for p in ("tr", "cv", "tt")
    },
    "libri2mix": {
        p: [("mix_clean", "mix"), ("s1", "s1"), ("s2", "s2")]
        for p in ("tr", "cv", "tt")
    },
}


def list_wavs(directory: str) -> List[str]:
    out = []
    for root, _, files in os.walk(directory):
        for name in files:
            if name.lower().endswith(".wav"):
                out.append(os.path.join(root, name))
    return sorted(out)


def write_scp(wavs: List[str], scp_path: str) -> int:
    os.makedirs(os.path.dirname(scp_path) or ".", exist_ok=True)
    with open(scp_path, "w") as f:
        for path in wavs:
            key = os.path.splitext(os.path.basename(path))[0]
            f.write(f"{key} {os.path.abspath(path)}\n")
    return len(wavs)


def generate(dataset: str, root: str, out_dir: str,
             subset: str = "wav8k/min") -> Dict[str, int]:
    if dataset not in _LAYOUTS:
        raise ValueError(f"unknown dataset {dataset!r}; one of {sorted(_LAYOUTS)}")
    counts = {}
    for part, roles in _LAYOUTS[dataset].items():
        for subdir, suffix in roles:
            src = os.path.join(root, subset, part, subdir)
            if not os.path.isdir(src):
                continue
            scp = os.path.join(out_dir, f"{part}_{suffix}.scp")
            counts[f"{part}_{suffix}"] = write_scp(list_wavs(src), scp)
    return counts


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--dataset", required=True, choices=sorted(_LAYOUTS))
    p.add_argument("--root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--subset", default="wav8k/min")
    args = p.parse_args(argv)
    counts = generate(args.dataset, args.root, args.out, args.subset)
    for name, n in sorted(counts.items()):
        print(f"{name}.scp: {n} utterances")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
