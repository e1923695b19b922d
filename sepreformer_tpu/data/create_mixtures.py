"""Offline 2-speaker mixture creation (wsj0-2mix style).

Python replacement for the reference's MATLAB pipeline
(data/create_mixture_data/create_wav_2speakers.m + activlev.m from MERL):
for each line of a mixture list ``<wav1> <snr1> <wav2> <snr2>``, scale each
source so its *active speech level* sits at the requested SNR, mix, and
write min- and max-length variants.

Active level here is an energy-threshold approximation of ITU-T P.56
(activlev.m): frame the signal, keep frames within 15.9 dB (P.56 margin)
of the loudest, and use their RMS.  Mixtures made with this tool follow
the same construction but are not bit-exact with the MATLAB originals;
for benchmark parity, evaluate on the official corpora.
"""

from __future__ import annotations

import argparse
import os
from typing import Iterable, List, Tuple

import numpy as np

from sepreformer_tpu.data.audio import read_wav, write_wav


def active_level_rms(x: np.ndarray, sr: int, frame_ms: float = 20.0,
                     margin_db: float = 15.9) -> float:
    """Approximate P.56 active speech level: RMS over frames within
    ``margin_db`` of the loudest frame."""
    frame = max(1, int(sr * frame_ms / 1000.0))
    n = (len(x) // frame) * frame
    if n == 0:
        return float(np.sqrt(np.mean(np.square(x)))) or 1.0
    frames = x[:n].reshape(-1, frame)
    energy = np.mean(np.square(frames), axis=1)
    peak = energy.max()
    if peak <= 0:
        return 1.0
    active = energy >= peak * 10.0 ** (-margin_db / 10.0)
    level = np.sqrt(np.mean(energy[active]))
    return float(level) or 1.0


def mix_pair(
    s1: np.ndarray, s2: np.ndarray, snr1: float, snr2: float, sr: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Scale sources to the target SNRs (relative active levels) and mix.

    Returns (mix_min, s1_min, s2_min, mix_max, s1_max, s2_max): the min
    variant truncates to the shorter source, the max variant zero-pads to
    the longer (create_wav_2speakers.m behavior).
    """
    lev1 = active_level_rms(s1, sr)
    lev2 = active_level_rms(s2, sr)
    w1 = s1 / lev1 * 10.0 ** (snr1 / 20.0)
    w2 = s2 / lev2 * 10.0 ** (snr2 / 20.0)

    n_min = min(len(w1), len(w2))
    n_max = max(len(w1), len(w2))
    a_min, b_min = w1[:n_min], w2[:n_min]
    a_max = np.pad(w1, (0, n_max - len(w1)))
    b_max = np.pad(w2, (0, n_max - len(w2)))

    def normalize(*sigs):
        mix = sum(sigs)
        peak = max(np.abs(mix).max(), *(np.abs(s).max() for s in sigs))
        scale = 0.9 / max(peak, 1e-8)
        return tuple(s * scale for s in sigs) + (mix * scale,)

    a_min, b_min, mix_min = normalize(a_min, b_min)
    a_max, b_max, mix_max = normalize(a_max, b_max)
    return mix_min, a_min, b_min, mix_max, a_max, b_max


def parse_mix_list(path: str) -> List[Tuple[str, float, str, float]]:
    """Lines: ``<wav1> <snr1> <wav2> <snr2>`` (mix_2_spk_{tr,cv,tt}.txt)."""
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) != 4:
                continue
            rows.append((parts[0], float(parts[1]), parts[2], float(parts[3])))
    return rows


def create_mixtures(
    mix_list: str, wsj_root: str, out_root: str, sr: int = 8000,
    variants: Iterable[str] = ("min",), partition: str = "tr",
) -> int:
    rows = parse_mix_list(mix_list)
    count = 0
    for p1, snr1, p2, snr2 in rows:
        s1, _ = read_wav(os.path.join(wsj_root, p1), sr=sr)
        s2, _ = read_wav(os.path.join(wsj_root, p2), sr=sr)
        outs = mix_pair(s1, s2, snr1, snr2, sr)
        key = (
            f"{os.path.splitext(os.path.basename(p1))[0]}_{snr1:g}_"
            f"{os.path.splitext(os.path.basename(p2))[0]}_{snr2:g}"
        )
        for variant, (mix, a, b) in zip(
            ("min", "max"), [(outs[0], outs[1], outs[2]), (outs[3], outs[4], outs[5])]
        ):
            if variant not in variants:
                continue
            base = os.path.join(out_root, f"wav{sr // 1000}k", variant, partition)
            for sub, sig in (("mix", mix), ("s1", a), ("s2", b)):
                path = os.path.join(base, sub, key + ".wav")
                os.makedirs(os.path.dirname(path), exist_ok=True)
                write_wav(path, sig, sr)
        count += 1
    return count


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--mix-list", required=True,
                   help="mix_2_spk_<part>.txt file")
    p.add_argument("--wsj-root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--sr", type=int, default=8000)
    p.add_argument("--partition", default="tr")
    p.add_argument("--variants", nargs="+", default=["min"],
                   choices=["min", "max"])
    args = p.parse_args(argv)
    n = create_mixtures(args.mix_list, args.wsj_root, args.out, args.sr,
                        args.variants, args.partition)
    print(f"created {n} mixtures")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
