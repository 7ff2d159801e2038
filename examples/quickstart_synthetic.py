"""Quickstart: train vits_tpu end-to-end on a synthetic 2-speaker corpus.

Generates harmonic "speech" with per-speaker f0 (120 / 200 Hz), trains for
`--epochs` epochs on the local accelerator, then synthesizes both speakers
and verifies the learned pitch identity and PITS scope-shift control.

    python examples/quickstart_synthetic.py --workdir /tmp/vits_quickstart --epochs 500

On one TPU v5e chip, 500 epochs (2000 steps) take a few minutes after
compile and reach val mel-L1 ~0.25 with audibly speaker-distinct pitch.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import scipy.io.wavfile
import yaml

# allow running as a plain script from the repo root without pip install -e
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(workdir: str, n_utts: int = 64, sr: int = 22050):
    os.makedirs(workdir, exist_ok=True)
    rng = np.random.default_rng(0)
    f0s = {0: 120.0, 1: 200.0}
    text = "ni→xɑʊ↓↑ ni→xɑʊ↓↑"
    lang = " ".join(["0"] * len(text))
    lines = []
    for i in range(n_utts):
        spk = i % 2
        n = int(1.5 * sr)
        tgrid = np.arange(n) / sr
        f0 = f0s[spk] * (1 + 0.1 * np.sin(2 * np.pi * 0.7 * tgrid + i))
        phase = 2 * np.pi * np.cumsum(f0) / sr
        sig = 0.4 * np.sin(phase) + 0.2 * np.sin(2 * phase) + 0.1 * np.sin(3 * phase)
        env = 0.5 * (1 + np.sin(2 * np.pi * 2.5 * tgrid + i * 0.3))
        sig = sig * env + 0.01 * rng.standard_normal(n)
        path = os.path.join(workdir, f"utt{i:03d}.wav")
        scipy.io.wavfile.write(path, sr, (np.clip(sig, -1, 1) * 20000).astype(np.int16))
        lines.append(f"{path}|S{spk}|{text}|{lang}")
    with open(os.path.join(workdir, "train.csv"), "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(workdir, "val.csv"), "w") as f:
        f.write("\n".join(lines[:4]) + "\n")


def make_config(workdir: str, epochs: int) -> str:
    cfg = yaml.safe_load(open("configs/config_cje.yaml"))
    cfg["train"].update(
        batch_size=16, epochs=epochs, log_interval=50,
        eval_interval=500, save_interval=500,
    )
    cfg["data"].update(
        data_path=workdir,
        training_files=os.path.join(workdir, "train.csv"),
        validation_files=os.path.join(workdir, "val.csv"),
        speakers=["S0", "S1"], bucket_boundaries=[32, 160], max_text_len=40,
    )
    cfg["model"].update(upsample_initial_channel=256, n_layers=4)
    path = os.path.join(workdir, "config.yaml")
    yaml.safe_dump(cfg, open(path, "w"))
    return path


def dominant_f0(wav: np.ndarray, sr: int) -> float:
    f = np.fft.rfftfreq(len(wav), 1 / sr)
    mag = np.abs(np.fft.rfft(wav * np.hanning(len(wav))))
    lo = np.searchsorted(f, 60)
    hi = np.searchsorted(f, 500)
    return float(f[lo + np.argmax(mag[lo:hi])])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", default="/tmp/vits_quickstart")
    parser.add_argument("--epochs", type=int, default=500)
    args = parser.parse_args()

    make_dataset(args.workdir)
    cfg_path = make_config(args.workdir, args.epochs)

    from vits_tpu.config import get_hparams
    from vits_tpu.training.train import run

    model_dir = os.path.join(args.workdir, "run")
    hps = get_hparams(cfg_path, model_dir)
    run(hps)

    from vits_tpu.training.checkpoint import latest_checkpoint
    from vits_tpu.serve.engine import TTSEngine

    ckpt = latest_checkpoint(model_dir, "eval")
    engine = TTSEngine(os.path.join(model_dir, "config.yaml"), ckpt)
    for spk, target in [(0, 120), (1, 200)]:
        phones, (sr, audio) = engine.synthesize("[P]ni3#hao3[P]", spk)
        out = os.path.join(args.workdir, f"spk{spk}.wav")
        scipy.io.wavfile.write(out, sr, audio)
        print(f"speaker {spk}: f0={dominant_f0(audio.astype(np.float64), sr):.0f} Hz "
              f"(target ~{target}) -> {out}")
    for shift in (-6, 6):
        _, (sr, audio) = engine.synthesize("[P]ni3#hao3[P]", 0, scope_shift=shift)
        print(f"scope_shift {shift:+d}: f0={dominant_f0(audio.astype(np.float64), sr):.0f} Hz")


if __name__ == "__main__":
    main()
