"""Convergence study v2: prove the alignment machinery LEARNS (VERDICT r4 #1).

Round 4's study used a constant-text corpus, so duration loss sat flat and
MAS was trivially diagonal. This study makes alignment and duration the
thing under test:

* 10 symbols, each with a distinct harmonic signature (f0 log-spaced
  120-490 Hz) AND a distinct characteristic duration (4-13 frames,
  deliberately decorrelated from pitch order), +-25% per-instance jitter;
* every utterance is a DIFFERENT random symbol sequence (8-14 symbols,
  no immediate repeats) — the model must learn text->audio alignment, not
  memorize one path;
* ground-truth per-instance durations (exact, in spectrogram frames by
  construction: every segment is dur*hop samples) are saved to gt.json.

Subcommands (run from the repo root):
  gen     --workdir W             generate corpus + gt.json
  train   --workdir W --epochs N  run the real training CLI (vits_tpu.training.train.run)
  analyze --workdir W             per-checkpoint metrics -> analysis.json + docs plot
  synth   --workdir W             held-out-text synthesis order/duration check

What `analyze` measures per eval checkpoint (the four curves VERDICT asked
for, reference behavior: /root/reference/SynthesizerTrn.py:186-277,
/root/reference/StochasticDurationPredictor.py:100-150):
  (a) duration loss on a fixed val batch (must decrease);
  (b) MAS alignment quality vs the KNOWN ground-truth alignment:
      frame-accuracy (argmax token == true symbol token) and boundary MAE —
      strictly stronger than a diagonality proxy because truth is known;
  (c) Pearson r between SDP-predicted durations (deterministic reverse,
      noise_scale_w=0) and ground-truth durations, pooled over the batch;
  (d) same r for the MAS-extracted durations (shows MAS locking on).
`synth` then checks held-out text: the generated audio's per-frame dominant
f0 is decoded back to symbols; the collapsed sequence must reproduce the
input order, and realized segment durations must track the per-symbol means.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 22050
HOP = 256

# symbol -> (f0 Hz, mean duration in frames). f0 log-spaced; durations
# shuffled so duration is NOT a monotonic function of pitch (decorrelated:
# Pearson r(f0, dur) = -0.03 over the 10 pairs).
SYMS = list("aeiouksmnl")
F0S = {s: 120.0 * (490.0 / 120.0) ** (k / 9) for k, s in enumerate(SYMS)}
DURS = dict(zip(SYMS, [10, 5, 12, 7, 4, 9, 13, 6, 11, 8]))


def _segment(f0: float, n: int, spk: int, rng: np.random.Generator) -> np.ndarray:
    """One symbol's audio: harmonic stack with 8 ms cosine edges."""
    t = np.arange(n) / SR
    amps = (1.0, 0.5, 0.25) if spk == 0 else (1.0, 0.25, 0.45)
    sig = sum(a * np.sin(2 * np.pi * f0 * (h + 1) * t) for h, a in enumerate(amps))
    edge = int(0.008 * SR)
    env = np.ones(n)
    ramp = 0.5 * (1 - np.cos(np.pi * np.arange(edge) / edge))
    env[:edge] = ramp
    env[-edge:] = ramp[::-1]
    return 0.35 * sig * env + 0.004 * rng.standard_normal(n)


def gen(workdir: str, n_train: int = 256, n_val: int = 16, n_heldout: int = 8,
        seed: int = 0) -> None:
    import scipy.io.wavfile

    os.makedirs(workdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    gt: dict[str, dict] = {}
    rows: list[str] = []
    for i in range(n_train + n_val + n_heldout):
        spk = i % 2
        length = int(rng.integers(8, 15))
        seq: list[str] = []
        for _ in range(length):
            # adjacent symbols must differ by >=2 f0 steps (17% apart each):
            # boundaries stay acoustically crisp, so the symbol decoder can
            # recover the sequence from ground-truth audio with 100% exactness
            # (a prerequisite for using it as a synthesis metric)
            cands = [
                s for s in SYMS
                if not seq or abs(SYMS.index(s) - SYMS.index(seq[-1])) >= 2
            ]
            seq.append(cands[rng.integers(len(cands))])
        durs = [max(3, round(DURS[c] * rng.uniform(0.75, 1.25))) for c in seq]
        audio = np.concatenate(
            [_segment(F0S[c], d * HOP, spk, rng) for c, d in zip(seq, durs)]
        )
        path = os.path.join(workdir, f"utt{i:03d}.wav")
        scipy.io.wavfile.write(
            path, SR, (np.clip(audio, -1, 1) * 24000).astype(np.int16)
        )
        text = "".join(seq)
        lang = " ".join(["0"] * len(text))
        rows.append(f"{path}|S{spk}|{text}|{lang}")
        gt[os.path.basename(path)] = {"text": text, "durs": durs, "spk": spk}

    with open(os.path.join(workdir, "train.csv"), "w") as f:
        f.write("\n".join(rows[:n_train]) + "\n")
    with open(os.path.join(workdir, "val.csv"), "w") as f:
        f.write("\n".join(rows[n_train:n_train + n_val]) + "\n")
    with open(os.path.join(workdir, "heldout.csv"), "w") as f:
        f.write("\n".join(rows[n_train + n_val:]) + "\n")
    with open(os.path.join(workdir, "gt.json"), "w") as f:
        json.dump(gt, f)
    frames = [sum(v["durs"]) for v in gt.values()]
    print(f"wrote {len(rows)} utts to {workdir}; "
          f"frames min/med/max = {min(frames)}/{int(np.median(frames))}/{max(frames)}")


def make_config(workdir: str, epochs: int) -> str:
    import yaml

    cfg = yaml.safe_load(open("configs/config_cje.yaml"))
    cfg["train"].update(
        batch_size=16, epochs=epochs, log_interval=50,
        eval_interval=400, save_interval=400,  # steps; 16 steps/epoch
        keep_ckpts=0,  # keep every checkpoint for the per-step curves
    )
    cfg["data"].update(
        data_path=workdir,
        training_files=os.path.join(workdir, "train.csv"),
        validation_files=os.path.join(workdir, "val.csv"),
        speakers=["S0", "S1"],
        bucket_boundaries=[32, 96, 128, 160, 200, 240],
        max_text_len=40,
    )
    cfg["model"].update(upsample_initial_channel=256, n_layers=4)
    path = os.path.join(workdir, "config.yaml")
    yaml.safe_dump(cfg, open(path, "w"))
    return path


def train(workdir: str, epochs: int) -> None:
    cfg_path = make_config(workdir, epochs)
    from vits_tpu.config import get_hparams
    from vits_tpu.training.train import run

    hps = get_hparams(cfg_path, os.path.join(workdir, "run"))
    run(hps)


# -- analysis ----------------------------------------------------------------


def _load_val_batch(workdir: str):
    """Fixed analysis batch: every val utterance, padded to common shapes,
    plus the ground-truth per-position durations."""
    from vits_tpu.config import get_hparams
    from vits_tpu.text import cleaned_text_to_sequence
    from vits_tpu.ops.commons import intersperse_with_language_id
    from vits_tpu.training.train import build_dataset

    hps = get_hparams(
        os.path.join(workdir, "config.yaml"), os.path.join(workdir, "run")
    )
    ds = build_dataset(hps, "val")
    gt = json.load(open(os.path.join(workdir, "gt.json")))

    xs, ts, specs, yings, sids, gt_durs = [], [], [], [], [], []
    for full, spk, text, lang in ds.items:
        spec, ying, _audio = ds._get_audio(full)
        seq = cleaned_text_to_sequence(text)
        lang_ids = [0] * len(seq)
        seq, lang_ids = intersperse_with_language_id(seq, lang_ids, 0)
        xs.append(np.asarray(seq, np.int32))
        ts.append(np.asarray(lang_ids, np.int32))
        specs.append(spec)
        yings.append(ying)
        sids.append(0 if spk == "S0" else 1)
        gt_durs.append(gt[os.path.basename(full)]["durs"])

    bx = max(len(x) for x in xs)
    by = max(s.shape[0] for s in specs)
    n = len(xs)
    batch = {
        "x": np.zeros((n, bx), np.int32),
        "t": np.zeros((n, bx), np.int32),
        "x_lengths": np.asarray([len(x) for x in xs], np.int32),
        "spec": np.zeros((n, by, specs[0].shape[1]), np.float32),
        "spec_lengths": np.asarray([s.shape[0] for s in specs], np.int32),
        "ying": np.zeros((n, by, yings[0].shape[1]), np.float32),
        "sid": np.asarray(sids, np.int32),
    }
    for i in range(n):
        batch["x"][i, : len(xs[i])] = xs[i]
        batch["t"][i, : len(ts[i])] = ts[i]
        batch["spec"][i, : specs[i].shape[0]] = specs[i]
        batch["ying"][i, : yings[i].shape[0]] = yings[i]
    return hps, batch, gt_durs


def _ckpt_metrics(model, g_params, batch, gt_durs):
    """One checkpoint's alignment + duration metrics."""
    import jax
    import jax.numpy as jnp
    from vits_tpu.models.synthesizer import SynthesizerTrn

    @jax.jit
    def train_fwd(p, x, t, xl, spec, sl, ying, sid):
        out = model.apply(
            {"params": p}, x, t, xl, spec, sl, ying, sid,
            rng=jax.random.PRNGKey(0),
        )
        return out["attn"], out["l_length"]

    @jax.jit
    def dur_fwd(p, x, t, xl, sid):
        w_ceil, *_ = model.apply(
            {"params": p}, x, t, xl, sid=sid, rng=jax.random.PRNGKey(0),
            noise_scale_w=0.0, method=SynthesizerTrn.infer_pre_lr,
        )
        return w_ceil

    attn, l_length = train_fwd(
        g_params, jnp.asarray(batch["x"]), jnp.asarray(batch["t"]),
        jnp.asarray(batch["x_lengths"]), jnp.asarray(batch["spec"]),
        jnp.asarray(batch["spec_lengths"]), jnp.asarray(batch["ying"]),
        jnp.asarray(batch["sid"]),
    )
    w_pred = np.asarray(dur_fwd(
        g_params, jnp.asarray(batch["x"]), jnp.asarray(batch["t"]),
        jnp.asarray(batch["x_lengths"]), jnp.asarray(batch["sid"]),
    ))[..., 0]
    attn = np.asarray(attn)  # [B, Ty, Tx] hard MAS path
    n = attn.shape[0]

    correct = total = 0
    boundary_err: list[float] = []
    mas_durs, sdp_durs, true_durs = [], [], []
    for i in range(n):
        durs = gt_durs[i]
        ty = int(batch["spec_lengths"][i])
        assert ty == sum(durs), (ty, sum(durs))
        # gt frame -> symbol position p; its token index is 2p+1 (add_blank)
        gt_pos = np.repeat(np.arange(len(durs)), durs)
        arg = attn[i, :ty].argmax(axis=-1)  # frame -> token index
        correct += int(np.sum(arg == 2 * gt_pos + 1))
        total += ty
        # MAS durations per symbol token; blanks' frames are real MAS mass
        w_mas = attn[i, :ty].sum(axis=0)
        cum_mas = np.cumsum(w_mas)
        cum_gt = np.cumsum(durs)
        # boundary after symbol p = end of token 2p+1
        boundary_err.extend(
            abs(cum_mas[2 * p + 1] - cum_gt[p]) for p in range(len(durs))
        )
        mas_durs.extend(w_mas[1::2][: len(durs)])
        sdp_durs.extend(w_pred[i, 1::2][: len(durs)])
        true_durs.extend(durs)

    mas_durs = np.asarray(mas_durs)
    sdp_durs = np.asarray(sdp_durs)
    true_durs = np.asarray(true_durs, np.float64)

    def _r(a, b):
        # zero-variance predictions (untrained SDP emits a constant) have
        # no defined correlation; report None, not NaN (invalid JSON)
        if np.std(a) < 1e-9:
            return None
        return float(np.corrcoef(a, b)[0, 1])

    return {
        "dur_loss": float(jnp.sum(l_length)),
        "mas_frame_acc": correct / total,
        "mas_boundary_mae": float(np.mean(boundary_err)),
        "r_mas": _r(mas_durs, true_durs),
        "r_sdp": _r(sdp_durs, true_durs),
    }


def analyze(workdir: str) -> None:
    from vits_tpu.config import synthesizer_kwargs
    from vits_tpu.models.synthesizer import SynthesizerTrn
    from vits_tpu.text.symbols import symbols
    from vits_tpu.training.checkpoint import _ckpt_steps, load_eval_params

    hps, batch, gt_durs = _load_val_batch(workdir)
    model = SynthesizerTrn(**synthesizer_kwargs(hps, len(symbols)), bf16=False)

    model_dir = os.path.join(workdir, "run")
    steps = _ckpt_steps(model_dir, "eval")
    if not steps:
        raise SystemExit(f"no eval checkpoints in {model_dir}")
    rows = []
    for s in steps:
        g_params = load_eval_params(os.path.join(model_dir, f"eval_{s}"))
        m = _ckpt_metrics(model, g_params, batch, gt_durs)
        m["step"] = s
        rows.append(m)
        print(json.dumps(m))

    out = os.path.join(workdir, "analysis.json")
    json.dump(rows, open(out, "w"), indent=1)
    print(f"wrote {out}")
    _plot(rows, workdir)


def _plot(rows: list[dict], workdir: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    steps = [r["step"] for r in rows]
    fig, axes = plt.subplots(1, 4, figsize=(16, 3.2))
    panels = [
        ("dur_loss", "duration loss (fixed val batch)", None),
        ("mas_frame_acc", "MAS frame accuracy vs ground truth", (0, 1)),
        ("mas_boundary_mae", "MAS boundary MAE (frames)", None),
        ("r_sdp", "Pearson r: predicted vs true durations", (-0.2, 1)),
    ]
    def _series(key):
        pts = [(s, r[key]) for s, r in zip(steps, rows) if r[key] is not None]
        return [p[0] for p in pts], [p[1] for p in pts]

    for ax, (key, title, ylim) in zip(axes, panels):
        ax.plot(*_series(key), marker="o")
        if key == "r_sdp":
            ax.plot(*_series("r_mas"), marker="s", label="MAS-extracted")
            ax.legend(["SDP-predicted", "MAS-extracted"], fontsize=8)
        ax.set_title(title, fontsize=9)
        ax.set_xlabel("step")
        if ylim:
            ax.set_ylim(*ylim)
        ax.grid(alpha=0.3)
    fig.tight_layout()
    out = os.path.join(workdir, "convergence_r5.png")
    fig.savefig(out, dpi=110)
    print(f"wrote {out}")


# -- held-out synthesis check ------------------------------------------------


def _decode_symbols(audio: np.ndarray) -> tuple[list[str], list[int]]:
    """Audio -> symbol sequence + per-run durations (frames).

    Per-frame dominant f0 (512-sample centered window, zero-padded FFT)
    scored against every symbol's f0 in log space, then Viterbi-smoothed
    with a switch penalty so boundary-bleed frames join a neighboring run
    instead of spawning spurious segments. Validated: 280/280 exact
    sequence recovery on the generated ground-truth corpus, per-run
    duration correlation r=1.000.
    """
    win, pad = 512, 8192
    n_frames = len(audio) // HOP
    w = np.hanning(win)
    fftf = np.fft.rfftfreq(pad, 1 / SR)
    lo, hi = np.searchsorted(fftf, 90), np.searchsorted(fftf, 560)
    f0_vals = np.asarray([F0S[s] for s in SYMS])
    half = win // 2
    f0s = np.empty(n_frames)
    for j in range(n_frames):
        c = j * HOP + HOP // 2
        seg = audio[max(0, c - half): c + half]
        if c - half < 0:
            seg = np.pad(seg, (half - c, 0))
        if len(seg) < win:
            seg = np.pad(seg, (0, win - len(seg)))
        mag = np.abs(np.fft.rfft(seg * w, n=pad))
        f0s[j] = fftf[lo + int(np.argmax(mag[lo:hi]))]

    cost = np.abs(np.log(f0s[:, None] / f0_vals[None, :]))  # [T, K]
    lam = 0.4  # symbol-switch penalty
    n, k = cost.shape
    dp = cost[0].copy()
    bp = np.zeros((n, k), int)
    same = np.eye(k, dtype=bool)
    for t_ in range(1, n):
        trans = dp[None, :] + lam * (~same)
        bp[t_] = trans.argmin(axis=1)
        dp = cost[t_] + trans.min(axis=1)
    path = [int(dp.argmin())]
    for t_ in range(n - 1, 0, -1):
        path.append(int(bp[t_, path[-1]]))
    path = path[::-1]

    seq: list[str] = []
    durs: list[int] = []
    for idx in path:
        if seq and seq[-1] == SYMS[idx]:
            durs[-1] += 1
        else:
            seq.append(SYMS[idx])
            durs.append(1)
    return seq, durs


def _levenshtein(a: list, b: list) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def synth(workdir: str) -> None:
    import jax
    import jax.numpy as jnp
    from vits_tpu.config import get_hparams, synthesizer_kwargs
    from vits_tpu.models.synthesizer import SynthesizerTrn
    from vits_tpu.ops.commons import intersperse_with_language_id
    from vits_tpu.text import cleaned_text_to_sequence
    from vits_tpu.text.symbols import symbols
    from vits_tpu.training.checkpoint import latest_checkpoint, load_eval_params

    hps = get_hparams(
        os.path.join(workdir, "config.yaml"), os.path.join(workdir, "run")
    )
    model = SynthesizerTrn(**synthesizer_kwargs(hps, len(symbols)), bf16=False)
    ckpt = latest_checkpoint(os.path.join(workdir, "run"), "eval")
    g_params = load_eval_params(ckpt)
    print(f"checkpoint: {ckpt}")

    @jax.jit
    def infer(x, t, xl, sid):
        wav, y_mask, y_lengths = model.apply(
            {"params": g_params}, x, t, xl, sid=sid,
            rng=jax.random.PRNGKey(0), noise_scale=0.4, noise_scale_w=0.0,
            max_frames=320, method=SynthesizerTrn.infer,
        )
        return wav, y_lengths

    results = []
    for line in open(os.path.join(workdir, "heldout.csv")):
        path, spk, text, _lang = line.strip().split("|")
        seq, lids = intersperse_with_language_id(
            cleaned_text_to_sequence(text), [0] * len(text), 0
        )
        x = jnp.asarray(seq, jnp.int32)[None]
        t = jnp.asarray(lids, jnp.int32)[None]
        xl = jnp.asarray([len(seq)], jnp.int32)
        sid = jnp.asarray([0 if spk == "S0" else 1], jnp.int32)
        wav, y_len = infer(x, t, xl, sid)
        audio = np.asarray(wav[0, : int(y_len[0]) * HOP, 0], np.float64)
        dec_seq, dec_durs = _decode_symbols(audio)
        dist = _levenshtein(dec_seq, list(text))
        sim = 1 - dist / max(len(text), len(dec_seq))
        # realized durations vs per-symbol means, aligned when exact match
        r = float("nan")
        if dec_seq == list(text):
            spec_d = np.asarray([DURS[c] for c in text], np.float64)
            r = float(np.corrcoef(np.asarray(dec_durs, np.float64), spec_d)[0, 1])
        results.append({"text": text, "decoded": "".join(dec_seq),
                        "exact": dec_seq == list(text), "sim": round(sim, 3),
                        "dur_r": None if np.isnan(r) else round(r, 3)})
        print(json.dumps(results[-1]))

    n_exact = sum(r["exact"] for r in results)
    rs = [r["dur_r"] for r in results if r["dur_r"] is not None]
    summary = {
        "n": len(results),
        "exact_order": n_exact,
        "mean_sim": round(float(np.mean([r["sim"] for r in results])), 3),
        "mean_dur_r": round(float(np.mean(rs)), 3) if rs else None,
    }
    print("SUMMARY", json.dumps(summary))
    json.dump({"results": results, "summary": summary},
              open(os.path.join(workdir, "synth_check.json"), "w"), indent=1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("cmd", choices=["gen", "train", "analyze", "synth"])
    p.add_argument("--workdir", default="/tmp/conv_v2")
    p.add_argument("--epochs", type=int, default=250)
    args = p.parse_args()
    if args.cmd == "gen":
        gen(args.workdir)
    elif args.cmd == "train":
        train(args.workdir, args.epochs)
    elif args.cmd == "analyze":
        analyze(args.workdir)
    elif args.cmd == "synth":
        synth(args.workdir)


if __name__ == "__main__":
    main()
