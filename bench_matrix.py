"""Benchmark matrix covering the BASELINE.json scenario list:

  1. single-sentence EN inference (text -> wav through the full frontend)
  2. multi-speaker CJE inference with speaker embedding
  3. batched inference (yin-conditioned latents + Avocodo-trained decoder)
  4. single-chip training step (MAS + KL/mel/duration + Avocodo GAN)

(The 5th scenario — multi-host DP training — is exercised by
__graft_entry__.dryrun_multichip, which needs no timing hardware here.)

Prints one JSON line per scenario. The driver's headline metric stays in
bench.py.
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from vits_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()

    from vits_tpu.config import load_hparams, synthesizer_kwargs
    from vits_tpu.models.synthesizer import SynthesizerTrn
    from vits_tpu.text.symbols import symbols
    from vits_tpu.text.cleaners import clean_text
    from vits_tpu.text import cleaned_text_to_sequence
    from vits_tpu.ops.commons import intersperse_with_language_id

    hps = load_hparams("configs/config_cje.yaml")
    model = SynthesizerTrn(**synthesizer_kwargs(hps, len(symbols)))
    hop, sr = hps.data.hop_length, hps.data.sampling_rate

    def timed(fn, *args, n=15):
        def drain(r):
            # concrete fetch, NOT block_until_ready: on the tunneled axon
            # backend block_until_ready returns before the queue drains
            leaf = jax.tree_util.tree_leaves(r)[0]
            np.asarray(leaf).ravel()[:1]

        drain(fn(*args))
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn(*args)
        drain(r)
        return (time.perf_counter() - t0) / n

    def prep_text(tagged, tx):
        cleaned, lang = clean_text(tagged)
        seq, lang = intersperse_with_language_id(
            cleaned_text_to_sequence(cleaned), lang, 0
        )
        x = np.zeros((1, tx), np.int32)
        t = np.zeros((1, tx), np.int32)
        m = min(len(seq), tx)
        x[0, :m] = seq[:m]
        t[0, :m] = lang[:m]
        return jnp.asarray(x), jnp.asarray(t), jnp.asarray([m])

    # ---- scenario 1: EN sentence ---------------------------------------
    x, t, xl = prep_text(
        "[EN]the quick brown fox jumps over the lazy dog[EN]", 128
    )
    sid = jnp.asarray([0])
    init = jax.jit(lambda k, r: model.init(
        k, x, t, xl, sid=sid, rng=r, max_frames=16, method=SynthesizerTrn.infer))
    params = init(jax.random.PRNGKey(0), jax.random.PRNGKey(1))
    syn = jax.jit(lambda p, k: model.apply(
        p, x, t, xl, sid=sid, rng=k, noise_scale=0.667, noise_scale_w=0.8,
        max_frames=400, method=SynthesizerTrn.infer))
    dt = timed(syn, params, jax.random.PRNGKey(2))
    print(json.dumps({"metric": "en_sentence_rtf", "value": round(400 * hop / sr / dt, 1),
                      "unit": "x_realtime", "ms_per_call": round(dt * 1000, 2)}))

    # ---- scenario 2: multi-speaker CJE ---------------------------------
    x2, t2, _ = prep_text("[P]ni3#hao3[P] [EN]hello[EN]", 128)
    b = 4
    xs = jnp.tile(x2, (b, 1))
    ts = jnp.tile(t2, (b, 1))
    xls = jnp.asarray([int(_[0]) if hasattr(_, "__getitem__") else 20] * b)
    xls = jnp.asarray([int(jnp.sum(x2 != 0))] * b)
    sids = jnp.asarray([0, 1, 2, 3])
    syn2 = jax.jit(lambda p, k: model.apply(
        p, xs, ts, xls, sid=sids, rng=k, noise_scale=0.667, noise_scale_w=0.8,
        max_frames=400, method=SynthesizerTrn.infer))
    dt = timed(syn2, params, jax.random.PRNGKey(3))
    print(json.dumps({"metric": "cje_multispeaker_rtf",
                      "value": round(b * 400 * hop / sr / dt, 1),
                      "unit": "x_realtime", "batch": b,
                      "ms_per_call": round(dt * 1000, 2)}))

    # ---- scenario 3: batched inference ---------------------------------
    b = 8
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.integers(1, len(symbols), (b, 96)))
    tb = jnp.asarray(rng.integers(0, 6, (b, 96)))
    xlb = jnp.asarray([96] * b)
    sidb = jnp.asarray(rng.integers(0, 5, (b,)))
    syn3 = jax.jit(lambda p, k: model.apply(
        p, xb, tb, xlb, sid=sidb, rng=k, noise_scale=0.667, noise_scale_w=0.8,
        max_frames=400, method=SynthesizerTrn.infer))
    dt = timed(syn3, params, jax.random.PRNGKey(4))
    print(json.dumps({"metric": "batched_inference_rtf",
                      "value": round(b * 400 * hop / sr / dt, 1),
                      "unit": "x_realtime", "batch": b,
                      "ms_per_call": round(dt * 1000, 2)}))

    # ---- scenario 4: training step -------------------------------------
    import functools

    from vits_tpu.models.avocodo import AvocodoDiscriminator
    from vits_tpu.training.step import (
        create_train_state, make_optimizer, train_step,
    )

    disc = AvocodoDiscriminator()
    og = make_optimizer(hps, 100)
    od = make_optimizer(hps, 100)
    bt, ty = 16, 400
    batch = {
        "x": jnp.asarray(rng.integers(1, len(symbols), (bt, 128))),
        "t": jnp.asarray(rng.integers(0, 6, (bt, 128))),
        "x_lengths": jnp.asarray([128] * bt),
        "spec": jnp.asarray(np.abs(rng.standard_normal((bt, ty, 513))).astype(np.float32)),
        "spec_lengths": jnp.asarray([ty] * bt),
        "ying": jnp.asarray(rng.uniform(0, 1, (bt, ty, 80)).astype(np.float32)),
        "wav": jnp.asarray((rng.standard_normal((bt, ty * hop, 1)) * 0.1).astype(np.float32)),
        "sid": jnp.asarray(rng.integers(0, 5, (bt,))),
    }
    state = create_train_state(jax.random.PRNGKey(0), model, disc, og, od, batch)
    step = jax.jit(functools.partial(
        train_step, model=model, disc=disc, optim_g=og, optim_d=od, hps=hps))

    def run_step(s, b_, k):
        ns, _ = step(s, b_, k)
        return ns.g_params

    dt = timed(lambda: run_step(state, batch, jax.random.PRNGKey(5)), n=15)
    print(json.dumps({"metric": "train_step_time", "value": round(dt * 1000, 1),
                      "unit": "ms", "batch": bt, "frames": ty,
                      "steps_per_sec": round(1 / dt, 2)}))

    # ---- scenario 5: serving request latency (engine level) ------------
    from vits_tpu.serve.engine import TTSEngine

    eng = TTSEngine("configs/config_cje.yaml")  # random-init weights
    text = "[EN]the quick brown fox jumps over the lazy dog[EN]"
    eng.synthesize(text, speaker_id=0, seed=0)  # warm compile
    t0 = time.perf_counter()
    n = 5
    total_audio = 0.0
    for i in range(n):
        _, (sr_out, audio) = eng.synthesize(text, speaker_id=0, seed=i)
        total_audio += len(audio) / sr_out
    dt = (time.perf_counter() - t0) / n
    # host-side g2p time, reported separately (the text frontend — jieba
    # segmentation, regex normalization, lexicon lookups — is part of real
    # serving latency but runs on the host, outside every RTF above)
    g2p_texts = [
        text,
        "[ZH]今天天气真不错，我们一起去公园散步吧。[ZH]",
        "[JA]今日はいい天気ですね。散歩に行きましょう。[JA]",
    ]
    for s in g2p_texts:
        eng.get_phoneme(s)  # warm lazy imports / jieba dictionaries
    t1 = time.perf_counter()
    n_g2p = 20
    for i in range(n_g2p):
        for s in g2p_texts:
            eng.get_phoneme(s)
    g2p_ms = (time.perf_counter() - t1) / (n_g2p * len(g2p_texts)) * 1000
    print(json.dumps({
        "metric": "serving_request_latency", "value": round(dt * 1000, 1),
        "unit": "ms", "audio_s_per_request": round(total_audio / n, 2),
        "rtf": round(total_audio / n / dt, 1),
        "g2p_ms_per_sentence": round(g2p_ms, 2),
    }))

    # ---- scenario 6: dynamic-batching throughput (engine level) --------
    reqs8 = [
        {"text": text, "speaker_id": i % 3, "seed": i} for i in range(8)
    ]
    eng.synthesize_batch(reqs8)  # warm the batched compile
    t0 = time.perf_counter()
    n_rounds = 5
    total_audio_b = 0.0
    for r in range(n_rounds):
        outs = eng.synthesize_batch(
            [{**q, "seed": q["seed"] + r} for q in reqs8]
        )
        total_audio_b += sum(len(a) for a in outs) / eng.sampling_rate
    dt_b = time.perf_counter() - t0
    print(json.dumps({
        "metric": "serving_batched_throughput",
        "value": round(n_rounds * len(reqs8) / dt_b, 1),
        "unit": "requests/s", "batch": len(reqs8),
        "rtf": round(total_audio_b / dt_b, 1),
        "vs_sequential_rtf": round(
            (total_audio_b / dt_b) / max(total_audio / n / dt, 1e-9), 2
        ),
    }))


if __name__ == "__main__":
    main()
