"""Production-style batched serving example.

Starts a TTSEngine (optionally from a checkpoint — reference-format .pth
files convert via `python -m vits_tpu.utils.convert_torch`), wraps it in a
DynamicBatcher, and pushes concurrent requests through it from worker
threads, printing per-request latency and aggregate throughput.

    python examples/serve_batched.py --config configs/config_cje.yaml \
        [--checkpoint runs/cje/eval_200000] [--requests 32] [--max-batch 8]

Requests are deterministic per (text, speaker, seed) regardless of batch
composition (per-row PRNG keys inside the vmapped program), so dynamic
batching is transparent to callers.
"""

from __future__ import annotations

import argparse
import threading
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/config_cje.yaml")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    args = ap.parse_args()

    from vits_tpu.serve.engine import TTSEngine
    from vits_tpu.serve.batcher import DynamicBatcher

    engine = TTSEngine(args.config, checkpoint_path=args.checkpoint)
    batcher = DynamicBatcher(
        engine, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms
    )

    texts = [
        "[EN]hello world, this is a batched request.[EN]",
        "[ZH]今天天气真不错。[ZH]",
        "[JA]今日はいい天気ですね。[JA]",
        "[P]ni3#hao3 shi4#jie4[P]",
    ]

    # warm the per-bucket compiles once so the measured loop is steady-state
    engine.synthesize_batch(
        [{"text": t, "speaker_id": 0, "seed": 0} for t in texts]
    )

    latencies: list[float] = []
    lock = threading.Lock()

    def client(i: int) -> None:
        t0 = time.perf_counter()
        fut = batcher.submit(texts[i % len(texts)], speaker_id=i % 3, seed=i)
        sr, audio = fut.result()
        dt = time.perf_counter() - t0
        with lock:
            latencies.append(dt)

    t0 = time.perf_counter()
    threads = [
        threading.Thread(target=client, args=(i,))
        for i in range(args.requests)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    batcher.close()

    latencies.sort()
    n = len(latencies)
    print(
        f"{n} requests in {wall:.2f}s = {n / wall:.1f} req/s | "
        f"latency p50 {latencies[n // 2] * 1e3:.0f} ms, "
        f"p95 {latencies[int(n * 0.95)] * 1e3:.0f} ms"
    )


if __name__ == "__main__":
    main()
