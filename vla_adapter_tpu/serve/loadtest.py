"""/act load generator: serving capacity + latency percentiles.

The reference has no serving benchmark at all (its deploy.py is a serial
batch-1 server). This tool measures what a deployment actually sees:
end-to-end POST /act round-trips — JSON+base64 decode, host image
preprocessing, dynamic micro-batching, the TPU forward, unnormalization —
under N concurrent closed-loop clients (each client fires its next request
as soon as the previous one returns, the worst case for a batcher).

CLI (self-serving: builds a flagship-geometry Predictor with zero-init
weights, which exercises the full compute path — weights' values do not
change the timing):

    python -m vla_adapter_tpu.serve.loadtest --clients 16 --duration 30 \
        --act-int8 --dynamic-batch

or point --url at an already-running ActionServer to measure a real
deployment. Prints one JSON line:
  {"requests_per_s": ..., "actions_per_s": ..., "latency_ms": {"p50": ...,
   "p90": ..., "p99": ...}, "batch_sizes": {...}}

Every request carries a uniquely-perturbed image so no two forwards are
identical (the local TPU tunnel memoizes identical executions; a real
deployment has no such cache, but unique payloads keep the tool honest in
both settings).
"""

from __future__ import annotations

import argparse
import json
import threading
import time
import urllib.request
from collections import Counter
from typing import Dict, List, Optional

import numpy as np

from vla_adapter_tpu.serve.server import encode_ndarray


def _post(url: str, payload: Dict, timeout: float = 120.0) -> Dict:
    body = json.dumps(payload).encode()
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


def _client_loop(url: str, cid: int, stop: float, t_measure: float,
                 image_hw: int, proprio_dim: Optional[int], instruction: str,
                 unnorm_key: Optional[str], latencies: List[float],
                 errors: List[str], lock) -> None:
    """One closed-loop client: back-to-back POSTs until the deadline."""
    rng = np.random.default_rng(1000 + cid)
    base_full = np.random.default_rng(0).integers(
        0, 255, size=(image_hw, image_hw, 3), dtype=np.uint8)
    base_wrist = np.random.default_rng(1).integers(
        0, 255, size=(image_hw, image_hw, 3), dtype=np.uint8)
    fail_streak = 0
    while time.monotonic() < stop:
        # unique payload per request: flip a few random pixels
        full = base_full.copy()
        ys, xs = rng.integers(0, image_hw, 8), rng.integers(0, image_hw, 8)
        full[ys, xs] = rng.integers(0, 255, size=(8, 3))
        payload = {
            "full_image": encode_ndarray(full),
            "wrist_image": encode_ndarray(base_wrist),
            "instruction": instruction,
        }
        if proprio_dim:
            payload["proprio"] = encode_ndarray(
                rng.normal(size=proprio_dim).astype(np.float32))
        if unnorm_key:
            payload["unnorm_key"] = unnorm_key
        t0 = time.monotonic()
        try:
            out = _post(url, payload)
            dt = time.monotonic() - t0
            assert "action" in out, out
            if t0 >= t_measure:
                with lock:
                    latencies.append(dt)
            fail_streak = 0
        except Exception as e:  # noqa: BLE001 — recorded, not fatal
            # warmup exists to absorb compiles: failures before t_measure
            # (cold-compile client timeouts) don't belong in the headline
            # stats, but a long uninterrupted failure streak still aborts
            if t0 >= t_measure:
                with lock:
                    errors.append(f"{type(e).__name__}: {e}")
            fail_streak += 1
            if fail_streak > 50 or len(errors) > 100:
                return


def _client_proc(url, cids, stop, t_measure, image_hw, proprio_dim,
                 instruction, unnorm_key, out_q) -> None:
    """Entry point for a client worker process: runs len(cids) client
    threads and ships (latencies, errors) back through out_q. Lives at
    module top level for multiprocessing 'spawn' (and must not import jax)."""
    latencies: List[float] = []
    errors: List[str] = []
    lock = threading.Lock()
    threads = [
        threading.Thread(
            target=_client_loop,
            args=(url, cid, stop, t_measure, image_hw, proprio_dim,
                  instruction, unnorm_key, latencies, errors, lock),
            daemon=True)
        for cid in cids
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    out_q.put((latencies, errors))


def run_load(
    url: str,
    num_clients: int,
    duration_s: float,
    image_hw: int = 224,
    proprio_dim: Optional[int] = 8,
    instruction: str = "pick up the black bowl and place it on the plate",
    unnorm_key: Optional[str] = None,
    warmup_s: float = 0.0,
    processes: int = 1,
) -> Dict:
    """Closed-loop load: ``num_clients`` clients post back-to-back requests
    for ``duration_s`` seconds (after ``warmup_s`` of untimed requests to
    absorb compiles). ``processes > 1`` spreads the clients over separate
    OS processes — REQUIRED for a fair measurement of a co-located server:
    in one process the clients' base64/JSON work shares the server's GIL
    and the 'server' number is really a client bottleneck. Returns
    aggregate stats."""
    stop = time.monotonic() + warmup_s + duration_s
    t_measure = time.monotonic() + warmup_s
    latencies: List[float] = []
    errors: List[str] = []

    if processes <= 1:
        lock = threading.Lock()
        threads = [
            threading.Thread(
                target=_client_loop,
                args=(url, i, stop, t_measure, image_hw, proprio_dim,
                      instruction, unnorm_key, latencies, errors, lock),
                daemon=True)
            for i in range(num_clients)
        ]
        t_start = time.monotonic()
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=warmup_s + duration_s + 300)
    else:
        import multiprocessing as mp

        from vla_adapter_tpu.data.image_processing import (
            spawn_without_accelerator,
        )

        ctx = mp.get_context("spawn")  # clean children: no inherited device state
        out_q = ctx.Queue()
        chunks = [list(range(num_clients))[i::processes] for i in range(processes)]
        chunks = [c for c in chunks if c]
        procs = [
            ctx.Process(
                target=_client_proc,
                args=(url, cids, stop, t_measure, image_hw, proprio_dim,
                      instruction, unnorm_key, out_q),
                daemon=True)
            for cids in chunks
        ]
        t_start = time.monotonic()
        with spawn_without_accelerator():  # ~1 s child boot, not 20-60 s
            for p in procs:
                p.start()
        for _ in procs:
            lat, err = out_q.get(timeout=warmup_s + duration_s + 600)
            latencies.extend(lat)
            errors.extend(err)
        for p in procs:
            p.join(timeout=60)
    elapsed = min(time.monotonic() - t_start, duration_s) or 1e-9

    lat = np.sort(np.asarray(latencies)) * 1e3  # ms
    # nearest-rank percentile: ceil(p/100 * n) - 1 (floor(n*p/100) would
    # bias small samples a rank high — p50 of 2 samples must be the 1st)
    pct = (lambda p: float(lat[max(0, -(-len(lat) * p // 100) - 1)])
           if len(lat) else None)
    return {
        "num_clients": num_clients,
        "duration_s": round(elapsed, 2),
        "completed": len(latencies),
        "errors": len(errors),
        "error_sample": errors[:3],
        "requests_per_s": round(len(latencies) / elapsed, 2),
        "latency_ms": {"p50": pct(50), "p90": pct(90), "p99": pct(99),
                       "mean": float(lat.mean()) if len(lat) else None},
    }


# ---------------------------------------------------------------------------
# Self-serving CLI
# ---------------------------------------------------------------------------


def _build_predictor(tiny: bool, int8: bool, act_int8: bool,
                     w8a8_impl: str = "auto"):
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp

    from vla_adapter_tpu.core.config import VLAConfig
    from vla_adapter_tpu.data.normalization import dataset_statistics
    from vla_adapter_tpu.infer.predict import Predictor
    from vla_adapter_tpu.models.layers import Runtime
    from vla_adapter_tpu.models.vla import VLAModel

    if tiny:
        from vla_adapter_tpu.core.config import (
            ActionHeadConfig, FusedVisionConfig, Qwen2Config, ViTConfig)
        from vla_adapter_tpu.core.constants import (
            NormalizationType, PlatformConstants)

        cfg = VLAConfig(
            custom_constants=PlatformConstants(
                name="loadtest", num_actions_chunk=8, action_dim=7,
                proprio_dim=8,
                normalization_type=NormalizationType.BOUNDS_Q99,
                num_action_query_tokens=16),
            vision=FusedVisionConfig(
                primary=ViTConfig(name="p", image_size=28, patch_size=14,
                                  hidden_size=32, num_layers=2, num_heads=4,
                                  mlp_dim=64),
                fused=None, num_images=2),
            llm=Qwen2Config(vocab_size=512, hidden_size=64, num_layers=2,
                            num_heads=4, num_kv_heads=2,
                            intermediate_size=128, head_dim=16),
            head=ActionHeadConfig(num_blocks=2, hidden_dim=64),
            max_text_tokens=64,
        )
        rt = Runtime(dtype=jnp.float32, param_dtype=jnp.float32,
                     attn_impl="xla")
    else:
        cfg = VLAConfig()
        # Build params directly in the (possibly quantized) runtime layout:
        # letting Predictor quantize would device_get + re-put ~2 GB of
        # zeros, which through the local TPU tunnel costs tens of minutes.
        rt = Runtime(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                     attn_impl="auto", weights_int8=int8 or act_int8,
                     act_int8=act_int8, w8a8_impl=w8a8_impl)
        int8 = act_int8 = False

    # Shape the zero params with the NON-stacked layout: under "fused" the
    # scanned stacks declare their int8 MLP kernels in the separate
    # "qstack" collection, but Predictor expects `params` as a full
    # quantize_params-style tree and performs the qstack split itself
    # per backend (keyed on rt.w8a8_impl, incl. the "auto" pair).
    layout_rt = rt if rt.w8a8_impl == "xla" else _dc.replace(
        rt, w8a8_impl="xla")
    model = VLAModel(cfg, layout_rt)
    v = cfg.vision
    shapes = jax.eval_shape(lambda: model.init(
        jax.random.key(0),
        input_ids=jnp.zeros((1, cfg.max_text_tokens), jnp.int32),
        prompt_len=jnp.array([5], jnp.int32),
        text_valid=jnp.ones((1, cfg.max_text_tokens), jnp.int32),
        pixel_values=jnp.zeros(
            (1, v.num_images, v.primary.image_size, v.primary.image_size,
             v.channels_per_image), jnp.float32),
        proprio=jnp.zeros((1, cfg.constants.proprio_dim), jnp.float32),
    ))["params"]
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    rng = np.random.default_rng(0)
    stats = {"loadtest": dataset_statistics(
        rng.uniform(-1, 1, size=(200, cfg.constants.action_dim)),
        proprio=rng.normal(size=(200, cfg.constants.proprio_dim)))}

    # hash tokenizer: deterministic ids without tokenizer assets (prompt
    # timing is identical; the weights are zeros anyway)
    def tokenize(text: str) -> List[int]:
        return [(hash(w) % 1000) + 10 for w in text.split()][:48]

    return Predictor(cfg=cfg, params=params, tokenize=tokenize,
                     norm_stats=stats, rt=rt, int8=int8, act_int8=act_int8,
                     w8a8_impl=w8a8_impl)


def main(argv: Optional[List[str]] = None) -> Dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--url", default=None,
                   help="measure an existing server instead of self-serving")
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--processes", type=int, default=4,
                   help="client worker processes (>1 keeps client-side "
                        "base64/JSON work off the server's GIL)")
    p.add_argument("--duration", type=float, default=30.0)
    p.add_argument("--warmup", type=float, default=10.0)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--int8", action="store_true")
    p.add_argument("--act-int8", action="store_true")
    p.add_argument("--w8a8-impl", default="auto",
                   choices=("auto", "xla", "fused"),
                   help="w8a8 matmul backend: 'auto' dispatches per batch "
                        "bucket (fused whole-MLP Pallas kernel at batch 1, "
                        "XLA above — the measured crossover; "
                        "models/layers.resolve_w8a8_impl)")
    p.add_argument("--dynamic-batch", action="store_true")
    p.add_argument("--prewarm", action="store_true",
                   help="compile every batch bucket before applying load")
    p.add_argument("--max-batch", type=int, default=16)
    p.add_argument("--max-wait-ms", type=float, default=8.0)
    p.add_argument("--preprocess-workers", type=int, default=0,
                   help="server-side image-pipeline process pool size")
    args = p.parse_args(argv)

    server = None
    url = args.url
    if url is None:
        import jax

        from vla_adapter_tpu.serve.server import ActionServer

        # compiles dominate cold starts (5 bucket sizes x the flagship
        # graph); persist them across runs like bench.py does
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/vla_adapter_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

        predictor = _build_predictor(args.tiny, args.int8, args.act_int8,
                                     args.w8a8_impl)
        if args.prewarm:
            rng = np.random.default_rng(9)
            hw = predictor.cfg.vision.primary.image_size
            n_img = predictor.cfg.vision.num_images
            ladder = [1]
            while ladder[-1] < args.max_batch:
                ladder.append(ladder[-1] * 2)  # mirror DynamicBatcher buckets
            for b in ladder:
                imgs = [[rng.integers(0, 255, size=(hw, hw, 3), dtype=np.uint8)
                         for _ in range(n_img)] for _ in range(b)]
                predictor.predict_action_batch(
                    imgs, ["warm"] * b,
                    [np.zeros(predictor.cfg.constants.proprio_dim,
                              np.float32)] * b)
                print(f"prewarmed bucket {b}", flush=True)
        server = ActionServer(
            predictor, host="127.0.0.1", port=0,
            dynamic_batch=args.dynamic_batch, max_batch=args.max_batch,
            max_wait_ms=args.max_wait_ms,
            preprocess_workers=args.preprocess_workers)
        port = server.serve_background()
        url = f"http://127.0.0.1:{port}/act"

    try:
        stats = run_load(url, args.clients, args.duration,
                         warmup_s=args.warmup, unnorm_key=None,
                         processes=args.processes)
        chunk = 8
        stats["actions_per_s"] = round(stats["requests_per_s"] * chunk, 1)
        if server is not None and server.batcher is not None:
            sizes = server.batcher.stats()["batch_sizes"]
            stats["batch_size_hist"] = dict(sorted(Counter(sizes).items()))
        print(json.dumps(stats))
        return stats
    finally:
        if server is not None:
            server.shutdown()
            if server.batcher is not None:
                server.batcher.close()


if __name__ == "__main__":
    main()
