"""Dynamic micro-batching for /act serving (serve/batching.py)."""

import threading
import time

import numpy as np

from vla_adapter_tpu.serve.batching import DynamicBatcher, _bucket


class FakeBatchPredictor:
    """Deterministic per-request result: mean(image) + len(instruction) +
    proprio[0]; records the forward batch sizes it saw."""

    def __init__(self, delay_s=0.0):
        self.calls = []
        self.delay_s = delay_s
        self.lock = threading.Lock()

    def predict_action_batch(self, images_batch, instructions,
                             proprio_batch=None, unnorm_key=None):
        with self.lock:
            self.calls.append(
                (len(instructions), unnorm_key, proprio_batch is not None)
            )
        if self.delay_s:
            time.sleep(self.delay_s)
        out = []
        for i, (imgs, ins) in enumerate(zip(images_batch, instructions)):
            p = 0.0 if proprio_batch is None else float(proprio_batch[i][0])
            out.append(np.full((8, 7), float(np.mean(imgs[0])) + len(ins) + p))
        return np.stack(out)


def _req(i):
    return ([np.full((4, 4, 3), i, np.uint8)], f"task {i}",
            np.array([i * 10.0, 0.0]))


def test_bucket():
    assert _bucket(1, (1, 2, 4)) == 1
    assert _bucket(3, (1, 2, 4)) == 4
    assert _bucket(9, (1, 2, 4)) == 4  # clamps to the largest


def test_concurrent_requests_coalesce_and_match():
    fake = FakeBatchPredictor(delay_s=0.02)
    b = DynamicBatcher(fake, max_batch=8, max_wait_ms=50.0)
    results = {}

    def call(i):
        imgs, ins, pr = _req(i)
        results[i] = b.predict(imgs, ins, proprio=pr, unnorm_key="k")

    threads = [threading.Thread(target=call, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    b.close()

    for i in range(8):
        imgs, ins, pr = _req(i)
        expect = float(np.mean(imgs[0])) + len(ins) + pr[0]
        np.testing.assert_allclose(results[i], np.full((8, 7), expect))
    # 8 concurrent requests must NOT take 8 forwards (the first may run
    # alone before the rest enqueue, but coalescing must happen)
    stats = b.stats()
    assert stats["num_requests"] == 8
    assert stats["num_forwards"] < 8, stats
    assert max(stats["batch_sizes"]) > 1


def test_groups_split_by_unnorm_key_and_proprio():
    fake = FakeBatchPredictor(delay_s=0.05)
    b = DynamicBatcher(fake, max_batch=8, max_wait_ms=200.0)
    results = {}

    def call(i, key, with_proprio):
        imgs, ins, pr = _req(i)
        results[i] = b.predict(
            imgs, ins, proprio=pr if with_proprio else None, unnorm_key=key)

    specs = [(0, "a", True), (1, "a", True), (2, "b", True), (3, "a", False)]
    # prime the worker so the remaining requests queue while it sleeps,
    # then arrive as one drained batch with mixed keys
    threads = [threading.Thread(target=call, args=s) for s in specs]
    for t in threads:
        t.start()
        time.sleep(0.005)
    for t in threads:
        t.join()
    b.close()
    keys = sorted((k, has_p) for _, k, has_p in fake.calls)
    # every (key, proprio) combination ran in its own forward
    assert ("b", True) in keys and ("a", False) in keys
    for i, key, with_p in specs:
        imgs, ins, pr = _req(i)
        expect = float(np.mean(imgs[0])) + len(ins) + (pr[0] if with_p else 0)
        np.testing.assert_allclose(results[i], np.full((8, 7), expect))


def test_error_propagates_to_caller():
    class Exploding:
        def predict_action_batch(self, *a, **k):
            raise ValueError("boom")

    b = DynamicBatcher(Exploding(), max_batch=2, max_wait_ms=1.0)
    try:
        b.predict([np.zeros((2, 2, 3), np.uint8)], "x")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "boom" in str(e)
    finally:
        b.close()


def test_server_dynamic_batch_roundtrip():
    """ActionServer(dynamic_batch=True) serves concurrent HTTP clients
    through one coalesced forward path."""
    import json
    import urllib.request

    from vla_adapter_tpu.serve.server import (
        ActionServer,
        decode_payload,
        encode_ndarray,
    )

    fake = FakeBatchPredictor(delay_s=0.02)
    server = ActionServer(fake, host="127.0.0.1", port=0,
                          dynamic_batch=True, max_wait_ms=50.0)
    port = server.serve_background()
    results = {}

    def call(i):
        payload = {
            "full_image": encode_ndarray(np.full((4, 4, 3), i, np.uint8)),
            "instruction": f"task {i}",
            "proprio": encode_ndarray(np.array([i * 10.0, 0.0])),
            "unnorm_key": "k",
        }
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/act",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=10) as resp:
            results[i] = decode_payload(json.loads(resp.read()))["action"]

    threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    server.shutdown()

    for i in range(6):
        imgs, ins, pr = _req(i)
        expect = float(np.mean(imgs[0])) + len(ins) + pr[0]
        np.testing.assert_allclose(results[i], np.full((8, 7), expect))
    assert sum(n for n, _, _ in fake.calls) >= 6
    assert len(fake.calls) < 6  # coalesced


def test_loadtest_run_load_against_fake_server():
    """serve/loadtest.run_load drives a live server and reports stats."""
    from vla_adapter_tpu.serve.loadtest import run_load
    from vla_adapter_tpu.serve.server import ActionServer

    fake = FakeBatchPredictor(delay_s=0.005)
    server = ActionServer(fake, host="127.0.0.1", port=0,
                          dynamic_batch=True, max_batch=8, max_wait_ms=5.0)
    port = server.serve_background()
    try:
        stats = run_load(f"http://127.0.0.1:{port}/act", num_clients=4,
                         duration_s=1.5, image_hw=8, proprio_dim=2,
                         warmup_s=0.3)
    finally:
        server.shutdown()
        server.batcher.close()
    assert stats["errors"] == 0, stats
    assert stats["completed"] > 10
    assert stats["latency_ms"]["p50"] > 0
    assert stats["latency_ms"]["p99"] >= stats["latency_ms"]["p50"]


def test_bucket_ladder_extends_past_defaults():
    fake = FakeBatchPredictor()
    b = DynamicBatcher(fake, max_batch=32, max_wait_ms=1.0)
    assert max(b.buckets) >= 32
    assert _bucket(17, b.buckets) == 32
    b.close()


def test_predict_after_close_raises_instead_of_hanging():
    b = DynamicBatcher(FakeBatchPredictor(), max_batch=4, max_wait_ms=1.0)
    b.close()
    try:
        b.predict(*_req(0))
        raise AssertionError("predict after close must raise")
    except RuntimeError:
        pass


def test_close_bounded_when_forward_is_wedged():
    """A device forward that never returns must not hang close(): it gives
    up after join_timeout_s, fails the stranded callers, and returns."""
    release = threading.Event()
    entered = threading.Event()

    class Wedged(FakeBatchPredictor):
        def predict_action_batch(self, *a, **kw):
            entered.set()
            release.wait(timeout=30)  # far longer than the close bound
            return super().predict_action_batch(*a, **kw)

    b = DynamicBatcher(Wedged(), max_batch=2, max_wait_ms=1.0)
    errors = []

    def call():
        try:
            b.predict(*_req(1))
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    t = threading.Thread(target=call, daemon=True)
    t.start()
    # Wait until the worker has actually entered the wedged forward — a
    # fixed sleep is racy under CPU load: if the worker has not yet picked
    # req 1 up, req 2 joins the same batch, nothing is left queued, and
    # close() has no stranded caller to fail.
    assert entered.wait(timeout=10), "worker never entered the forward"

    # a second request queued BEHIND the in-flight forward
    t2 = threading.Thread(target=call, daemon=True)
    t2.start()
    time.sleep(0.1)

    t0 = time.monotonic()
    b.close(join_timeout_s=1.0)
    assert time.monotonic() - t0 < 15, "close() failed to bound its wait"
    release.set()  # unwedge so the daemon worker can exit
    t2.join(timeout=5)
    assert not t2.is_alive(), "queued caller was stranded by close()"
    assert any(isinstance(e, RuntimeError) for e in errors)
