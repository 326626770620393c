"""Eval controllers, robot utils, and the /act server (driven over HTTP)."""

import json
import urllib.request

import numpy as np
import pytest

from vla_adapter_tpu.eval.openloop import (
    ActionQueueController,
    HI3_CYCLE_LEN,
    TemporalEnsembleController,
)
from vla_adapter_tpu.eval.robot_utils import (
    invert_gripper_action,
    normalize_gripper_action,
    process_action,
    quat2axisangle,
)
from vla_adapter_tpu.serve.server import ActionServer, decode_payload, encode_ndarray


def test_action_queue_controller():
    calls = []

    def policy(obs):
        calls.append(obs)
        return np.arange(8 * 7).reshape(8, 7) + 100 * len(calls)

    c = ActionQueueController(policy, num_open_loop_steps=8)
    acts = [c.step("o") for _ in range(17)]
    assert len(calls) == 3  # re-queried at steps 0, 8, 16
    np.testing.assert_array_equal(acts[0], np.arange(7) + 100)
    np.testing.assert_array_equal(acts[8], np.arange(7) + 200)
    c.reset()
    c.step("o")
    assert len(calls) == 4


def test_temporal_ensemble_schedule():
    """Replicates the reference hi3 cycle: queries at steps 0,1,2; the
    (a2,b1,c0) combo executes twice; tail steps (b7+c6)/2 then c7."""
    chunks = []

    def policy(obs):
        chunk = np.full((8, 1), float(len(chunks)))
        # encode chunk index in the value: chunk q has value q + idx/100
        chunk += np.arange(8)[:, None] / 100.0
        chunks.append(chunk)
        return chunk

    c = TemporalEnsembleController(policy)
    acts = [float(c.step("o")[0]) for _ in range(HI3_CYCLE_LEN)]
    assert len(chunks) == 3
    a = lambda q, i: q + i / 100.0
    expect = [
        a(0, 0),
        np.mean([a(0, 1), a(1, 0)]),
        np.mean([a(0, 2), a(1, 1), a(2, 0)]),
        np.mean([a(0, 2), a(1, 1), a(2, 0)]),  # the double-execution quirk
        np.mean([a(0, 3), a(1, 2), a(2, 1)]),
        np.mean([a(0, 4), a(1, 3), a(2, 2)]),
        np.mean([a(0, 5), a(1, 4), a(2, 3)]),
        np.mean([a(0, 6), a(1, 5), a(2, 4)]),
        np.mean([a(1, 7), a(2, 6)]),
        a(2, 7),
    ]
    np.testing.assert_allclose(acts, expect)
    # next cycle issues 3 fresh queries
    [c.step("o") for _ in range(HI3_CYCLE_LEN)]
    assert len(chunks) == 6


def test_gripper_pipeline():
    a = np.array([0.1, -0.2, 0.3, 0, 0, 0, 0.9])
    n = normalize_gripper_action(a, binarize=True)
    assert n[-1] == 1.0  # 0.9 -> 0.8 -> sign +1
    n2 = normalize_gripper_action(np.array([0, 0, 0, 0, 0, 0, 0.2]))
    assert n2[-1] == -1.0
    inv = invert_gripper_action(n)
    assert inv[-1] == -1.0 and (inv[:-1] == n[:-1]).all()
    p = process_action(np.array([0.5, 0, 0, 0, 0, 0, 1.0]))
    assert p[-1] == -1.0  # open (1.0) -> +1 -> inverted -> -1 (env open)


def test_quat2axisangle():
    # identity rotation
    np.testing.assert_allclose(quat2axisangle(np.array([0, 0, 0, 1.0])), 0)
    # 90deg about z: q = (0,0,sin45,cos45) -> axis-angle (0,0,pi/2)
    q = np.array([0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)])
    np.testing.assert_allclose(quat2axisangle(q), [0, 0, np.pi / 2], atol=1e-6)


class _FakePredictor:
    def predict_action(self, images, instruction, proprio=None, unnorm_key=None):
        assert images[0].dtype == np.uint8
        base = float(len(images)) + (0.0 if proprio is None else float(np.sum(proprio)))
        return np.full((8, 7), base, np.float32)


def test_act_server_http_roundtrip():
    server = ActionServer(_FakePredictor(), host="127.0.0.1", port=0)
    port = server.serve_background()
    try:
        payload = {
            "full_image": encode_ndarray(np.zeros((64, 64, 3), np.uint8)),
            "wrist_image": encode_ndarray(np.zeros((64, 64, 3), np.uint8)),
            "proprio": encode_ndarray(np.ones(8, np.float32)),
            "instruction": "pick up the cup",
        }
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/act",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            out = decode_payload(json.loads(resp.read()))
        np.testing.assert_allclose(out["action"], np.full((8, 7), 10.0))

        # probe: wrong path -> 404; malformed body -> 500 with error json
        bad = urllib.request.Request(f"http://127.0.0.1:{port}/nope",
                                     data=b"{}")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(bad, timeout=10)
        assert e.value.code == 404
        garbage = urllib.request.Request(f"http://127.0.0.1:{port}/act",
                                         data=b"not json")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(garbage, timeout=10)
        assert e.value.code == 500
    finally:
        server.shutdown()
