"""Eval-harness loop logic driven with fake environments (no simulators)."""

import numpy as np
import pytest

from vla_adapter_tpu.eval.calvin import (
    CalvinEvalConfig,
    CalvinPolicy,
    avg_seq_len,
    count_success,
    evaluate_policy,
    rollout_subtask,
)
from vla_adapter_tpu.eval.libero import (
    LiberoEvalConfig,
    NUM_STEPS_WAIT,
    run_episode,
)


class FakeLiberoEnv:
    """Mimics OffScreenRenderEnv: obs dict, settling, success after N steps."""

    def __init__(self, succeed_at=25):
        self.succeed_at = succeed_at
        self.t = 0
        self.actions = []

    def reset(self):
        self.t = 0

    def set_init_state(self, state):
        return self._obs()

    def get_observation(self):
        return self._obs()

    def _obs(self):
        rng = np.random.default_rng(self.t)
        return {
            "agentview_image": rng.integers(0, 255, (64, 64, 3), dtype=np.uint8),
            "robot0_eye_in_hand_image": rng.integers(0, 255, (64, 64, 3),
                                                     dtype=np.uint8),
            "robot0_eef_pos": np.zeros(3),
            "robot0_eef_quat": np.array([0, 0, 0, 1.0]),
            "robot0_gripper_qpos": np.zeros(2),
        }

    def step(self, action):
        self.t += 1
        self.actions.append(np.asarray(action))
        return self._obs(), 0.0, self.t >= self.succeed_at, {}


def test_libero_run_episode_success_and_protocol():
    calls = []

    def policy(obs, desc):
        calls.append(desc)
        assert obs["full_image"].shape == (32, 32, 3)
        assert obs["state"].shape == (8,)
        return np.tile(np.array([0.1, 0, 0, 0, 0, 0, 1.0]), (8, 1))

    cfg = LiberoEvalConfig(task_suite_name="libero_spatial",
                           num_open_loop_steps=8, image_size=32)
    env = FakeLiberoEnv(succeed_at=NUM_STEPS_WAIT + 12)
    ok, frames = run_episode(env, "pick the cup", policy, cfg,
                             initial_state=np.zeros(1))
    assert ok
    # 10 settle steps of the dummy action, then policy actions
    dummy = env.actions[0]
    assert dummy.tolist() == [0, 0, 0, 0, 0, 0, -1]
    assert len(calls) == 1 + (12 - 1) // 8  # re-query every 8 steps
    # gripper pipeline applied: 1.0 -> +1 -> inverted -> -1
    post = env.actions[NUM_STEPS_WAIT]
    assert post[-1] == -1.0
    assert len(frames) == 12  # one replay frame per policy step


def test_libero_run_episode_timeout():
    def policy(obs, desc):
        return np.zeros((8, 7))

    cfg = LiberoEvalConfig(task_suite_name="libero_spatial", image_size=32)
    env = FakeLiberoEnv(succeed_at=10_000)
    ok, frames = run_episode(env, "x", policy, cfg, initial_state=np.zeros(1))
    assert not ok
    assert len(frames) == 220  # TASK_MAX_STEPS[libero_spatial]


class FakeCalvinEnv:
    def __init__(self):
        self.t = 0

    def get_obs(self):
        rng = np.random.default_rng(self.t)
        return {
            "rgb_obs": {
                "rgb_static": rng.integers(0, 255, (200, 200, 3), dtype=np.uint8),
                "rgb_gripper": rng.integers(0, 255, (84, 84, 3), dtype=np.uint8),
            },
            "robot_obs": rng.normal(size=15),
        }

    def get_info(self):
        return {"t": self.t}

    def reset(self, robot_obs=None, scene_obs=None):
        self.t = 0

    def step(self, action):
        self.t += 1
        return self.get_obs(), 0.0, False, {"t": self.t}


class FakeOracle:
    """Declares success once t reaches a per-subtask threshold."""

    def __init__(self, thresholds):
        self.thresholds = thresholds

    def get_task_info_for_set(self, start_info, info, subtasks):
        (sub,) = tuple(subtasks)
        need = self.thresholds.get(sub)
        if need is not None and info["t"] - start_info["t"] >= need:
            return {sub}
        return set()


def test_calvin_rollout_and_chain_metrics():
    queries = []

    def policy(obs, instruction):
        queries.append(instruction)
        return np.zeros((8, 7))

    cfg = CalvinEvalConfig(ep_len=2)
    env = FakeCalvinEnv()
    oracle = FakeOracle({"open_drawer": 5, "impossible": None})
    assert rollout_subtask(env, policy, oracle, "open_drawer", "open it", cfg)
    env.reset()
    assert not rollout_subtask(env, policy, oracle, "impossible", "nope", cfg)

    # chains: first chain completes 2 subtasks then fails, second fails at 1
    annotations = {"open_drawer": ["open the drawer"],
                   "push_button": ["push the button"],
                   "impossible": ["do magic"]}
    oracle = FakeOracle({"open_drawer": 3, "push_button": 3})
    seqs = [
        ({"robot_obs": None, "scene_obs": None},
         ["open_drawer", "push_button", "impossible"]),
        ({"robot_obs": None, "scene_obs": None}, ["impossible"]),
    ]
    results = evaluate_policy(policy, FakeCalvinEnv(), oracle, annotations,
                              seqs, cfg)
    assert results == [2, 0]
    assert count_success(results) == [0.5, 0.5, 0.0, 0.0, 0.0]
    assert avg_seq_len(results) == 1.0


class _ChunkPredictor:
    cfg = None

    def predict_action(self, images, instruction, proprio=None,
                       unnorm_key=None):
        assert unnorm_key == "calvin_abc_rlds"
        assert images[0].shape == (200, 200, 3)
        assert proprio.shape == (8,)
        return np.full((8, 7), 0.25)


def test_calvin_policy_gripper_flip():
    policy = CalvinPolicy(_ChunkPredictor(), CalvinEvalConfig())
    chunk = policy(FakeCalvinEnv().get_obs(), "do it")
    assert chunk.shape == (8, 7)
    np.testing.assert_allclose(chunk[:, -1], 0.75)  # 1 - 0.25
    np.testing.assert_allclose(chunk[:, 0], 0.25)
