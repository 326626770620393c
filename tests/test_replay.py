"""Sim-free replay harness for the closed-loop eval protocols.

Strategy (the strongest evidence available without the LIBERO/CALVIN
simulators): run the REAL episode loops (eval/libero.run_episode,
eval/calvin.rollout_subtask + CalvinPolicy) against a deterministic
scripted env + scripted policy, record every env action and policy query,
and check the trace two ways:

1. **Protocol invariants hardcoded from the reference** (constants are
   duplicated literally in this file, NOT imported from the code under
   test, so a drift in either side fails):
     * LIBERO (run_libero_eval.py:283-359): 10 no-op settle steps of
       [0]*6+[-1] with zero policy queries, then one query per 8 executed
       steps, chunk executed strictly open-loop in order, gripper
       [0,1] -> binarize(sign(2g-1)) -> invert, done => success.
     * CALVIN (evaluate_calvin.py:392-508): hi3 schedule — queries at
       cycle steps 0/1/2, the (a2,b1,c0) combo used TWICE (cycle steps 2
       and 3), a7/b6/c5 never used, (b7,c6)/2 and bare-c7 tails; the
       CALVIN gripper flip 1-a before the standard action pipeline
       (vla_evaluation.py:311).

2. **Checked-in golden fixtures** (tests/fixtures/*_replay.json):
   step-for-step action traces; any behavioral drift in the queue,
   ensemble, settle, or gripper code changes the trace and fails.

Regenerate fixtures after an *intentional* protocol change:
    python tests/test_replay.py --write
"""

import json
import pathlib
import sys

import numpy as np
import pytest  # noqa: F401

if __name__ == "__main__":  # `python tests/test_replay.py --write`
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from vla_adapter_tpu.eval.calvin import CalvinEvalConfig, CalvinPolicy, rollout_subtask
from vla_adapter_tpu.eval.libero import LiberoEvalConfig, run_episode

FIXTURES = pathlib.Path(__file__).parent / "fixtures"

# --- reference protocol constants, duplicated on purpose ------------------
REF_SETTLE_STEPS = 10                      # run_libero_eval.py:321-326
REF_DUMMY_ACTION = [0, 0, 0, 0, 0, 0, -1]  # libero_utils.py get_libero_dummy_action
REF_CHUNK = 8                              # num_open_loop_steps
# evaluate_calvin.py:392-508 — (query_buffer_or_None, [(buffer, chunk_idx)])
REF_HI3 = [
    (0, [(0, 0)]),
    (1, [(0, 1), (1, 0)]),
    (2, [(0, 2), (1, 1), (2, 0)]),
    (None, [(0, 2), (1, 1), (2, 0)]),
    (None, [(0, 3), (1, 2), (2, 1)]),
    (None, [(0, 4), (1, 3), (2, 2)]),
    (None, [(0, 5), (1, 4), (2, 3)]),
    (None, [(0, 6), (1, 5), (2, 4)]),
    (None, [(1, 7), (2, 6)]),
    (None, [(2, 7)]),
]


def ref_process_action(a):
    """run_libero_eval.py:269-280: binarize gripper by sign(2g-1), invert."""
    out = np.array(a, np.float64)
    out[-1] = -np.sign(2.0 * out[-1] - 1.0)
    return out


# --- scripted world --------------------------------------------------------


def scripted_chunk(query_idx: int) -> np.ndarray:
    """Pure function of the query index: (8, 7) chunk, gripper in [0, 1]
    alternating across the binarize threshold."""
    i = np.arange(REF_CHUNK, dtype=np.float64)[:, None]
    j = np.arange(7, dtype=np.float64)[None, :]
    chunk = np.sin(0.7 * (query_idx + 1) + 0.3 * i + 1.3 * j) * 0.5
    chunk[:, -1] = ((np.arange(REF_CHUNK) + query_idx) % 2) * 0.8 + 0.1
    return chunk


class ScriptedLiberoEnv:
    """Deterministic stand-in implementing the exact API run_episode uses.
    Emits 224px images so the parity resize path is a bit-stable no-op."""

    def __init__(self, done_at: int = 37):
        self.t = 0
        self.done_at = done_at
        self.actions = []

    def reset(self):
        self.t = 0
        self.actions = []

    def _obs(self):
        img = np.full((224, 224, 3), (self.t * 7) % 256, np.uint8)
        return {
            "agentview_image": img,
            "robot0_eye_in_hand_image": img[::-1],
            "robot0_eef_pos": np.array([0.1, 0.2, 0.3 + 0.01 * self.t]),
            "robot0_eef_quat": np.array([0.0, 0.0, 0.0, 1.0]),
            "robot0_gripper_qpos": np.array([0.04, -0.04]),
        }

    def set_init_state(self, state):
        return self._obs()

    def get_observation(self):
        return self._obs()

    def step(self, action):
        self.actions.append(list(np.asarray(action, np.float64)))
        self.t += 1
        done = len(self.actions) - 1 == self.done_at
        return self._obs(), 0.0, done, {}


class ScriptedCalvinEnv:
    def __init__(self, success_at: int = 23):
        self.t = 0
        self.success_at = success_at
        self.actions = []

    def get_obs(self):
        img = np.full((224, 224, 3), (self.t * 5) % 256, np.uint8)
        return {
            "rgb_obs": {"rgb_static": img, "rgb_gripper": img[::-1]},
            "robot_obs": np.linspace(-1, 1, 15) + 0.01 * self.t,
        }

    def get_info(self):
        return {"t": self.t}

    def step(self, action):
        self.actions.append(list(np.asarray(action, np.float64)))
        self.t += 1
        return self.get_obs(), 0.0, False, {"t": self.t}


class ScriptedOracle:
    def __init__(self, env: ScriptedCalvinEnv):
        self.env = env

    def get_task_info_for_set(self, start_info, info, subtasks):
        return list(subtasks) if info["t"] - 1 == self.env.success_at else []


class FakePredictor:
    """Duck-typed infer.Predictor for CalvinPolicy: records the proprio it
    receives; emits scripted chunks."""

    def __init__(self):
        self.queries = 0
        self.proprios = []

    def predict_action(self, images, instruction, proprio=None,
                       unnorm_key=None):
        assert len(images) == 2 and unnorm_key == "calvin_abc_rlds"
        self.proprios.append(np.asarray(proprio))
        chunk = scripted_chunk(self.queries)
        self.queries += 1
        return chunk


# --- trace recording --------------------------------------------------------


def record_libero_trace():
    env = ScriptedLiberoEnv()
    queries = []

    def policy(obs, task):
        queries.append({
            "env_step": len(env.actions),
            "state": [round(float(x), 8) for x in obs["state"]],
        })
        return scripted_chunk(len(queries) - 1)

    cfg = LiberoEvalConfig(task_suite_name="libero_spatial",
                           num_open_loop_steps=REF_CHUNK)
    success, frames = run_episode(env, "scripted task", policy, cfg)
    return {
        "success": bool(success),
        "num_frames": len(frames),
        "env_actions": [[round(v, 8) for v in a] for a in env.actions],
        "queries": queries,
    }


def record_calvin_trace():
    env = ScriptedCalvinEnv()
    pred = FakePredictor()
    policy = CalvinPolicy(pred, CalvinEvalConfig())
    ok = rollout_subtask(env, policy, ScriptedOracle(env), "push_button",
                         "push the button", CalvinEvalConfig(ep_len=5))
    return {
        "success": bool(ok),
        "env_actions": [[round(v, 8) for v in a] for a in env.actions],
        "num_queries": pred.queries,
        "proprios": [[round(float(x), 8) for x in p] for p in pred.proprios],
    }


# --- protocol-invariant tests (reference constants, not snapshots) ---------


def test_libero_settle_then_openloop_queue():
    trace = record_libero_trace()
    acts = np.asarray(trace["env_actions"])

    # 10 settle no-ops, zero policy queries during them
    assert len(acts) >= REF_SETTLE_STEPS
    np.testing.assert_array_equal(acts[:REF_SETTLE_STEPS],
                                  np.tile(REF_DUMMY_ACTION, (REF_SETTLE_STEPS, 1)))
    assert all(q["env_step"] >= REF_SETTLE_STEPS for q in trace["queries"])

    # queries exactly when the queue drains: env steps 10, 18, 26, ...
    expected_query_steps = list(range(REF_SETTLE_STEPS, len(acts), REF_CHUNK))
    assert [q["env_step"] for q in trace["queries"]] == expected_query_steps

    # every executed action is process_action(chunk[q][k]) in strict order
    for t in range(REF_SETTLE_STEPS, len(acts)):
        q, k = divmod(t - REF_SETTLE_STEPS, REF_CHUNK)
        expected = ref_process_action(scripted_chunk(q)[k])
        np.testing.assert_allclose(acts[t], expected, atol=1e-8,
                                   err_msg=f"env step {t} (query {q} idx {k})")

    # gripper strictly in {-1, +1} after binarize+invert
    assert set(np.unique(acts[REF_SETTLE_STEPS:, -1])) <= {-1.0, 1.0}

    # scripted env raises done at step 37 -> success, loop stops right there
    assert trace["success"] and len(acts) == 38


def test_calvin_hi3_schedule_and_gripper_flip():
    trace = record_calvin_trace()
    acts = np.asarray(trace["env_actions"])

    # success_at=23 -> 24 env steps; queries only at cycle steps 0/1/2
    assert trace["success"] and len(acts) == 24
    expected_queries = sum(1 for t in range(len(acts))
                           if REF_HI3[t % len(REF_HI3)][0] is not None)
    assert trace["num_queries"] == expected_queries

    # proprio = [robot_obs[:7], robot_obs[-1:]] (vla_evaluation.py:290-296)
    env2 = ScriptedCalvinEnv()
    for qi, p in enumerate(trace["proprios"][:1]):
        ro = env2.get_obs()["robot_obs"]
        np.testing.assert_allclose(p, np.concatenate([ro[:7], ro[-1:]]),
                                   atol=1e-8)

    # reconstruct expected actions from the REF schedule + gripper flips
    buffers = {}
    n_queries = 0
    for t in range(len(acts)):
        slot, combo = REF_HI3[t % len(REF_HI3)]
        if slot is not None:
            chunk = scripted_chunk(n_queries).copy()
            chunk[:, -1] = 1.0 - chunk[:, -1]  # CalvinPolicy flip
            buffers[slot] = chunk
            n_queries += 1
        ensembled = np.mean([buffers[b][c] for b, c in combo], axis=0)
        expected = ref_process_action(ensembled)
        np.testing.assert_allclose(acts[t], expected, atol=1e-8,
                                   err_msg=f"env step {t}")

    # the double-use quirk: cycle steps 2 and 3 use the SAME combo, so with
    # a static buffer state their raw ensemble matches
    assert REF_HI3[2][1] == REF_HI3[3][1]


def test_calvin_enrich_lang_substitution():
    """Enriched-language protocol (reference evaluate_calvin.py:211-215,
    346,398): enrich_lang swaps the whole annotation table for the shipped
    enrich_lang_annotations.json and the instruction is annotations[
    subtask][0] — the first paraphrase, never sampled."""
    from vla_adapter_tpu.eval.calvin import eval_calvin, load_enriched_annotations

    table = load_enriched_annotations()
    # the reference JSON: 34 tasks, ~48 paraphrases each, first entries fixed
    assert len(table) == 34
    assert all(isinstance(v, list) and len(v) >= 2 for v in table.values())
    assert table["rotate_red_block_right"][0] == "Turn the red block to the right"

    seen = []

    class RecordingPredictor(FakePredictor):
        def predict_action(self, images, instruction, proprio=None,
                           unnorm_key=None):
            seen.append(instruction)
            return super().predict_action(images, instruction,
                                          proprio=proprio,
                                          unnorm_key=unnorm_key)

    def run(enrich: bool):
        seen.clear()
        env = ScriptedCalvinEnv()
        env.reset = lambda **kw: None  # eval_calvin resets chains
        standard = {"rotate_red_block_right": ["standard wording"]}
        chains = [({"robot_obs": np.zeros(15), "scene_obs": np.zeros(24)},
                   ["rotate_red_block_right"])]
        cfg = CalvinEvalConfig(ep_len=5, enrich_lang=enrich)
        res = eval_calvin(RecordingPredictor(),
                          (env, ScriptedOracle(env), standard, chains), cfg)
        assert res["num_chains"] == 1
        return list(seen)

    assert set(run(False)) == {"standard wording"}
    assert set(run(True)) == {"Turn the red block to the right"}


# --- golden fixture tests ---------------------------------------------------


def _check_fixture(name, trace):
    path = FIXTURES / name
    assert path.exists(), (
        f"fixture {name} missing — run `python tests/test_replay.py --write`"
    )
    golden = json.loads(path.read_text())
    assert trace == golden, (
        f"replay trace drifted from {name}; if the protocol change is "
        f"intentional, regenerate with `python tests/test_replay.py --write`"
    )


def test_libero_replay_matches_fixture():
    _check_fixture("libero_replay.json", record_libero_trace())


def test_calvin_replay_matches_fixture():
    _check_fixture("calvin_replay.json", record_calvin_trace())


if __name__ == "__main__":
    if "--write" in sys.argv:
        FIXTURES.mkdir(exist_ok=True)
        (FIXTURES / "libero_replay.json").write_text(
            json.dumps(record_libero_trace(), indent=1))
        (FIXTURES / "calvin_replay.json").write_text(
            json.dumps(record_calvin_trace(), indent=1))
        print("fixtures written to", FIXTURES)
