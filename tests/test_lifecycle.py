"""Full-lifecycle integration: one unbroken chain through every seam.

finetune (LoRA) -> orbax checkpoint -> LoRA merge -> reference-layout HF
export -> config + params reload -> Predictor -> /act server with dynamic
batching -> closed-loop fake-env LIBERO episode over HTTP.

Each seam has its own unit test elsewhere; this is the "a user can actually
switch" test — the reference's equivalent workflow spans finetune.py,
merge_lora_weights_and_save.py, deploy.py and run_libero_eval.py.
"""

import dataclasses
import json
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_eval_harness import FakeLiberoEnv
from tests.test_train_step import TINY_CFG
from vla_adapter_tpu.core.config import OptimizerConfig, TrainConfig
from vla_adapter_tpu.data.normalization import dataset_statistics
from vla_adapter_tpu.data.tokenization import MockTokenizer
from vla_adapter_tpu.eval.libero import LiberoEvalConfig, run_episode
from vla_adapter_tpu.infer.predict import Predictor
from vla_adapter_tpu.models.layers import Runtime
from vla_adapter_tpu.serve.server import (
    ActionServer,
    decode_payload,
    encode_ndarray,
)
from vla_adapter_tpu.train.checkpoints import find_resume_checkpoint, load_params
from vla_adapter_tpu.train.loop import finetune
from vla_adapter_tpu.weights.export import export_checkpoint_dir
from vla_adapter_tpu.weights.load import (
    load_norm_stats,
    load_vla_params,
    vla_config_from_checkpoint,
)
from vla_adapter_tpu.weights.merge import merge_checkpoint


@pytest.mark.slow
def test_full_lifecycle(tmp_path):
    pytest.importorskip("torch")

    model_cfg = dataclasses.replace(
        TINY_CFG,
        vision=dataclasses.replace(TINY_CFG.vision, num_images=2),
        max_text_tokens=96,
    )
    rt = Runtime(dtype=jnp.float32, param_dtype=jnp.float32, attn_impl="xla",
                 lora_rank=2, lora_scale=2.0)

    # --- 1. finetune with LoRA; checkpoint lands under run_root_dir -------
    tcfg = TrainConfig(
        model=model_cfg,
        optim=OptimizerConfig(learning_rate=1e-3, max_steps=3,
                              num_steps_before_decay=100),
        batch_size=2,
        data_axis=2,  # batch 2 over 2 of the 8 fake devices
        run_root_dir=str(tmp_path / "runs"),
        save_freq=2,
        log_freq=10,
        remat_llm=False,
    )
    finetune(tcfg, rt=rt)
    run_dir = next((tmp_path / "runs").iterdir())
    ckpt = find_resume_checkpoint(run_dir)
    assert ckpt is not None

    # --- 2. merge the LoRA adapters into deployment params ----------------
    merged_dir = merge_checkpoint(ckpt, tmp_path / "merged", lora_scale=2.0)
    params = load_params(merged_dir)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    assert not any("lora" in jax.tree_util.keystr(p) for p, _ in flat)

    # --- 3. export a reference-layout checkpoint dir ----------------------
    rng = np.random.default_rng(0)
    stats = {"libero_spatial": dataset_statistics(
        rng.uniform(-1, 1, size=(300, 7)),
        proprio=rng.normal(size=(300, 8)),
        action_mask=[True] * 6 + [False],
    )}
    export_dir = export_checkpoint_dir(
        jax.device_get(params), model_cfg, tmp_path / "export",
        norm_stats=json.loads(json.dumps(stats)),
    )
    assert (export_dir / "model.safetensors").exists()
    assert (export_dir / "config.json").exists()

    # --- 4. reload config + params + stats from the exported dir ----------
    cfg2 = vla_config_from_checkpoint(export_dir)
    assert cfg2 == model_cfg  # lossless round-trip incl. custom geometry
    params2 = load_vla_params(export_dir, cfg2)
    tok = MockTokenizer()
    predictor = Predictor(
        cfg=cfg2,
        params=params2,
        tokenize=lambda t: tok(t).input_ids,
        norm_stats=load_norm_stats(export_dir),
        rt=Runtime(dtype=jnp.float32, param_dtype=jnp.float32,
                   attn_impl="xla"),
        center_crop=False,
    )

    # the reloaded stack equals the in-memory merged params
    imgs = [rng.integers(0, 255, size=(40, 40, 3), dtype=np.uint8)
            for _ in range(2)]
    direct = Predictor(
        cfg=model_cfg, params=params,
        tokenize=lambda t: tok(t).input_ids,
        norm_stats=predictor.norm_stats,
        rt=predictor.rt, center_crop=False,
    )
    p8 = rng.normal(size=8)
    np.testing.assert_allclose(
        predictor.predict_action(imgs, "lift the cup", proprio=p8),
        direct.predict_action(imgs, "lift the cup", proprio=p8),
        atol=1e-5, rtol=1e-5,
    )

    # --- 5. serve it, 6. drive a closed-loop fake-env episode over HTTP ---
    server = ActionServer(predictor, host="127.0.0.1", port=0,
                          dynamic_batch=True, max_batch=4, max_wait_ms=2.0)
    port = server.serve_background()
    url = f"http://127.0.0.1:{port}/act"

    def http_policy(obs, task_description):
        payload = {
            "full_image": encode_ndarray(obs["full_image"]),
            "wrist_image": encode_ndarray(obs["wrist_image"]),
            "proprio": encode_ndarray(obs["state"].astype(np.float32)),
            "instruction": task_description,
            "unnorm_key": "libero_spatial",
        }
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as resp:
            out = decode_payload(json.loads(resp.read()))
        action = np.asarray(out["action"])
        assert action.shape == (8, 7)
        return action

    try:
        env = FakeLiberoEnv(succeed_at=24)
        ecfg = LiberoEvalConfig(task_suite_name="libero_spatial",
                                image_size=32, num_open_loop_steps=8)
        success, replay = run_episode(
            env, "put the bowl on the plate", http_policy, ecfg)
    finally:
        server.shutdown()
        server.batcher.close()

    assert success
    # the episode really flowed through the batched server forward
    # (succeed_at=24: 10 settle steps + 14 policy steps = 2 chunk queries)
    assert server.batcher.stats()["num_requests"] >= 2
    # gripper convention applied on the way into the env: env actions are
    # clipped/mapped by robot utils inside the loop — just check shape flow
    assert env.actions and env.actions[0].shape == (7,)
