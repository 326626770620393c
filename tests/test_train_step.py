"""Train-step tests: loss decreases, LoRA partitioning, multi-device mesh.

SURVEY.md section 4: the reference has no unit tests; its smoke path is a
DummyDataset train loop. We add that plus what it lacks — a multi-device
sharding test on the 8-device CPU fake cluster.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # train-step compiles dominate

import jax
import jax.numpy as jnp

from vla_adapter_tpu.core.config import (
    ActionHeadConfig,
    FusedVisionConfig,
    OptimizerConfig,
    Qwen2Config,
    TrainConfig,
    ViTConfig,
    VLAConfig,
)
from vla_adapter_tpu.core.constants import NormalizationType, PlatformConstants
from vla_adapter_tpu.data.dummy import DummyDataset, make_dummy_batch
from vla_adapter_tpu.models.layers import Runtime
from vla_adapter_tpu.models.vla import VLAModel
from vla_adapter_tpu.parallel.sharding import (
    create_mesh,
    params_shardings,
    shard_batch,
    shard_params,
)
from vla_adapter_tpu.train.optim import make_optimizer
from vla_adapter_tpu.train.partition import merge_trees, split_trainable
from vla_adapter_tpu.train.step import TrainState, init_train_state, make_train_step

TINY_CFG = VLAConfig(
    platform="libero",
    custom_constants=PlatformConstants(
        name="test", num_actions_chunk=8, action_dim=7, proprio_dim=8,
        normalization_type=NormalizationType.BOUNDS_Q99,
        num_action_query_tokens=16,
    ),
    vision=FusedVisionConfig(
        primary=ViTConfig(name="p", image_size=28, patch_size=14, hidden_size=32,
                          num_layers=2, num_heads=4, mlp_dim=64,
                          use_cls_token=True, num_register_tokens=2,
                          pos_embed_patches_only=True, layer_scale_init=1e-5),
        fused=None,
        num_images=2,
    ),
    llm=Qwen2Config(vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
                    num_kv_heads=2, intermediate_size=128, head_dim=16),
    head=ActionHeadConfig(num_blocks=2, hidden_dim=64, use_pro_version=True),
    max_text_tokens=32,
)


import functools


@functools.lru_cache(maxsize=None)
def _setup_cached(lora_rank, accum, batch_size):
    return _setup_impl(lora_rank, accum, batch_size)


def _setup(lora_rank, accum=1, batch_size=4):
    """Cached across tests — the jitted step dominates suite runtime."""
    return _setup_cached(lora_rank, accum, batch_size)


def _setup_impl(lora_rank, accum=1, batch_size=4):
    rt = Runtime(dtype=jnp.float32, param_dtype=jnp.float32, attn_impl="xla",
                 lora_rank=lora_rank, lora_scale=2.0)
    model = VLAModel(TINY_CFG, rt)
    tcfg = TrainConfig(
        model=TINY_CFG,
        optim=OptimizerConfig(learning_rate=1e-3, max_steps=100,
                              num_steps_before_decay=1000),
        grad_accumulation_steps=accum,
    )
    tx = make_optimizer(tcfg.optim, warmup_steps=0)
    rng = np.random.default_rng(0)
    batch = make_dummy_batch(TINY_CFG, batch_size, rng, accum if accum > 1 else None)
    batch = jax.tree.map(jnp.asarray, batch)
    state = init_train_state(model, tx,
                             jax.tree.map(lambda x: x[0], batch) if accum > 1 else batch,
                             jax.random.key(0), lora_enabled=lora_rank > 0)
    step = jax.jit(make_train_step(model, tx, tcfg))
    return model, state, step, batch


def test_lora_partition_structure():
    _, state, _, _ = _setup(lora_rank=4)
    train_paths = {jax.tree_util.keystr(p, simple=True, separator="/")
                   for p, _ in jax.tree_util.tree_flatten_with_path(state.trainable)[0]}
    frozen_paths = {jax.tree_util.keystr(p, simple=True, separator="/")
                    for p, _ in jax.tree_util.tree_flatten_with_path(state.frozen)[0]}
    assert any("lora_a" in p for p in train_paths)
    assert any(p.startswith("action_head") for p in train_paths)
    assert any(p.startswith("proprio_projector") for p in train_paths)
    assert any(p.startswith("action_queries") for p in train_paths)
    assert not any("lora" in p for p in frozen_paths)
    # base VLM kernels stay frozen (the head's own q_proj is trainable)
    assert any(p.startswith("language_model") and "q_proj/kernel" in p
               for p in frozen_paths)
    assert not any(p.startswith("language_model") and "q_proj/kernel" in p
                   for p in train_paths)
    # merge is lossless
    merged = merge_trees(state.trainable, state.frozen)
    assert len(jax.tree.leaves(merged)) == len(
        jax.tree.leaves(state.trainable)) + len(jax.tree.leaves(state.frozen))


def test_loss_decreases_lora():
    _, state, step, batch = _setup(lora_rank=4)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_grad_accumulation_matches_big_batch():
    """accum=2 over half-batches == one step over the full batch."""
    model, state, step2, batch2 = _setup(lora_rank=4, accum=2)
    tcfg1 = TrainConfig(model=TINY_CFG,
                        optim=OptimizerConfig(learning_rate=1e-3, max_steps=100,
                                              num_steps_before_decay=1000),
                        grad_accumulation_steps=1)
    tx = make_optimizer(tcfg1.optim, warmup_steps=0)
    step1 = jax.jit(make_train_step(model, tx, tcfg1))

    flat = jax.tree.map(
        lambda x: x.reshape((-1,) + x.shape[2:]), batch2
    )
    state1 = TrainState(step=state.step, trainable=state.trainable,
                        frozen=state.frozen, opt_state=tx.init(state.trainable))

    # NOTE: noise rngs differ by construction (fold_in per microbatch), so
    # compare with noise disabled via identical rng handling: use accum path
    # grads vs manual mean of per-microbatch grads instead.
    from vla_adapter_tpu.train.step import make_loss_fn

    loss_fn = make_loss_fn(model)
    g_fn = jax.jit(jax.grad(lambda tr, b, r: loss_fn(tr, state.frozen, b, r)[0]))
    g0 = g_fn(state.trainable, jax.tree.map(lambda x: x[0], batch2),
              jax.random.fold_in(jax.random.key(5), 0))
    g1 = g_fn(state.trainable, jax.tree.map(lambda x: x[1], batch2),
              jax.random.fold_in(jax.random.key(5), 1))
    manual = jax.tree.map(lambda a, b: (a + b) / 2, g0, g1)

    s2, m2 = step2(state, batch2, jax.random.key(5))
    # reconstruct grads from the update by re-running with a fresh SGD? —
    # instead check the accumulated metrics match the manual mean loss.
    l0 = loss_fn(state.trainable, state.frozen,
                 jax.tree.map(lambda x: x[0], batch2),
                 jax.random.fold_in(jax.random.key(5), 0))[0]
    l1 = loss_fn(state.trainable, state.frozen,
                 jax.tree.map(lambda x: x[1], batch2),
                 jax.random.fold_in(jax.random.key(5), 1))[0]
    np.testing.assert_allclose(
        float(m2["loss"]), (float(l0) + float(l1)) / 2, rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m2["grad_norm"]),
        float(jax.jit(lambda g: sum(jnp.sum(x ** 2) for x in jax.tree.leaves(g)) ** 0.5)(manual)),
        rtol=1e-4,
    )


def test_full_finetune_everything_trainable():
    _, state, step, batch = _setup(lora_rank=0)
    assert jax.tree.leaves(state.frozen) == []
    state, metrics = step(state, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))


def test_multidevice_fsdp_train_step():
    """dp=4 x fsdp=2 on the CPU fake cluster: shardings compile + run, and
    the result matches single-device execution."""
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    mesh = create_mesh(data=4, fsdp=2)
    model, state, step, batch = _setup(lora_rank=4, batch_size=8)

    sharded = TrainState(
        step=state.step,
        trainable=shard_params(state.trainable, mesh),
        frozen=shard_params(state.frozen, mesh),
        opt_state=jax.tree.map(
            lambda x: shard_params(x, mesh) if isinstance(x, dict) else x,
            state.opt_state,
            is_leaf=lambda x: isinstance(x, dict),
        ),
    )
    sbatch = shard_batch(batch, mesh)

    s1, m1 = step(state, batch, jax.random.key(0))
    s2, m2 = step(sharded, sbatch, jax.random.key(0))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-4
    )
    # params updated identically
    a = jax.tree.leaves(s1.trainable)[0]
    b = jax.tree.leaves(s2.trainable)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_multidevice_tp_train_step():
    """dp=2 x fsdp=2 x tensor=2: Megatron-style column/row kernel splits
    expressed as GSPMD shardings compile, run, and match single-device
    execution bit-for-bit (the collectives XLA derives are exact)."""
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    mesh = create_mesh(data=2, fsdp=2, tensor=2)
    model, state, step, batch = _setup(lora_rank=4, batch_size=8)

    sharded = TrainState(
        step=state.step,
        trainable=shard_params(state.trainable, mesh),
        frozen=shard_params(state.frozen, mesh),
        opt_state=jax.tree.map(
            lambda x: shard_params(x, mesh) if isinstance(x, dict) else x,
            state.opt_state,
            is_leaf=lambda x: isinstance(x, dict),
        ),
    )
    # at least one kernel must actually carry the tensor axis
    shardings = params_shardings(state.frozen, mesh)
    assert any(
        "tensor" in str(s.spec) for s in jax.tree.leaves(shardings)
    ), "no parameter picked up the tensor axis"
    sbatch = shard_batch(batch, mesh)

    s1, m1 = step(state, batch, jax.random.key(0))
    s2, m2 = step(sharded, sbatch, jax.random.key(0))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-4
    )
    a = jax.tree.leaves(s1.trainable)[0]
    b = jax.tree.leaves(s2.trainable)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_multidevice_int8_base_train_step():
    """The SHIPPED LoRA-recipe default (base_int8=True, core/experiments.py)
    under dp=2 x fsdp=2 x tensor=2 matches single-device execution: sharded
    int8 kernel_q/kernel_scale frozen trees + the STE custom-VJP
    (models/layers.w8a8_matmul_ste) under the GSPMD collectives XLA derives
    (VERDICT r4 item 4 — the numerics gate and the chip measurement were
    single-device only). act_int8_min_dim=1 puts EVERY tiny-geometry base
    matmul on the int8 path, the worst case for sharding surprises."""
    import dataclasses as _dc

    from vla_adapter_tpu.models.quantize import quantize_params

    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    mesh = create_mesh(data=2, fsdp=2, tensor=2)

    rt_f = Runtime(dtype=jnp.float32, param_dtype=jnp.float32,
                   attn_impl="xla", lora_rank=4, lora_scale=2.0)
    rt_q = _dc.replace(rt_f, weights_int8=True, act_int8=True,
                       act_int8_min_dim=1, train_base_int8=True)
    model = VLAModel(TINY_CFG, rt_q)
    tcfg = TrainConfig(
        model=TINY_CFG,
        optim=OptimizerConfig(learning_rate=1e-3, max_steps=100,
                              num_steps_before_decay=1000),
        grad_accumulation_steps=1,
    )
    tx = make_optimizer(tcfg.optim, warmup_steps=0)
    batch = jax.tree.map(
        jnp.asarray, make_dummy_batch(TINY_CFG, 8, np.random.default_rng(3)))
    # the train/loop.py recipe: init float, quantize the frozen subtree
    state = init_train_state(VLAModel(TINY_CFG, rt_f), tx, batch,
                             jax.random.key(0), lora_enabled=True)
    state = TrainState(
        step=state.step, trainable=state.trainable,
        frozen=jax.tree.map(jnp.asarray,
                            quantize_params(jax.device_get(state.frozen))),
        opt_state=state.opt_state,
    )
    step = jax.jit(make_train_step(model, tx, tcfg))

    sharded = TrainState(
        step=state.step,
        trainable=shard_params(state.trainable, mesh),
        frozen=shard_params(state.frozen, mesh),
        opt_state=jax.tree.map(
            lambda x: shard_params(x, mesh) if isinstance(x, dict) else x,
            state.opt_state,
            is_leaf=lambda x: isinstance(x, dict),
        ),
    )
    # the int8 stacks themselves must be sharded, not replicated fallbacks
    q_shardings = params_shardings(state.frozen, mesh)
    q_leaves = [
        (jax.tree_util.keystr(p), s) for p, s in
        jax.tree_util.tree_flatten_with_path(q_shardings)[0]
        if "kernel_q" in jax.tree_util.keystr(p)]
    assert q_leaves
    assert any("fsdp" in str(s.spec) or "tensor" in str(s.spec)
               for _, s in q_leaves), q_leaves

    s1, m1 = step(state, batch, jax.random.key(0))
    s2, m2 = step(sharded, shard_batch(batch, mesh), jax.random.key(0))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]),
                               float(m2["grad_norm"]), rtol=1e-4)
    a = jax.tree.leaves(s1.trainable)[0]
    b = jax.tree.leaves(s2.trainable)[0]
    # atol looser than the float parity tests: the STE backward's f32
    # dequant-scale products reassociate under the sharded reduction
    # (observed max |diff| 1.7e-6 on one element of an Adam ±1e-3 update)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_remat_policies_numerics_neutral():
    """Rematerialization must not change the math: loss and grads under
    every remat policy (nothing / dots_no_batch / mlp_saved, the
    checkpoint_name-tagged wide-MLP save / attn_only, the structural
    attention-sublayer checkpoint) match the no-remat step."""
    from vla_adapter_tpu.train.step import make_loss_fn

    rng = np.random.default_rng(1)
    batch = jax.tree.map(jnp.asarray, make_dummy_batch(TINY_CFG, 4, rng))
    results = {}
    for policy, overrides in [(None, ()), ("nothing", ()),
                              ("dots_no_batch", ()), ("mlp_saved", ()),
                              ("attn_only", ()),
                              # the committed split policy: attn_only on the
                              # LLM, full recompute on the ViT towers
                              ("attn_only", (("vit", "nothing"),))]:
        rt = Runtime(dtype=jnp.float32, param_dtype=jnp.float32,
                     attn_impl="xla", lora_rank=4, lora_scale=2.0,
                     remat=policy is not None,
                     remat_policy=policy or "nothing",
                     remat_policy_overrides=overrides)
        model = VLAModel(TINY_CFG, rt)
        tcfg = TrainConfig(model=TINY_CFG,
                           optim=OptimizerConfig(learning_rate=1e-3,
                                                 max_steps=100,
                                                 num_steps_before_decay=1000))
        tx = make_optimizer(tcfg.optim, warmup_steps=0)
        state = init_train_state(model, tx, batch, jax.random.key(0),
                                 lora_enabled=True)
        loss_fn = make_loss_fn(model)
        val, grads = jax.jit(jax.value_and_grad(
            lambda tr: loss_fn(tr, state.frozen, batch,
                               jax.random.key(7))[0]))(state.trainable)
        gnorm = float(sum(jnp.sum(x ** 2)
                          for x in jax.tree.leaves(grads)) ** 0.5)
        results[(policy, overrides)] = (float(val), gnorm)
    ref_loss, ref_gnorm = results[(None, ())]
    for policy, (loss, gnorm) in results.items():
        np.testing.assert_allclose(loss, ref_loss, rtol=1e-6, err_msg=str(policy))
        np.testing.assert_allclose(gnorm, ref_gnorm, rtol=1e-5, err_msg=str(policy))


def test_param_shardings_fsdp_rules():
    mesh = create_mesh(data=4, fsdp=2)
    model, state, _, _ = _setup(lora_rank=0)
    shardings = params_shardings(state.trainable, mesh)
    # the embedding (512x64 = 32k < min size) stays replicated; check a
    # big stacked kernel gets an fsdp axis by lowering the threshold
    from vla_adapter_tpu.parallel.sharding import param_pspec

    spec = param_pspec("language_model/layers/layer/mlp/gate_proj/kernel",
                       (4, 64, 128), fsdp_size=2, min_fsdp_size=1)
    assert "fsdp" in str(spec)
    spec0 = param_pspec("x/kernel", (3,), fsdp_size=2, min_fsdp_size=1)
    assert spec0 == jax.sharding.PartitionSpec(None)


def test_shard_batch_accumulation_axis():
    """Grad-accumulation batches (A, B/A, ...) must shard the EXAMPLE axis
    (1), not the microbatch-step axis lax.scan iterates — sharding axis 0
    either fails divisibility (A < devices) or silently replicates every
    example on every device."""
    from jax.sharding import PartitionSpec as P

    mesh = create_mesh(data=4, fsdp=2)
    batch = {"x": np.zeros((2, 8, 3), np.float32)}   # A=2, B/A=8
    out = shard_batch(jax.tree.map(jnp.asarray, batch), mesh, batch_axis=1)
    assert out["x"].sharding.spec == P(None, ("data", "fsdp"), None)
    # axis 0 = A=2 is NOT divisible by the 8 devices; the old behavior
    # (batch_axis=0) would raise here
    out0 = shard_batch(jax.tree.map(jnp.asarray, batch), mesh, batch_axis=1)
    assert np.asarray(out0["x"]).shape == (2, 8, 3)


@pytest.mark.slow
def test_multidevice_tp_train_step_attn_only_remat():
    """The structural attn_only remat (in-layer nn.remat of the attention
    sublayer) composes with dp x fsdp x tensor GSPMD sharding: sharded
    execution matches the single-device step bit-for-bit."""
    assert jax.device_count() >= 8
    mesh = create_mesh(data=2, fsdp=2, tensor=2)
    rt = Runtime(dtype=jnp.float32, param_dtype=jnp.float32, attn_impl="xla",
                 lora_rank=4, lora_scale=2.0, remat=True,
                 remat_policy="attn_only")
    model = VLAModel(TINY_CFG, rt)
    tcfg = TrainConfig(model=TINY_CFG,
                       optim=OptimizerConfig(learning_rate=1e-3,
                                             max_steps=100,
                                             num_steps_before_decay=1000))
    tx = make_optimizer(tcfg.optim, warmup_steps=0)
    batch = jax.tree.map(
        jnp.asarray, make_dummy_batch(TINY_CFG, 8, np.random.default_rng(0)))
    state = init_train_state(model, tx, batch, jax.random.key(0),
                             lora_enabled=True)
    step = jax.jit(make_train_step(model, tx, tcfg))

    sharded = TrainState(
        step=state.step,
        trainable=shard_params(state.trainable, mesh),
        frozen=shard_params(state.frozen, mesh),
        opt_state=jax.tree.map(
            lambda x: shard_params(x, mesh) if isinstance(x, dict) else x,
            state.opt_state,
            is_leaf=lambda x: isinstance(x, dict),
        ),
    )
    s1, m1 = step(state, batch, jax.random.key(0))
    s2, m2 = step(sharded, shard_batch(batch, mesh), jax.random.key(0))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]),
                               float(m2["grad_norm"]), rtol=1e-4)


def test_w8a8_matmul_ste_forward_and_grad():
    """The int8-frozen-base training matmul (models/layers.w8a8_matmul_ste):
    forward is bit-identical to the serving w8a8 math; the STE backward's
    dx matches the exact dy @ W^T to quantization tolerance; the frozen
    kernel args receive no gradient (float0/zero cotangents)."""
    from vla_adapter_tpu.models.layers import _w8a8_fwd_math, w8a8_matmul_ste

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(5, 64)), jnp.float32)
    kq = jnp.asarray(rng.integers(-127, 128, (64, 96)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.01, 0.02, (96,)), jnp.float32)

    np.testing.assert_array_equal(
        np.asarray(w8a8_matmul_ste(x, kq, ks)),
        np.asarray(_w8a8_fwd_math(x, kq, ks, jnp.float32)))

    weights = jnp.arange(96, dtype=jnp.float32)
    dx = jax.grad(lambda x: (w8a8_matmul_ste(x, kq, ks) * weights).sum())(x)
    w_full = np.asarray(kq, np.float32) * np.asarray(ks)[None]
    dy = np.broadcast_to(np.arange(96, dtype=np.float32), (5, 96))
    dx_exact = dy @ w_full.T
    rel = np.abs(np.asarray(dx) - dx_exact).max() / np.abs(dx_exact).max()
    assert rel < 0.02, rel

    # composes with remat (the training config always checkpoints the base)
    g = jax.jit(jax.grad(lambda x: jax.checkpoint(
        lambda h: w8a8_matmul_ste(h, kq, ks).sum())(x)))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_base_int8_loss_curve_matches_float(tmp_path):
    """int8-frozen-base training (TrainConfig.base_int8 / VERDICT r3 item
    4): the DummyDataset loss curve under the quantized base tracks the
    float-base curve — the numerics gate for adopting the 2x-int8-MXU
    train step. act_int8_min_dim=1 forces the STE int8 path onto every
    tiny-geometry matmul, making this a WORST-CASE noise test (real 896+
    dims quantize relatively finer)."""
    import dataclasses as _dc
    import json as _json

    from vla_adapter_tpu.train.loop import finetune

    steps = 120
    cfg = TrainConfig(
        model=TINY_CFG,
        optim=OptimizerConfig(learning_rate=1e-3, max_steps=steps,
                              num_steps_before_decay=10_000),
        batch_size=4, data_axis=2, save_freq=100_000, log_freq=1,
        remat_llm=False, run_root_dir=str(tmp_path / "f32"),
    )
    rt_f = Runtime(dtype=jnp.float32, param_dtype=jnp.float32,
                   attn_impl="xla", lora_rank=2, lora_scale=2.0)
    rt_q = _dc.replace(rt_f, weights_int8=True, act_int8=True,
                       act_int8_min_dim=1, train_base_int8=True)

    def curve(run_root, rt):
        finetune(cfg.replace(run_root_dir=run_root), rt=rt)
        run_dir = next(iter(__import__("pathlib").Path(run_root).iterdir()))
        rows = [_json.loads(l) for l in
                (run_dir / "metrics.jsonl").read_text().splitlines()]
        return [r["loss"] for r in rows]

    f32 = curve(str(tmp_path / "f32"), rt_f)
    q8 = curve(str(tmp_path / "q8"), rt_q)
    assert len(f32) == len(q8) == steps
    # both learn, and the quantized curve tracks the float one
    assert f32[-1] < 0.7 * f32[0] and q8[-1] < 0.7 * q8[0], (f32[-1], q8[-1])
    rel_final = abs(q8[-1] - f32[-1]) / f32[-1]
    assert rel_final < 0.15, (f32[-1], q8[-1])
    # no divergence anywhere along the curve
    worst = max(abs(a - b) / max(b, 1e-6) for a, b in zip(q8, f32))
    assert worst < 0.35, worst


def test_stored_moments_f32_is_bitwise_optax_adamw():
    """scale_by_adam_stored (train/optim.py) with float32 storage must
    reproduce optax.adamw exactly — the knob then isolates the STORAGE
    dtype as the only difference in the bf16 configuration."""
    import dataclasses as _dc

    import optax

    from vla_adapter_tpu.train.optim import make_optimizer

    ocfg = OptimizerConfig(learning_rate=3e-3, weight_decay=0.01,
                           max_steps=100, num_steps_before_decay=50)
    tx_ref = make_optimizer(ocfg, warmup_steps=10)
    tx_f32 = make_optimizer(_dc.replace(ocfg, moments_dtype="float32"),
                            warmup_steps=10)

    rng = np.random.default_rng(3)
    params = {
        "a": jnp.asarray(rng.normal(size=(8, 16)), jnp.float32),
        "b": {"kernel": jnp.asarray(rng.normal(size=(16, 4)), jnp.float32),
              "bias": jnp.zeros((4,), jnp.float32)},
    }
    s_ref, s_f32 = tx_ref.init(params), tx_f32.init(params)
    p_ref, p_f32 = params, params
    for i in range(7):
        grads = jax.tree.map(
            lambda p: jnp.asarray(
                np.random.default_rng(100 + i).normal(size=p.shape),
                jnp.float32) * (1.0 + p * 0), p_ref)
        u_ref, s_ref = tx_ref.update(grads, s_ref, p_ref)
        u_f32, s_f32 = tx_f32.update(grads, s_f32, p_f32)
        p_ref = optax.apply_updates(p_ref, u_ref)
        p_f32 = optax.apply_updates(p_f32, u_f32)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(p_ref)[0],
            jax.tree_util.tree_flatten_with_path(p_f32)[0]):
        assert ka == kb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7, err_msg=str(ka))


def test_bf16_moments_and_accum_loss_curve_matches_f32(tmp_path):
    """The HBM-traffic train levers (OptimizerConfig.moments_dtype /
    TrainConfig.accum_dtype = "bfloat16" — BREAKDOWN.md round-5 train
    trace, the two parked ~15 ms levers): the DummyDataset loss curve
    under bf16-stored Adam moments AND a bf16 accum-2 carry must track
    the all-f32 curve — the numerics gate mirroring
    test_base_int8_loss_curve_matches_float."""
    import dataclasses as _dc
    import json as _json

    from vla_adapter_tpu.train.loop import finetune

    steps = 120
    cfg = TrainConfig(
        model=TINY_CFG,
        optim=OptimizerConfig(learning_rate=1e-3, max_steps=steps,
                              num_steps_before_decay=10_000),
        batch_size=4, grad_accumulation_steps=2, data_axis=2,
        save_freq=100_000, log_freq=1, remat_llm=False,
        run_root_dir=str(tmp_path / "f32"),
    )
    cfg_b = cfg.replace(
        optim=_dc.replace(cfg.optim, moments_dtype="bfloat16"),
        accum_dtype="bfloat16")
    rt = Runtime(dtype=jnp.float32, param_dtype=jnp.float32,
                 attn_impl="xla", lora_rank=2, lora_scale=2.0)

    def curve(run_root, c):
        finetune(c.replace(run_root_dir=run_root), rt=rt)
        run_dir = next(iter(__import__("pathlib").Path(run_root).iterdir()))
        rows = [_json.loads(l) for l in
                (run_dir / "metrics.jsonl").read_text().splitlines()]
        return [r["loss"] for r in rows]

    f32 = curve(str(tmp_path / "f32"), cfg)
    b16 = curve(str(tmp_path / "b16"), cfg_b)
    assert len(f32) == len(b16) == steps
    assert f32[-1] < 0.7 * f32[0] and b16[-1] < 0.7 * b16[0], (f32[-1], b16[-1])
    rel_final = abs(b16[-1] - f32[-1]) / f32[-1]
    assert rel_final < 0.15, (f32[-1], b16[-1])
    worst = max(abs(a - b) / max(b, 1e-6) for a, b in zip(b16, f32))
    assert worst < 0.35, worst
