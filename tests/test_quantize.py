"""int8 weight-only serving: quantize/dequantize + quantized forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_train_step import TINY_CFG
from vla_adapter_tpu.data.dummy import make_dummy_batch
from vla_adapter_tpu.models.layers import Runtime
from vla_adapter_tpu.models.quantize import (
    dequantize_params,
    quantize_kernel,
    quantize_params,
)
from vla_adapter_tpu.models.vla import VLAModel


def test_quantize_kernel_roundtrip():
    rng = np.random.default_rng(0)
    k = rng.normal(size=(64, 32)).astype(np.float32)
    q, s = quantize_kernel(k)
    assert q.dtype == np.int8 and s.shape == (32,)
    back = q.astype(np.float32) * s
    assert np.abs(back - k).max() <= np.abs(k).max() / 127 + 1e-6
    # scanned stack
    k3 = rng.normal(size=(4, 64, 32)).astype(np.float32)
    q3, s3 = quantize_kernel(k3)
    assert q3.shape == (4, 64, 32) and s3.shape == (4, 32)


def test_quantized_model_forward_close_to_fp():
    rt_fp = Runtime(dtype=jnp.float32, param_dtype=jnp.float32, attn_impl="xla")
    model_fp = VLAModel(TINY_CFG, rt_fp)
    batch = make_dummy_batch(TINY_CFG, 2, np.random.default_rng(0))
    batch = jax.tree.map(jnp.asarray, batch)
    kwargs = dict(
        input_ids=batch["input_ids"], prompt_len=batch["prompt_len"],
        text_valid=batch["text_valid"], pixel_values=batch["pixel_values"],
        proprio=batch["proprio"],
    )
    params = model_fp.init(jax.random.key(0), **kwargs)["params"]
    out_fp = np.asarray(model_fp.apply({"params": params}, **kwargs)["actions"])

    q_params = quantize_params(jax.device_get(params))
    # conv kernel stayed float; dense kernels became int8
    flat = {jax.tree_util.keystr(p): v for p, v in
            jax.tree_util.tree_flatten_with_path(q_params)[0]}
    assert any("kernel_q" in k for k in flat)
    assert any("patch_embed" in k and k.endswith("['kernel']") for k in flat)
    assert all(v.dtype == np.int8 for k, v in flat.items() if "kernel_q" in k)

    rt_q = Runtime(dtype=jnp.float32, param_dtype=jnp.float32,
                   attn_impl="xla", weights_int8=True)
    model_q = VLAModel(TINY_CFG, rt_q)
    out_q = np.asarray(model_q.apply({"params": q_params}, **kwargs)["actions"])
    # int8 weight-only: small relative error on outputs of magnitude ~1
    assert np.abs(out_q - out_fp).max() < 0.15, np.abs(out_q - out_fp).max()
    assert np.corrcoef(out_q.ravel(), out_fp.ravel())[0, 1] > 0.99

    # dequantize reconstructs kernels within a quantization step
    deq = dequantize_params(q_params)
    out_dq = np.asarray(model_fp.apply({"params": deq}, **kwargs)["actions"])
    np.testing.assert_allclose(out_dq, out_q, atol=1e-5)


def test_quantize_rows():
    from vla_adapter_tpu.models.layers import quantize_rows

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 5, 64)), jnp.float32)
    xq, scale = jax.jit(quantize_rows)(x)
    assert xq.dtype == jnp.int8 and scale.shape == (3, 5, 1)
    back = np.asarray(xq, np.float32) * np.asarray(scale)
    err = np.abs(back - np.asarray(x))
    # symmetric per-row absmax: error within half a quantization step
    step = np.max(np.abs(np.asarray(x)), axis=-1, keepdims=True) / 127
    assert (err <= step / 2 + 1e-6).all()
    # zero rows don't produce NaNs
    xq0, s0 = quantize_rows(jnp.zeros((2, 8)))
    assert np.all(np.asarray(xq0) == 0) and np.isfinite(np.asarray(s0)).all()


def test_w8a8_forward():
    """The act-int8 (W8A8) serving path: close to float when enabled, and
    bit-identical to weight-only when every matmul is below the min-dim
    gate (the default 256 exceeds every TINY_CFG dimension)."""
    rt_fp = Runtime(dtype=jnp.float32, param_dtype=jnp.float32, attn_impl="xla")
    model_fp = VLAModel(TINY_CFG, rt_fp)
    batch = make_dummy_batch(TINY_CFG, 2, np.random.default_rng(1))
    batch = jax.tree.map(jnp.asarray, batch)
    kwargs = dict(
        input_ids=batch["input_ids"], prompt_len=batch["prompt_len"],
        text_valid=batch["text_valid"], pixel_values=batch["pixel_values"],
        proprio=batch["proprio"],
    )
    params = model_fp.init(jax.random.key(0), **kwargs)["params"]
    out_fp = np.asarray(model_fp.apply({"params": params}, **kwargs)["actions"])
    q_params = quantize_params(jax.device_get(params))

    import dataclasses as _dc

    rt_w8 = Runtime(dtype=jnp.float32, param_dtype=jnp.float32,
                    attn_impl="xla", weights_int8=True)
    out_w8 = np.asarray(
        VLAModel(TINY_CFG, rt_w8).apply({"params": q_params}, **kwargs)["actions"])

    # act_int8 with the quant path actually taken (min_dim below dims)
    rt_a8 = _dc.replace(rt_w8, act_int8=True, act_int8_min_dim=1)
    out_a8 = np.asarray(
        VLAModel(TINY_CFG, rt_a8).apply({"params": q_params}, **kwargs)["actions"])
    assert np.abs(out_a8 - out_fp).max() < 0.3, np.abs(out_a8 - out_fp).max()
    assert np.corrcoef(out_a8.ravel(), out_fp.ravel())[0, 1] > 0.97
    # activation quantization changed something vs weight-only
    assert np.abs(out_a8 - out_w8).max() > 0

    # gated off by min_dim: identical to weight-only
    rt_gated = _dc.replace(rt_w8, act_int8=True)  # min_dim=256 > all dims
    out_gated = np.asarray(
        VLAModel(TINY_CFG, rt_gated).apply({"params": q_params}, **kwargs)["actions"])
    np.testing.assert_array_equal(out_gated, out_w8)

    # the error report covers the W8A8 mode
    from vla_adapter_tpu.models.quantize import forward_error_report

    fwd = forward_error_report(
        TINY_CFG, jax.device_get(params), rt=rt_fp,
        act_int8=True)
    assert np.isfinite(fwd["max_abs_action_diff"])


def test_fused_qstack_storage_is_lane_padded_at_flagship_geometry():
    """The fused-serving qstack declares its MLP hidden dim lane-padded
    (layers._stacked_qkernel): so400m's ragged mlp_dim 4304 would otherwise
    make XLA re-lay-out the 129 MB stack on EVERY forward (0.47 ms/fwd,
    BREAKDOWN.md round 4). Shape-only (eval_shape) — no compute."""
    import dataclasses as _dc

    from vla_adapter_tpu.core.config import VLAConfig

    cfg = VLAConfig()
    assert cfg.vision.fused.mlp_dim == 4304  # the ragged case this guards
    rt = Runtime(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                 weights_int8=True, act_int8=True, w8a8_impl="fused")
    model = VLAModel(cfg, rt)
    v = cfg.vision
    batch = 1
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.key(0),
            input_ids=jnp.zeros((batch, cfg.max_text_tokens), jnp.int32),
            prompt_len=jnp.full((batch,), 8, jnp.int32),
            text_valid=jnp.ones((batch, cfg.max_text_tokens), jnp.int32),
            pixel_values=jnp.zeros(
                (batch, v.num_images, v.primary.image_size,
                 v.primary.image_size, v.channels_per_image), jnp.bfloat16),
            proprio=jnp.zeros((batch, cfg.constants.proprio_dim),
                              jnp.float32)))
    flat = {jax.tree_util.keystr(p): s for p, s in
            jax.tree_util.tree_flatten_with_path(shapes["qstack"])[0]}
    fc1 = {k: s for k, s in flat.items()
           if "fc1" in k and "kernel_q" in k and s.shape[1] == 1152}
    fc2 = {k: s for k, s in flat.items()
           if "fc2" in k and "kernel_q" in k and s.shape[2] == 1152}
    assert fc1 and fc2
    # so400m: F padded 4304 -> 4352 on BOTH sides of the MLP
    assert all(s.shape[2] == 4352 for s in fc1.values()), fc1
    assert all(s.shape[1] == 4352 for s in fc2.values()), fc2
    # every qstack minor dim is a lane multiple (the invariant itself)
    assert all(s.shape[-1] % 128 == 0 for s in flat.values()), {
        k: s.shape for k, s in flat.items() if s.shape[-1] % 128}
    # and split_qstack zero-fills unpadded quantized weights into the
    # padded layout (tiny synthetic leaf, same rec logic)
    from vla_adapter_tpu.models.quantize import split_qstack

    class _S:  # minimal ShapeDtypeStruct stand-in for the shapes tree
        def __init__(self, shape):
            self.shape = shape

    q = {"m": {"kernel_q": np.ones((2, 8, 5), np.int8),
               "kernel_scale": np.ones((2, 5), np.float32)}}
    params, qstack = split_qstack(
        q, {"m": {"kernel_q": _S((2, 8, 128)),
                  "kernel_scale": _S((2, 128))}})
    assert qstack["m"]["kernel_q"].shape == (2, 8, 128)
    assert (qstack["m"]["kernel_q"][:, :, :5] == 1).all()
    assert (qstack["m"]["kernel_q"][:, :, 5:] == 0).all()
    assert "m" not in params


def test_w8a8_fused_mlp_backend():
    """The "fused" serving backend (whole-MLP Pallas kernel,
    ops/pallas_fused_mlp.py) matches the XLA w8a8 path, and split_qstack
    moves exactly the stacked MLP kernels (ViT/LLM scan stacks AND the
    round-5 projector L=1 stack). At tiny geometry F <= block_f the
    kernel's per-(token, group) down-input quantization coincides with
    XLA's per-token quantization — but the two paths are NOT bit-identical
    (the kernel's erf is the A&S 7.1.26 approximation, ~1.5e-7), and with
    act_int8_min_dim=1 every downstream matmul REQUANTIZES: a 1e-7
    perturbation near an int8 rounding boundary flips a grid step and the
    flip compounds. So the end-to-end gate is error-vs-fp32 (the fused
    path must not be meaningfully noisier than the XLA path), while exact
    path-vs-path parity is asserted at the module level
    (test_projector_fused_kernel_matches_xla) and in test_ops' kernel
    goldens (multi-group, ragged-F)."""
    import dataclasses as _dc

    from vla_adapter_tpu.models.quantize import split_qstack

    rt_fp = Runtime(dtype=jnp.float32, param_dtype=jnp.float32,
                    attn_impl="xla")
    model_fp = VLAModel(TINY_CFG, rt_fp)
    batch = jax.tree.map(jnp.asarray,
                         make_dummy_batch(TINY_CFG, 2,
                                          np.random.default_rng(7)))
    kwargs = dict(
        input_ids=batch["input_ids"], prompt_len=batch["prompt_len"],
        text_valid=batch["text_valid"], pixel_values=batch["pixel_values"],
        proprio=batch["proprio"],
    )
    params = model_fp.init(jax.random.key(0), **kwargs)["params"]
    out_fp = np.asarray(model_fp.apply({"params": params},
                                       **kwargs)["actions"])
    q_params = quantize_params(jax.device_get(params))

    rt_x = _dc.replace(rt_fp, weights_int8=True, act_int8=True,
                       act_int8_min_dim=1, w8a8_impl="xla")
    out_x = np.asarray(
        VLAModel(TINY_CFG, rt_x).apply({"params": q_params},
                                       **kwargs)["actions"])

    rt_f = _dc.replace(rt_x, w8a8_impl="fused")
    model_f = VLAModel(TINY_CFG, rt_f)
    shapes = jax.eval_shape(lambda k: model_f.init(k, **kwargs),
                            jax.random.key(0))
    # exactly the MLP kernels land in qstack, with the FULL layer axis —
    # and the projector's L=1 stack (VERDICT r4 item 3) is among them
    flat = {jax.tree_util.keystr(p): v for p, v in
            jax.tree_util.tree_flatten_with_path(shapes["qstack"])[0]}
    assert any("mlp" in k and "gate_proj" in k for k in flat)
    assert any("fc1" in k for k in flat)
    assert any("projector" in k and "kernel_q" in k for k in flat)
    assert all(v.shape[0] == TINY_CFG.llm.num_layers
               for k, v in flat.items() if "language_model" in k)
    assert all(v.shape[0] == 1
               for k, v in flat.items() if "projector" in k)
    params_f, qstack = split_qstack(q_params, shapes["qstack"])
    # moved leaves are gone from params and present in qstack
    flat_p = {jax.tree_util.keystr(p) for p, _ in
              jax.tree_util.tree_flatten_with_path(params_f)[0]}
    assert not (flat_p & set(flat))
    out_f = np.asarray(
        model_f.apply({"params": params_f, "qstack": qstack},
                      **kwargs)["actions"])
    err_x = float(np.max(np.abs(out_x - out_fp)))
    err_f = float(np.max(np.abs(out_f - out_fp)))
    assert np.isfinite(out_f).all()
    # the fused backend may not be meaningfully noisier than XLA w8a8
    assert err_f <= 1.5 * err_x + 1e-4, (err_f, err_x)


def test_projector_fused_kernel_matches_xla():
    """Module-level parity for the round-5 projector fused-kernel path
    (VERDICT r4 item 3): both projector variants under w8a8_impl="fused"
    (whole-MLP Pallas kernel with an L=1 stack) match their XLA w8a8 twins
    to fp tolerance — here nothing downstream requantizes, so the only
    divergence is the kernel's ~1.5e-7 erf approximation."""
    import dataclasses as _dc

    from vla_adapter_tpu.models.projector import FusedProjector, Projector
    from vla_adapter_tpu.models.quantize import split_qstack

    rng = np.random.default_rng(0)
    for cls, in_dim, llm_dim in [(Projector, 32, 64),
                                 (FusedProjector, 48, 64)]:
        x = jnp.asarray(rng.normal(size=(16, in_dim)), jnp.float32)
        rt_fp = Runtime(dtype=jnp.float32, param_dtype=jnp.float32,
                        attn_impl="xla")
        params = cls(llm_dim, rt=rt_fp).init(jax.random.key(0), x)["params"]
        q = quantize_params(jax.device_get(params))

        rt_x = _dc.replace(rt_fp, weights_int8=True, act_int8=True,
                           act_int8_min_dim=1, w8a8_impl="xla")
        out_x = np.asarray(cls(llm_dim, rt=rt_x).apply({"params": q}, x))

        rt_f = _dc.replace(rt_x, w8a8_impl="fused")
        m_f = cls(llm_dim, rt=rt_f)
        shapes = jax.eval_shape(lambda k: m_f.init(k, x), jax.random.key(0))
        keys = {jax.tree_util.keystr(p) for p, _ in
                jax.tree_util.tree_flatten_with_path(shapes["qstack"])[0]}
        # fc1/fc2 run as ONE kernel; FusedProjector's fc3 stays XLA w8a8
        assert any("fc1" in k for k in keys) and any("fc2" in k for k in keys)
        assert not any("fc3" in k for k in keys)
        pq, qs = split_qstack(q, shapes["qstack"])
        out_f = np.asarray(m_f.apply({"params": pq, "qstack": qs}, x))
        np.testing.assert_allclose(out_f, out_x, rtol=2e-5, atol=2e-5)


def test_cached_decode_under_fused_layout():
    """KV-cached autoregressive decode works against the split
    params/qstack layout (w8a8_impl="fused") and matches the uncached
    decode — regression for the round-3 review finding where Qwen2Decode's
    decode_step dropped the layer index and crashed looking up kernel_q
    in the params collection."""
    import dataclasses as _dc

    from vla_adapter_tpu.core.config import Qwen2Config
    from vla_adapter_tpu.models.generate import (
        greedy_generate,
        greedy_generate_cached,
    )
    from vla_adapter_tpu.models.quantize import split_qstack
    from vla_adapter_tpu.models.qwen2 import Qwen2Model

    cfg = Qwen2Config(vocab_size=128, hidden_size=64, num_layers=3,
                      num_heads=4, num_kv_heads=2, intermediate_size=128,
                      head_dim=16)
    rt_fp = Runtime(dtype=jnp.float32, param_dtype=jnp.float32,
                    attn_impl="xla")
    ids0 = jnp.asarray(
        np.random.default_rng(0).integers(1, cfg.vocab_size, size=(2, 5)),
        jnp.int32)
    params = Qwen2Model(cfg, rt_fp).init(
        jax.random.key(1), input_ids=ids0,
        valid=jnp.ones_like(ids0), causal=True)["params"]

    rt_s = _dc.replace(rt_fp, weights_int8=True, act_int8=True,
                       act_int8_min_dim=1, w8a8_impl="fused")
    model_s = Qwen2Model(cfg, rt_s)
    shapes = jax.eval_shape(
        lambda k: model_s.init(k, input_ids=ids0, valid=jnp.ones_like(ids0),
                               causal=True), jax.random.key(0))
    assert "qstack" in shapes
    params_s, qstack = split_qstack(
        quantize_params(jax.device_get(params)), shapes["qstack"])
    variables = {"params": params_s, "qstack": qstack}

    buf = np.zeros((2, 5 + 6), np.int32)
    buf[:, :5] = np.asarray(ids0)
    got = greedy_generate(
        model_s, variables, jnp.asarray(buf),
        jnp.array([5, 5], jnp.int32), max_new_tokens=6)
    got_cached = greedy_generate_cached(
        model_s, variables, jnp.asarray(buf), prompt_len=5, max_new_tokens=6)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(got_cached))


def test_quantization_report():
    """The validate-before-deploying report: per-kernel round-trip error is
    bounded by one quantization step, and the end-to-end action diff on a
    fixed forward is small (VERDICT round-1 item 8)."""
    from vla_adapter_tpu.models.quantize import (
        forward_error_report,
        quantization_report,
    )

    rt = Runtime(dtype=jnp.float32, param_dtype=jnp.float32, attn_impl="xla")
    model = VLAModel(TINY_CFG, rt)
    batch = make_dummy_batch(TINY_CFG, 1, np.random.default_rng(0))
    batch = jax.tree.map(jnp.asarray, batch)
    params = jax.device_get(model.init(
        jax.random.key(0),
        input_ids=batch["input_ids"], prompt_len=batch["prompt_len"],
        text_valid=batch["text_valid"], pixel_values=batch["pixel_values"],
        proprio=batch["proprio"],
    )["params"])

    rep = quantization_report(params)
    assert rep["per_layer"] and rep["worst"]
    # symmetric per-channel: round-trip error <= absmax/127 per channel,
    # i.e. relative error <= ~1/127 per kernel (+fp slack)
    assert rep["max_rel_err"] <= 1.0 / 127 + 1e-6, rep["worst"][:3]
    for path, d in rep["per_layer"].items():
        assert d["max_abs_err"] >= 0 and len(d["shape"]) in (2, 3), path

    fwd = forward_error_report(TINY_CFG, params, rt=rt)
    assert 0 <= fwd["max_abs_action_diff"] < 0.15
    assert fwd["mean_abs_action_diff"] <= fwd["max_abs_action_diff"]


def test_mega_backend_matches_xla_on_qwen2():
    """The batch-1 whole-decoder-layer megakernel backend
    (w8a8_impl="mega", ops/pallas_megalayer.py) against the XLA w8a8
    Qwen2Model: identical quantization granularity everywhere, attention
    algebraically identical in f32 — the comparison is direct (no erf
    approximation in this path), with headroom only for f32 association
    differences compounding through requantization. Also checks the mega
    qstack adds the o-projection stack and split_qstack handles it."""
    import dataclasses as _dc

    from vla_adapter_tpu.core.config import Qwen2Config
    from vla_adapter_tpu.models.qwen2 import Qwen2Model
    from vla_adapter_tpu.models.quantize import split_qstack

    cfg = Qwen2Config(vocab_size=256, hidden_size=64, num_layers=2,
                      num_heads=4, num_kv_heads=2, intermediate_size=160,
                      head_dim=16)
    rt_fp = Runtime(dtype=jnp.float32, param_dtype=jnp.float32,
                    attn_impl="xla")
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, 256, (1, 32)), jnp.int32)
    valid = jnp.asarray(rng.random((1, 32)) < 0.9, jnp.int32)
    kwargs = dict(input_ids=ids, valid=valid, causal=False)

    model_fp = Qwen2Model(cfg, rt_fp)
    params = model_fp.init(jax.random.key(0), **kwargs)["params"]
    out_fp = np.asarray(
        model_fp.apply({"params": params}, **kwargs)["last_hidden_state"])
    q_params = quantize_params(jax.device_get(params))

    rt_x = _dc.replace(rt_fp, weights_int8=True, act_int8=True,
                       act_int8_min_dim=1, w8a8_impl="xla")
    out_x = np.asarray(Qwen2Model(cfg, rt_x).apply(
        {"params": q_params}, **kwargs)["last_hidden_state"])

    rt_m = _dc.replace(rt_x, w8a8_impl="mega")
    model_m = Qwen2Model(cfg, rt_m)
    shapes = jax.eval_shape(lambda key: model_m.init(key, **kwargs),
                            jax.random.key(0))
    keys = {jax.tree_util.keystr(p) for p, _ in
            jax.tree_util.tree_flatten_with_path(shapes["qstack"])[0]}
    assert any("o_proj" in k for k in keys), keys
    assert any("gate_proj" in k for k in keys)
    params_m, qstack = split_qstack(q_params, shapes["qstack"])
    out_m = np.asarray(model_m.apply(
        {"params": params_m, "qstack": qstack}, **kwargs)
        ["last_hidden_state"])

    err_x = float(np.max(np.abs(out_x - out_fp)))
    err_m = float(np.max(np.abs(out_m - out_fp)))
    assert np.isfinite(out_m).all()
    assert err_m <= 1.5 * err_x + 1e-4, (err_m, err_x)
    # and directly close to the XLA quantized path
    np.testing.assert_allclose(out_m, out_x, rtol=5e-2, atol=5e-3)


def test_quantize_params_jax_matches_numpy():
    """The device-side quantizer (quantize_params_jax — used by int8-base
    train startup, the int8 Predictor, and bench's train phase to avoid
    the host round-trip of the frozen tree) must agree EXACTLY with the
    numpy twin: the leaf math is elementwise f32 (abs/max/div/round/clip),
    bit-exact on CPU and TPU alike."""
    from vla_adapter_tpu.models.quantize import (
        quantize_params,
        quantize_params_jax,
    )

    rng = np.random.default_rng(11)
    params = {
        "encoder": {
            "layers": {  # scanned 3D stack, with a zero out-channel
                "attn": {"kernel": rng.normal(size=(3, 16, 24)).astype(
                    np.float32)},
            },
            "patch_embed": {"kernel": rng.normal(size=(2, 2, 3, 8)).astype(
                np.float32)},  # 4D conv: must stay float
            "norm": {"scale": np.ones((16,), np.float32)},
        },
        "head": {"out": {"kernel": rng.normal(size=(16, 7)).astype(
            np.float32), "bias": np.zeros((7,), np.float32)}},
    }
    params["encoder"]["layers"]["attn"]["kernel"][1, :, 5] = 0.0  # scale==0 path

    q_np = quantize_params(params)
    q_jax = jax.device_get(
        jax.jit(quantize_params_jax)(jax.tree.map(jnp.asarray, params)))

    flat_np = jax.tree_util.tree_flatten_with_path(q_np)
    flat_jax = jax.tree_util.tree_flatten_with_path(q_jax)
    assert [p for p, _ in flat_np[0]] == [p for p, _ in flat_jax[0]]
    for (path, a), (_, b) in zip(flat_np[0], flat_jax[0]):
        assert a.dtype == b.dtype, (path, a.dtype, b.dtype)
        np.testing.assert_array_equal(a, b, err_msg=str(path))
    # the conv kernel and norm scale passed through untouched
    assert q_jax["encoder"]["patch_embed"]["kernel"].shape == (2, 2, 3, 8)
    assert "kernel_q" in q_jax["head"]["out"]
