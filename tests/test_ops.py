"""ops/: mask builders + the Pallas kernel in CPU interpret mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vla_adapter_tpu.ops.attention import xla_attention
from vla_adapter_tpu.ops.masks import (
    build_attention_mask,
    causal_mask,
    combine_masks,
    padding_mask,
    prefix_bidirectional_mask,
)
from vla_adapter_tpu.ops.pallas_attention import fused_attention


def test_mask_builders():
    valid = jnp.asarray([[1, 1, 1, 0], [1, 1, 1, 1]])
    pad = padding_mask(valid)
    assert pad.shape == (2, 1, 4, 4)
    assert not pad[0, 0, 0, 3] and pad[1, 0, 0, 3]

    cm = causal_mask(4)
    assert cm[0, 0, 1, 0] and not cm[0, 0, 0, 1]

    m = build_attention_mask("causal", valid, 4)
    assert m.shape == (2, 1, 4, 4)
    assert not m[0, 0, 3, 3] or valid[0, 3]  # padded key excluded

    bidir = build_attention_mask("bidirectional", valid, 4)
    assert bidir[0, 0, 0, 2] and not bidir[0, 0, 0, 3]
    assert build_attention_mask("bidirectional", None, 4) is None

    pb = prefix_bidirectional_mask(5, 3)
    # suffix (>=3) attends forward within the suffix; prefix stays causal
    assert pb[0, 0, 3, 4] and not pb[0, 0, 1, 2]
    assert pb[0, 0, 2, 0]
    # per-batch suffix starts
    pb2 = prefix_bidirectional_mask(5, jnp.asarray([3, 1]))
    assert pb2.shape == (2, 1, 5, 5)
    assert pb2[1, 0, 1, 4] and not pb2[0, 0, 1, 4]

    with pytest.raises(ValueError):
        build_attention_mask("nope", valid, 4)
    with pytest.raises(ValueError):
        build_attention_mask("prefix_bidir", valid, 4)
    assert combine_masks(None, None) is None


@pytest.mark.parametrize("causal", [False, True], ids=["bidir", "causal"])
def test_pallas_kernel_interpret_matches_xla(causal):
    """The kernel's math/masking, exercised on CPU via interpret mode."""
    rng = np.random.default_rng(0)
    B, S, H, Hkv, D = 2, 37, 4, 2, 16
    q = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    valid = np.ones((B, S), np.int32)
    valid[0, 30:] = 0

    got = fused_attention(q, k, v, jnp.asarray(valid), causal=causal,
                          interpret=True)
    want = xla_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), jnp.asarray(valid), causal=causal,
        sm_scale=D ** -0.5,
    ).transpose(0, 2, 1, 3)
    m = valid.astype(bool)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1, 3)[m],
        np.asarray(want).transpose(0, 2, 1, 3)[m],
        atol=1e-5, rtol=1e-5,
    )
    # fully-masked (padded) query rows must still be finite: the deferred
    # 1/l normalization divides by l = sum(exp(NEG_INF - NEG_INF)) = S > 0
    assert np.isfinite(np.asarray(got)).all()


def test_pallas_kernel_gqa_multiblock():
    """GQA folding across multiple q-blocks (the flagship 7-group shape,
    scaled down) — exercises the block policy and the folded causal rows."""
    rng = np.random.default_rng(1)
    B, S, H, Hkv, D = 2, 96, 14, 2, 16
    q = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.float32)
    for causal in (False, True):
        got = fused_attention(q, k, v, None, causal=causal, block_q=16,
                              interpret=True)
        want = xla_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), None, causal=causal,
            sm_scale=D ** -0.5,
        ).transpose(0, 2, 1, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)


def test_mask_builders_match_attention_masking():
    """ops/masks.py is the executable spec; ops/attention.py masks by index
    arithmetic. Tie them together so the two implementations cannot drift:
    manual softmax-attention under build_attention_mask must equal
    xla_attention's (valid, causal) masking."""
    rng = np.random.default_rng(3)
    B, S, H, D = 2, 12, 2, 8
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    valid = np.ones((B, S), np.int32)
    valid[0, 9:] = 0

    for mode, causal in (("causal", True), ("bidirectional", False)):
        m = build_attention_mask(mode, jnp.asarray(valid), S)  # (B,1,S,S)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * D ** -0.5
        s = jnp.where(m, s, -2.0e9)
        p = jax.nn.softmax(s, axis=-1)
        manual = jnp.einsum("bhqk,bkhd->bqhd", p, v)
        got = xla_attention(q, k, v, jnp.asarray(valid), causal=causal,
                            sm_scale=D ** -0.5)
        mask_rows = valid.astype(bool)
        np.testing.assert_allclose(
            np.asarray(manual)[mask_rows], np.asarray(got)[mask_rows],
            atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("m,k,n", [
    (512, 1152, 1152),   # so400m qkv/o at serving batch-1 (2x256 folded)
    (640, 896, 4864),    # Qwen2 0.5B MLP up at 640 multimodal tokens
    (96, 4304, 1152),    # remainder blocks: M, N both non-multiples
])
def test_pallas_w8a8_matmul_interpret_matches_xla(m, k, n):
    """The fused w8a8 kernel (interpret mode) matches the XLA serving math
    bit-for-bit on the int8 dot and to fp32 rounding on the dequant."""
    from vla_adapter_tpu.models.layers import quantize_rows
    from vla_adapter_tpu.ops.pallas_matmul import w8a8_matmul

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    wq = jnp.asarray(rng.integers(-127, 128, size=(k, n)), jnp.int8)
    ws = jnp.asarray(rng.uniform(0.5, 2.0, size=(n,)), jnp.float32)

    xq, rs = quantize_rows(x)
    ref = (
        jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        .astype(jnp.float32) * rs * ws
    )
    got = w8a8_matmul(xq, rs, wq, ws, out_dtype=jnp.float32,
                      block_m=256, block_n=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_pallas_w8a8_matmul_stacked_matches_flat():
    """The scalar-prefetch stacked kernel selects layer l out of an
    (L, K, N) weight stack and matches the flat kernel on that slice
    (interpret mode) — for every layer, including under lax.scan."""
    from vla_adapter_tpu.models.layers import quantize_rows
    from vla_adapter_tpu.ops.pallas_matmul import w8a8_matmul, w8a8_matmul_stacked

    L, m, k, n = 3, 96, 128, 384
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    wq = jnp.asarray(rng.integers(-127, 128, size=(L, k, n)), jnp.int8)
    ws = jnp.asarray(rng.uniform(0.5, 2.0, size=(L, n)), jnp.float32)
    xq, rs = quantize_rows(x)

    for layer in range(L):
        ref = w8a8_matmul(xq, rs, wq[layer], ws[layer], out_dtype=jnp.float32,
                          block_m=64, block_n=128, interpret=True)
        got = w8a8_matmul_stacked(
            xq, rs, wq, ws, jnp.int32(layer), out_dtype=jnp.float32,
            block_m=64, block_n=128, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    def body(carry, layer):
        y = w8a8_matmul_stacked(xq, rs, wq, ws, layer,
                                out_dtype=jnp.float32,
                                block_m=64, block_n=128, interpret=True)
        return carry + y.sum(), None

    total, _ = jax.jit(
        lambda: jax.lax.scan(body, jnp.float32(0.0), jnp.arange(L))
    )()
    want = sum(
        float(w8a8_matmul(xq, rs, wq[i], ws[i], out_dtype=jnp.float32,
                          block_m=64, block_n=128, interpret=True).sum())
        for i in range(L))
    np.testing.assert_allclose(float(total), want, rtol=1e-5)


def test_fused_mlp_kernel_goldens():
    """ops/pallas_fused_mlp.py (interpret mode) matches a numpy
    re-derivation of its exact quantization semantics — multi-group,
    ragged F (the so400m case), ragged M, gated and biased variants."""
    from vla_adapter_tpu.models.quantize import quantize_kernel
    from vla_adapter_tpu.ops.pallas_fused_mlp import (
        w8a8_gated_mlp_stacked,
        w8a8_mlp_stacked,
    )

    def qrows(v):
        s = np.maximum(np.max(np.abs(v), axis=-1, keepdims=True),
                       1e-8) / 127.0
        return np.clip(np.round(v / s), -127, 127), s

    rng = np.random.default_rng(11)
    L, M, K, F, D, BF = 2, 70, 128, 336, 128, 128  # F ragged vs BF, M ragged
    x = rng.normal(size=(M, K)).astype(np.float32)
    w1 = rng.normal(size=(L, K, F)).astype(np.float32) * 0.05
    up = rng.normal(size=(L, K, F)).astype(np.float32) * 0.05
    w2 = rng.normal(size=(L, F, D)).astype(np.float32) * 0.05
    b1 = rng.normal(size=(F,)).astype(np.float32) * 0.1
    b2 = rng.normal(size=(D,)).astype(np.float32) * 0.1
    q1, s1 = quantize_kernel(w1)
    qu, su = quantize_kernel(up)
    q2, s2 = quantize_kernel(w2)
    xq, rs = qrows(x)

    def down(h, layer):
        acc = np.zeros((M, D), np.float32)
        for t in range(-(-F // BF)):
            seg = h[:, t * BF:(t + 1) * BF]
            hq, hs = qrows(seg)
            acc += (hq @ q2[layer, t * BF:(t + 1) * BF].astype(np.float32)
                    ) * hs
        return acc * s2[layer]

    for layer in range(L):
        # gated (Qwen2MLP shape): silu(x@gate) * (x@up) @ down
        g = (xq @ q1[layer].astype(np.float32)) * rs * s1[layer]
        u = (xq @ qu[layer].astype(np.float32)) * rs * su[layer]
        ref = down((g / (1 + np.exp(-g))) * u, layer)
        got = np.asarray(w8a8_gated_mlp_stacked(
            jnp.asarray(x), jnp.asarray(q1), jnp.asarray(s1),
            jnp.asarray(qu), jnp.asarray(su), jnp.asarray(q2),
            jnp.asarray(s2), jnp.int32(layer), block_f=BF,
            out_dtype=jnp.float32, interpret=True))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

        # plain (ViTMLP shape): gelu(x@fc1 + b1) @ fc2 + b2
        from scipy.special import erf

        a = (xq @ q1[layer].astype(np.float32)) * rs * s1[layer] + b1
        ref = down(0.5 * a * (1 + erf(a / np.sqrt(2.0))), layer) + b2
        got = np.asarray(w8a8_mlp_stacked(
            jnp.asarray(x), jnp.asarray(q1), jnp.asarray(s1),
            jnp.asarray(b1), jnp.asarray(q2), jnp.asarray(s2),
            jnp.asarray(b2), jnp.int32(layer), act="gelu", block_f=BF,
            out_dtype=jnp.float32, interpret=True))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_megalayer_kernel_golden():
    """ops/pallas_megalayer.py (interpret mode) matches a numpy
    re-derivation of its exact semantics: f32 attention with an additive
    key bias, per-token context quantization into the o projection,
    residual + RMSNorm2, and the per-(token, panel) gated w8a8 MLP —
    multi-layer, multi-q-block, GQA folding, ragged F vs block_f. Inputs
    are f32 so the kernel's value-dtype casts are exact and the comparison
    is tight."""
    from vla_adapter_tpu.models.quantize import quantize_kernel
    from vla_adapter_tpu.ops.pallas_megalayer import w8a8_qwen2_layer_stacked

    def qrows(val):
        s = np.maximum(np.max(np.abs(val), axis=-1, keepdims=True),
                       1e-8) / 127.0
        return np.clip(np.round(val / s), -127, 127), s

    rng = np.random.default_rng(5)
    L, M, D, H, HKV, DH, F, BF = 2, 32, 64, 4, 2, 16, 80, 64  # F ragged
    G = H // HKV
    eps = 1e-6
    x = rng.normal(size=(M, D)).astype(np.float32)
    q = rng.normal(size=(HKV, G, M, DH)).astype(np.float32)
    k = rng.normal(size=(HKV, M, DH)).astype(np.float32)
    v = rng.normal(size=(HKV, M, DH)).astype(np.float32)
    bias = np.where(rng.random(M) < 0.8, 0.0, -2.0e9).astype(np.float32)
    n2 = rng.normal(size=(D,)).astype(np.float32) * 0.2 + 1.0
    ow = rng.normal(size=(L, H * DH, D)).astype(np.float32) * 0.05
    gw = rng.normal(size=(L, D, F)).astype(np.float32) * 0.05
    uw = rng.normal(size=(L, D, F)).astype(np.float32) * 0.05
    dw = rng.normal(size=(L, F, D)).astype(np.float32) * 0.05
    oq, osc = quantize_kernel(ow)
    gq, gs = quantize_kernel(gw)
    uq, us = quantize_kernel(uw)
    dq, ds = quantize_kernel(dw)

    def ref(layer):
        ctx = np.zeros((H, M, DH), np.float32)
        for kvh in range(HKV):
            for g in range(G):
                s = (q[kvh, g] @ k[kvh].T) * DH ** -0.5 + bias[None, :]
                mx = s.max(-1, keepdims=True)
                p = np.exp(s - mx)
                ctx[kvh * G + g] = (p @ v[kvh]) / p.sum(-1, keepdims=True)
        scale = np.maximum(np.abs(ctx).max(axis=(0, 2)), 1e-8) / 127.0
        acc = np.zeros((M, D), np.float32)
        for h in range(H):
            cq = np.clip(np.round(ctx[h] / scale[:, None]), -127, 127)
            acc += cq @ oq[layer, h * DH:(h + 1) * DH].astype(np.float32)
        xattn = x + acc * scale[:, None] * osc[layer]
        h2 = xattn / np.sqrt((xattn ** 2).mean(-1, keepdims=True) + eps) * n2
        hq, hs = qrows(h2)
        out = np.zeros((M, D), np.float32)
        for t in range(-(-F // BF)):
            g = (hq @ gq[layer, :, t * BF:(t + 1) * BF].astype(np.float32)
                 ) * hs * gs[layer, t * BF:(t + 1) * BF]
            u = (hq @ uq[layer, :, t * BF:(t + 1) * BF].astype(np.float32)
                 ) * hs * us[layer, t * BF:(t + 1) * BF]
            hm = (g / (1 + np.exp(-g))) * u
            hmq, hms = qrows(hm)
            out += (hmq @ dq[layer, t * BF:(t + 1) * BF].astype(np.float32)
                    ) * hms
        return xattn + out * ds[layer]

    for layer in range(L):
        got = np.asarray(w8a8_qwen2_layer_stacked(
            jnp.asarray(x), jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(bias), jnp.asarray(n2),
            jnp.asarray(oq), jnp.asarray(osc),
            jnp.asarray(gq), jnp.asarray(gs),
            jnp.asarray(uq), jnp.asarray(us),
            jnp.asarray(dq), jnp.asarray(ds),
            jnp.int32(layer), num_heads=H, num_kv_heads=HKV, eps=eps,
            block_q=16, block_f=BF, out_dtype=jnp.float32, interpret=True))
        np.testing.assert_allclose(got, ref(layer), rtol=2e-4, atol=2e-4)
