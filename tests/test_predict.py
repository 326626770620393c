"""Predictor (infer/predict.py) smoke + consistency tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_train_step import TINY_CFG
from vla_adapter_tpu.data.normalization import dataset_statistics
from vla_adapter_tpu.data.tokenization import MockTokenizer
from vla_adapter_tpu.infer.predict import Predictor
from vla_adapter_tpu.models.layers import Runtime
from vla_adapter_tpu.models.vla import VLAModel


@pytest.fixture(scope="module")
def predictor():
    import dataclasses

    cfg = dataclasses.replace(
        TINY_CFG,
        vision=dataclasses.replace(TINY_CFG.vision, num_images=2),
        max_text_tokens=96,  # the chat prompt is ~30 tokens + 16 queries
    )
    rt = Runtime(dtype=jnp.float32, param_dtype=jnp.float32, attn_impl="xla")
    model = VLAModel(cfg, rt)
    params = model.init(
        jax.random.key(0),
        input_ids=jnp.zeros((1, cfg.max_text_tokens), jnp.int32),
        prompt_len=jnp.array([5], jnp.int32),
        text_valid=jnp.ones((1, cfg.max_text_tokens), jnp.int32),
        pixel_values=jnp.zeros((1, 2, 28, 28, 3), jnp.float32),
        proprio=jnp.zeros((1, 8), jnp.float32),
    )["params"]

    rng = np.random.default_rng(0)
    stats = {"libero_spatial": dataset_statistics(
        rng.uniform(-2, 3, size=(500, 7)),
        proprio=rng.normal(size=(500, 8)),
        action_mask=[True] * 6 + [False],
    )}
    tok = MockTokenizer()
    return Predictor(
        cfg=cfg,
        params=params,
        tokenize=lambda t: tok(t).input_ids,
        norm_stats=stats,
        rt=rt,
        center_crop=False,
    )


def test_predict_action_shape_and_range(predictor):
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 255, size=(80, 100, 3), dtype=np.uint8)
            for _ in range(2)]
    a = predictor.predict_action(imgs, "pick up the cup",
                                 proprio=rng.normal(size=8))
    assert a.shape == (8, 7)
    assert np.isfinite(a).all()
    # masked dims map through the affine q01/q99 unnormalization; the
    # gripper dim (mask=False) passes through raw — verify the affine
    # relation holds between dims 0..5 and the re-normalized values.
    from vla_adapter_tpu.core.constants import NormalizationType
    from vla_adapter_tpu.data.normalization import _bounds

    stats = predictor.norm_stats["libero_spatial"]["action"]
    lo, hi = _bounds(stats, NormalizationType.BOUNDS_Q99)
    back = 2 * (a - lo) / (hi - lo + 1e-8) - 1  # inverse affine (no clip)
    assert np.isfinite(back).all()


def test_int8_predictor_close_to_fp(predictor):
    import dataclasses

    from vla_adapter_tpu.infer.predict import Predictor

    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
            for _ in range(2)]
    p = rng.normal(size=8)
    pred_q = Predictor(
        cfg=predictor.cfg, params=predictor.params,
        tokenize=predictor.tokenize, norm_stats=predictor.norm_stats,
        rt=predictor.rt, center_crop=False, int8=True,
    )
    a_fp = predictor.predict_action(imgs, "fold the towel", proprio=p)
    a_q = pred_q.predict_action(imgs, "fold the towel", proprio=p)
    assert np.isfinite(a_q).all()
    assert np.corrcoef(a_q.ravel(), a_fp.ravel())[0, 1] > 0.99

    # w8a8 serving path (act_int8 forces the min-dim gate down so the int8
    # MXU branch actually runs on the tiny test geometry)
    pred_a8 = Predictor(
        cfg=predictor.cfg, params=predictor.params,
        tokenize=predictor.tokenize, norm_stats=predictor.norm_stats,
        rt=dataclasses.replace(predictor.rt, act_int8_min_dim=1),
        center_crop=False, act_int8=True,
    )
    a_a8 = pred_a8.predict_action(imgs, "fold the towel", proprio=p)
    assert np.isfinite(a_a8).all()
    assert np.corrcoef(a_a8.ravel(), a_fp.ravel())[0, 1] > 0.97

    # fused backend (whole-MLP kernel, ops/pallas_fused_mlp.py): the MLP
    # weights land in qstack, the rest stay per-layer params; actions match
    # the XLA w8a8 path (at tiny F one quant group == per-token quant)
    pred_fu = Predictor(
        cfg=predictor.cfg, params=predictor.params,
        tokenize=predictor.tokenize, norm_stats=predictor.norm_stats,
        rt=dataclasses.replace(predictor.rt, act_int8_min_dim=1),
        center_crop=False, act_int8=True, w8a8_impl="fused",
    )
    assert "qstack" in pred_fu._params_device
    a_fu = pred_fu.predict_action(imgs, "fold the towel", proprio=p)
    np.testing.assert_allclose(a_fu, a_a8, rtol=1e-4, atol=1e-4)

    # "auto" (the default): batch-keyed dispatch — fused at batch 1, XLA
    # above (models/layers.resolve_w8a8_impl) — matching the forced
    # backends exactly, with the backends sharing device weight buffers
    # (the qstack split regroups references; only lane-padded stacks copy).
    pred_auto = Predictor(
        cfg=predictor.cfg, params=predictor.params,
        tokenize=predictor.tokenize, norm_stats=predictor.norm_stats,
        rt=dataclasses.replace(predictor.rt, act_int8_min_dim=1),
        center_crop=False, act_int8=True,  # w8a8_impl defaults to "auto"
    )
    assert set(pred_auto._backends) == {"fused", "xla"}
    assert "qstack" in pred_auto._backends["fused"][1]
    a_auto1 = pred_auto.predict_action(imgs, "fold the towel", proprio=p)
    np.testing.assert_array_equal(a_auto1, a_fu)
    a_auto2 = pred_auto.predict_action_batch(
        [imgs, imgs], ["fold the towel"] * 2, [p, p])
    a_xla2 = pred_a8.predict_action_batch(
        [imgs, imgs], ["fold the towel"] * 2, [p, p])
    np.testing.assert_array_equal(a_auto2, a_xla2)
    # shared buffers: every fused-layout leaf is the same device array as
    # some leaf of the xla-layout params tree, EXCEPT lane-padded qstack
    # storage (models/layers._stacked_qkernel pads non-tile-aligned int8
    # stacks, so split_qstack materializes fresh padded buffers for those;
    # their numerics are pinned by the array_equal assertions above)
    fused_tree = pred_auto._backends["fused"][1]
    x_leaves = {id(l) for l in jax.tree_util.tree_leaves(
        pred_auto._backends["xla"][1])}
    qstack_ids = {id(l) for l in jax.tree_util.tree_leaves(
        fused_tree.get("qstack", {}))}
    unshared = [l for l in jax.tree_util.tree_leaves(fused_tree)
                if id(l) not in x_leaves]
    assert all(id(l) in qstack_ids for l in unshared), (
        "non-qstack fused leaves must share the xla backend's buffers")


def test_prequantized_rt_predictor(predictor):
    """The serve/loadtest construction pattern: params already in the
    quantized layout, the serving mode carried entirely in `rt`
    (int8=act_int8=False flags). Predictor must key the qstack split off
    the EFFECTIVE runtime, not its constructor flags — regression for the
    round-3 review finding where this path crashed with
    ScopeCollectionNotFound under the stacked qstack layout."""
    import dataclasses

    from vla_adapter_tpu.infer.predict import Predictor
    from vla_adapter_tpu.models.quantize import quantize_params

    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
            for _ in range(2)]
    p = rng.normal(size=8)
    rt_q = dataclasses.replace(
        predictor.rt, weights_int8=True, act_int8=True, act_int8_min_dim=1,
        w8a8_impl="fused")
    pred_rt = Predictor(
        cfg=predictor.cfg,
        params=quantize_params(jax.device_get(predictor.params)),
        tokenize=predictor.tokenize, norm_stats=predictor.norm_stats,
        rt=rt_q, center_crop=False,  # int8/act_int8 flags deliberately off
    )
    assert "qstack" in pred_rt._params_device
    # identical to the flag-constructed variant (which quantizes itself)
    pred_flags = Predictor(
        cfg=predictor.cfg, params=predictor.params,
        tokenize=predictor.tokenize, norm_stats=predictor.norm_stats,
        rt=dataclasses.replace(predictor.rt, act_int8_min_dim=1),
        center_crop=False, act_int8=True, w8a8_impl="fused",
    )
    a_rt = pred_rt.predict_action(imgs, "wipe the table", proprio=p)
    a_fl = pred_flags.predict_action(imgs, "wipe the table", proprio=p)
    np.testing.assert_allclose(a_rt, a_fl, rtol=1e-5, atol=1e-5)

    # a concrete non-xla backend without act_int8 anywhere would silently
    # serve on XLA — must be rejected loudly instead ("auto" is fine: it
    # degenerates to the single XLA backend)
    with pytest.raises(ValueError, match="act_int8"):
        Predictor(
            cfg=predictor.cfg, params=predictor.params,
            tokenize=predictor.tokenize, norm_stats=predictor.norm_stats,
            rt=predictor.rt, center_crop=False, w8a8_impl="fused",
        )
    # the demoted round-3 backends are rejected at Runtime construction
    with pytest.raises(ValueError, match="demoted"):
        dataclasses.replace(predictor.rt, w8a8_impl="pallas_stacked")
    # float-path "auto" serves on the single XLA backend
    pred_float = Predictor(
        cfg=predictor.cfg, params=predictor.params,
        tokenize=predictor.tokenize, norm_stats=predictor.norm_stats,
        rt=predictor.rt, center_crop=False,  # w8a8_impl defaults to "auto"
    )
    assert pred_float.w8a8_impl == "xla"
    assert set(pred_float._backends) == {"xla"}


def test_batch_matches_single(predictor):
    rng = np.random.default_rng(2)
    imgs1 = [rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
             for _ in range(2)]
    imgs2 = [rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
             for _ in range(2)]
    p1, p2 = rng.normal(size=8), rng.normal(size=8)
    single1 = predictor.predict_action(imgs1, "task one", proprio=p1)
    single2 = predictor.predict_action(imgs2, "task two longer text", proprio=p2)
    batched = predictor.predict_action_batch(
        [imgs1, imgs2], ["task one", "task two longer text"], [p1, p2]
    )
    np.testing.assert_allclose(batched[0], single1, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(batched[1], single2, atol=2e-4, rtol=1e-3)


def test_device_normalize_matches_host_path(predictor):
    """uint8-to-device + on-device normalization == host fp32 pipeline.

    The serving default ships uint8 pixels (half the H2D bytes) and runs
    (x/255 - mean)/std on device. The raw pixel values agree bit-for-bit
    pre-jit; under jit XLA refactors the affine chain (x*(1/(255*std)) -
    mean/std), so actions agree to float rounding (~5e-6), far below the
    bf16 serving noise floor."""
    import dataclasses

    from vla_adapter_tpu.infer.predict import Predictor

    rng = np.random.default_rng(11)
    imgs = [rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
            for _ in range(2)]
    p = rng.normal(size=8)
    assert predictor.device_normalize  # the default
    host = Predictor(
        cfg=predictor.cfg, params=predictor.params,
        tokenize=predictor.tokenize, norm_stats=predictor.norm_stats,
        rt=predictor.rt, center_crop=False, device_normalize=False,
    )
    a_dev = predictor.predict_action(imgs, "wipe the table", proprio=p)
    a_host = host.predict_action(imgs, "wipe the table", proprio=p)
    np.testing.assert_allclose(a_dev, a_host, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_preprocess_pool_matches_inline(predictor):
    """The process-pool pixel pipeline must equal the inline one exactly
    (same code, different process)."""
    rng = np.random.default_rng(21)
    imgs = [rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
            for _ in range(2)]
    p = rng.normal(size=8)
    inline = predictor.preprocess(imgs, "close the drawer", p)
    predictor.enable_preprocess_pool(workers=1)
    try:
        pooled = predictor.preprocess(imgs, "close the drawer", p)
    finally:
        predictor._pixel_pool.close()
        predictor._pixel_pool = None
    np.testing.assert_array_equal(inline["pixels"], pooled["pixels"])
    np.testing.assert_array_equal(inline["ids"], pooled["ids"])


def test_mixed_proprio_batch_raises(predictor):
    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 255, size=(40, 40, 3), dtype=np.uint8)
            for _ in range(2)]
    rows = [predictor.preprocess(imgs, "a", rng.normal(size=8)),
            predictor.preprocess(imgs, "b", None)]
    with pytest.raises(ValueError, match="proprio"):
        predictor.predict_action_rows(rows)
