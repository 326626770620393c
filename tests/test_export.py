"""Round-trip: our params -> HF/torch layout -> back through the importers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_train_step import TINY_CFG
from vla_adapter_tpu.data.dummy import make_dummy_batch
from vla_adapter_tpu.models.layers import Runtime
from vla_adapter_tpu.models.vla import VLAModel
from vla_adapter_tpu.weights.convert import (
    action_head_params_from_torch,
    mlp_projector_params_from_torch,
    qwen2_params_from_hf,
    vit_params_from_timm,
    vla_params_from_hf,
)
from vla_adapter_tpu.weights.export import (
    head_params_to_torch,
    vla_params_to_hf,
)


def test_roundtrip_through_hf_layout():
    rt = Runtime(dtype=jnp.float32, param_dtype=jnp.float32, attn_impl="xla")
    model = VLAModel(TINY_CFG, rt)
    batch = make_dummy_batch(TINY_CFG, 1, np.random.default_rng(0))
    batch = jax.tree.map(jnp.asarray, batch)
    kwargs = dict(
        input_ids=batch["input_ids"], prompt_len=batch["prompt_len"],
        text_valid=batch["text_valid"], pixel_values=batch["pixel_values"],
        proprio=batch["proprio"],
    )
    params = jax.device_get(model.init(jax.random.key(0), **kwargs)["params"])

    # export backbone + head, re-import, compare leaves exactly
    sd = vla_params_to_hf(params, TINY_CFG)
    back = vla_params_from_hf(sd, TINY_CFG)
    head_sd = head_params_to_torch(params["action_head"],
                                   TINY_CFG.head.use_pro_version)
    back["action_head"] = action_head_params_from_torch(
        head_sd, TINY_CFG.head.num_blocks, TINY_CFG.head.use_pro_version
    )
    back["proprio_projector"] = params["proprio_projector"]

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_flatten_with_path(back)[0]}
    assert len(flat_a) == len(flat_b)
    for p, v in flat_a:
        key = jax.tree_util.keystr(p)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(flat_b[key]),
                                      err_msg=key)

    # and the reimported tree produces identical actions
    out_a = model.apply({"params": params}, **kwargs)["actions"]
    out_b = model.apply({"params": back}, **kwargs)["actions"]
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)


def test_export_checkpoint_dir_loads(tmp_path):
    torch = pytest.importorskip("torch")
    from vla_adapter_tpu.weights.export import export_checkpoint_dir
    from vla_adapter_tpu.weights.load import (
        load_hf_backbone_state_dict,
        load_norm_stats,
        load_torch_file,
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

    out = export_checkpoint_dir(
        params, TINY_CFG, tmp_path / "export",
        norm_stats={"d": {"action": {"q01": [0] * 7}}},
    )
    sd = load_hf_backbone_state_dict(out)
    assert "action_queries.weight" in sd
    head_sd = load_torch_file(out / "action_head--0_checkpoint.pt")
    assert any(k.startswith("model.mlp_resnet_blocks") for k in head_sd)
    assert "d" in load_norm_stats(out)
