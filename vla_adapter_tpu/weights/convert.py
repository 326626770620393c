"""Checkpoint ingestion: torch/HF/timm layouts -> this framework's params.

Three source layouts matter (SURVEY.md section 1):
  * HF ``Qwen2ForCausalLM`` state dicts (the language model),
  * timm ViT state dicts (DINOv2 / SigLIP towers),
  * the reference's exported OpenVLA checkpoint, which is the HF layout
    after the rename map applied in reference finetune.py:792-815
    (dino_featurizer->featurizer, siglip_featurizer->fused_featurizer,
    llm_backbone.llm->language_model, projector.projector.{0,2,4}->fc{1,2,3},
    gamma->scale_factor).

All converters take a flat ``{name: np.ndarray}`` dict (call
:func:`state_dict_to_numpy` on a torch state dict first) so torch never has
to be imported on the TPU host.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from vla_adapter_tpu.core.config import Qwen2Config, ViTConfig


def state_dict_to_numpy(state_dict: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Convert a torch state dict to numpy (fp32 for bf16/fp16 tensors)."""
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach()
            if str(v.dtype) in ("torch.bfloat16", "torch.float16"):
                v = v.float()
            v = v.cpu().numpy()
        out[k] = np.asarray(v)
    return out


def _stack(sd: Dict[str, np.ndarray], fmt: str, num_layers: int, transpose: bool):
    mats = [sd[fmt.format(i)] for i in range(num_layers)]
    if transpose:
        mats = [m.T for m in mats]
    return np.stack(mats, axis=0)


def qwen2_params_from_hf(
    sd: Dict[str, np.ndarray], cfg: Qwen2Config, prefix: str = "model."
) -> Dict[str, Any]:
    """HF Qwen2ForCausalLM state dict -> Qwen2Model params (scan-stacked).

    Dense kernels are transposed to (in, out); per-layer tensors are stacked
    on a leading `layers` axis matching nn.scan.
    """
    L = cfg.num_layers
    p = prefix

    def lin(name: str, bias: bool):
        d = {"kernel": _stack(sd, p + "layers.{}." + name + ".weight", L, True)}
        if bias:
            d["bias"] = _stack(sd, p + "layers.{}." + name + ".bias", L, False)
        return d

    attn_bias = cfg.attention_bias
    layer = {
        "self_attn": {
            "q_proj": lin("self_attn.q_proj", attn_bias),
            "k_proj": lin("self_attn.k_proj", attn_bias),
            "v_proj": lin("self_attn.v_proj", attn_bias),
            "o_proj": lin("self_attn.o_proj", False),
        },
        "mlp": {
            "gate_proj": lin("mlp.gate_proj", False),
            "up_proj": lin("mlp.up_proj", False),
            "down_proj": lin("mlp.down_proj", False),
        },
        "input_layernorm": {
            "scale": _stack(sd, p + "layers.{}.input_layernorm.weight", L, False)
        },
        "post_attention_layernorm": {
            "scale": _stack(sd, p + "layers.{}.post_attention_layernorm.weight", L, False)
        },
    }
    return {
        "embed": {"embedding": sd[p + "embed_tokens.weight"]},
        "layers": {"layer": layer},
        "norm": {"scale": sd[p + "norm.weight"]},
    }


def phi_params_from_hf(
    sd: Dict[str, np.ndarray], cfg, prefix: str = "model."
) -> Dict[str, Any]:
    """HF PhiForCausalLM state dict -> models/phi.PhiModel params.

    Reference backbone: prismatic/models/backbones/llm/phi.py (`phi-2-3b`).
    Same stacking conventions as :func:`qwen2_params_from_hf`; Phi's
    LayerNorms carry biases and lm_head is untied (with bias).
    """
    L = cfg.num_layers
    p = prefix

    def lin(name: str):
        return {
            "kernel": _stack(sd, p + "layers.{}." + name + ".weight", L, True),
            "bias": _stack(sd, p + "layers.{}." + name + ".bias", L, False),
        }

    def ln(name: str):
        return {
            "scale": _stack(sd, p + "layers.{}." + name + ".weight", L, False),
            "bias": _stack(sd, p + "layers.{}." + name + ".bias", L, False),
        }

    layer = {
        "input_layernorm": ln("input_layernorm"),
        "self_attn": {
            "q_proj": lin("self_attn.q_proj"),
            "k_proj": lin("self_attn.k_proj"),
            "v_proj": lin("self_attn.v_proj"),
            "dense": lin("self_attn.dense"),
        },
        "fc1": lin("mlp.fc1"),
        "fc2": lin("mlp.fc2"),
    }
    return {
        "embed": {"embedding": sd[p + "embed_tokens.weight"]},
        "layers": {"layer": layer},
        "final_layernorm": {
            "scale": sd[p + "final_layernorm.weight"],
            "bias": sd[p + "final_layernorm.bias"],
        },
        "lm_head": {
            "kernel": sd["lm_head.weight"].T,
            "bias": sd["lm_head.bias"],
        },
    }


def vit_params_from_timm(
    sd: Dict[str, np.ndarray], cfg: ViTConfig, prefix: str = ""
) -> Dict[str, Any]:
    """timm VisionTransformer state dict -> models/vit.py params.

    timm layout: patch_embed.proj.{weight (E,3,ph,pw), bias}, cls_token,
    reg_token, pos_embed, blocks.{i}.norm1/attn.qkv/attn.proj/norm2/
    mlp.fc1/mlp.fc2[/ls1.gamma, ls2.gamma].

    Only blocks 0..feature_layer are imported — blocks past the feature tap
    (and the final norm) are never executed by models/vit.py, matching the
    reference's discard-after-tap behavior with fewer FLOPs.
    """
    L = cfg.resolved_feature_layer + 1
    p = prefix

    def block_lin(name):
        return {
            "kernel": _stack(sd, p + "blocks.{}." + name + ".weight", L, True),
            "bias": _stack(sd, p + "blocks.{}." + name + ".bias", L, False),
        }

    # timm fuses qkv: (3E, E). Split into q/k/v kernels (E, E) each.
    qkv_w = np.stack([sd[f"{p}blocks.{i}.attn.qkv.weight"] for i in range(L)], 0)
    qkv_b = np.stack([sd[f"{p}blocks.{i}.attn.qkv.bias"] for i in range(L)], 0)
    q_w, k_w, v_w = np.split(qkv_w, 3, axis=1)
    q_b, k_b, v_b = np.split(qkv_b, 3, axis=1)

    def ln(name):
        return {
            "scale": _stack(sd, p + "blocks.{}." + name + ".weight", L, False),
            "bias": _stack(sd, p + "blocks.{}." + name + ".bias", L, False),
        }

    block = {
        "norm1": ln("norm1"),
        "attn": {
            "q_proj": {"kernel": np.swapaxes(q_w, 1, 2), "bias": q_b},
            "k_proj": {"kernel": np.swapaxes(k_w, 1, 2), "bias": k_b},
            "v_proj": {"kernel": np.swapaxes(v_w, 1, 2), "bias": v_b},
            "out_proj": block_lin("attn.proj"),
        },
        "norm2": ln("norm2"),
        "mlp": {"fc1": block_lin("mlp.fc1"), "fc2": block_lin("mlp.fc2")},
    }
    if cfg.layer_scale_init is not None:
        # timm LayerScale param is `gamma`; the HF export renames it to
        # `scale_factor` (reference modeling_prismatic.py:55-66). Accept both.
        def ls(name):
            key_a = p + "blocks.{}." + name + ".gamma"
            key_b = p + "blocks.{}." + name + ".scale_factor"
            key = key_a if key_a.format(0) in sd else key_b
            return {"gamma": _stack(sd, key, L, False)}

        block["ls1"] = ls("ls1")
        block["ls2"] = ls("ls2")

    params: Dict[str, Any] = {
        "patch_embed": {
            # torch conv (E, C, kh, kw) -> flax conv (kh, kw, C, E)
            "kernel": np.transpose(sd[p + "patch_embed.proj.weight"], (2, 3, 1, 0)),
            "bias": sd[p + "patch_embed.proj.bias"],
        },
        "pos_embed": sd[p + "pos_embed"],
        "blocks": {"block": block},
    }
    if cfg.use_cls_token:
        params["cls_token"] = sd[p + "cls_token"]
    if cfg.num_register_tokens:
        params["reg_token"] = sd[p + "reg_token"]
    if cfg.pre_norm:
        params["norm_pre"] = {
            "scale": sd[p + "norm_pre.weight"],
            "bias": sd[p + "norm_pre.bias"],
        }
    return params


def strip_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """Drop a leading prefix (e.g. DDP's 'module.') from every key that has
    it (reference: finetune.py:132-211 remove_ddp_in_checkpoint)."""
    return {
        (k[len(prefix):] if k.startswith(prefix) else k): v for k, v in sd.items()
    }


def vla_params_from_hf(sd: Dict[str, np.ndarray], cfg) -> Dict[str, Any]:
    """Full OpenVLA HF-layout state dict -> models/vla.py param tree.

    Expected key families (the layout of the reference's exported
    checkpoints, after LoRA merge):
      vision_backbone.featurizer.* / vision_backbone.fused_featurizer.*
      projector.fc{1,2,3}.*
      language_model.model.*   (lm_head tied — ignored)
      action_queries.weight

    The action head and proprio projector live in separate checkpoint files
    (reference finetune.py:494-601) — load them with
    action_head_params_from_torch / mlp_projector_params_from_torch.
    """
    from vla_adapter_tpu.core.config import VLAConfig  # local to avoid cycle

    assert isinstance(cfg, VLAConfig)
    params: Dict[str, Any] = {
        "language_model": qwen2_params_from_hf(
            sd, cfg.llm, prefix="language_model.model."
        ),
        "action_queries": sd["action_queries.weight"],
        "vision_backbone": {
            "featurizer": vit_params_from_timm(
                sd, cfg.vision.primary, prefix="vision_backbone.featurizer."
            ),
        },
    }
    if cfg.vision.fused is not None:
        params["vision_backbone"]["fused_featurizer"] = vit_params_from_timm(
            sd, cfg.vision.fused, prefix="vision_backbone.fused_featurizer."
        )
        proj_names = ("fc1", "fc2", "fc3")
    else:
        proj_names = ("fc1", "fc2")
    params["projector"] = mlp_projector_params_from_torch(
        sd, names=proj_names, prefix="projector."
    )
    return params


def _lin(sd, name):
    return {"kernel": sd[name + ".weight"].T, "bias": sd[name + ".bias"]}


def _ln(sd, name):
    return {"scale": sd[name + ".weight"], "bias": sd[name + ".bias"]}


def mlp_projector_params_from_torch(
    sd: Dict[str, np.ndarray], names=("fc1", "fc2"), prefix: str = ""
) -> Dict[str, Any]:
    """fcN-style MLP (vision/proprio/noisy-action projectors)."""
    return {n: _lin(sd, prefix + n) for n in names}


def action_head_params_from_torch(
    sd: Dict[str, np.ndarray], num_blocks: int, use_pro_version: bool,
    prefix: str = "model.",
) -> Dict[str, Any]:
    """Reference L1RegressionActionHead state dict -> models/action_head.py.

    torch layout (action_heads.py:84-410): {prefix}layer_norm1/fc1/
    mlp_resnet_blocks.{i}.*/layer_norm2/fc2. The Pro blocks' dead `film_gen`
    params (action_heads.py:327-334) are ignored; `rope.inv_freq` is a
    non-persistent buffer and never appears in checkpoints.
    """
    p = prefix

    def blk(fmt: str, transpose=True):
        return _stack(sd, p + "mlp_resnet_blocks.{}." + fmt, num_blocks, transpose)

    def blk_lin(name: str):
        return {"kernel": blk(name + ".weight"), "bias": blk(name + ".bias", False)}

    # in-scan params (depend on the evolving chunk latents) stay under
    # blocks/block; the hoisted task/adapter stream projections live at
    # head level as stacked (L, in, out) kernels (see action_head.py
    # "TPU-first layout")
    if use_pro_version:
        scan_names = ("q_proj", "k_self", "v_self", "o_proj")
        hoisted_names = ("k_adapter", "v_adapter", "k_task", "v_task")
    else:
        scan_names = ("q_proj", "o_proj")
        hoisted_names = ("k_proj", "v_proj")
    block: Dict[str, Any] = {n: blk_lin(n) for n in scan_names}
    block["gating_factor"] = blk("gating_factor", False)
    block["ffn_norm"] = {"scale": blk("ffn.0.weight", False),
                         "bias": blk("ffn.0.bias", False)}
    block["ffn_fc"] = {"kernel": blk("ffn.1.weight"), "bias": blk("ffn.1.bias", False)}

    out = {
        "input_norm": _ln(sd, p + "layer_norm1"),
        "fc_in": _lin(sd, p + "fc1"),
        "blocks": {"block": block},
        "out_norm": _ln(sd, p + "layer_norm2"),
        "fc_out": _lin(sd, p + "fc2"),
    }
    for n in hoisted_names:
        out[n] = blk_lin(n)
    return out


# The rename map applied by reference finetune.py:792-815 when loading the
# native Prismatic checkpoint into the HF module layout. Our canonical
# ingestion target is the HF layout, so native checkpoints are first mapped
# through this table (substring replacements, applied in order).
NATIVE_TO_HF_RENAMES = (
    ("vision_backbone.dino_featurizer", "vision_backbone.featurizer"),
    ("vision_backbone.siglip_featurizer", "vision_backbone.fused_featurizer"),
    ("llm_backbone.llm", "language_model"),
    ("projector.projector.0", "projector.fc1"),
    ("projector.projector.2", "projector.fc2"),
    ("projector.projector.4", "projector.fc3"),
    ("gamma", "scale_factor"),
)


def native_prismatic_to_hf(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        for a, b in NATIVE_TO_HF_RENAMES:
            k = k.replace(a, b)
        out[k] = v
    return out
