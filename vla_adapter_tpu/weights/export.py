"""Export: this framework's params -> the reference's HF checkpoint layout.

The inverse of weights/convert.py — unstacks scan-stacked layers, transposes
kernels back to torch (out, in) order, and writes safetensors + the
per-component head/projector files, so checkpoints trained here can be
served by the reference stack (and vice versa). Round-trip is tested in
tests/test_export.py.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict

import numpy as np

from vla_adapter_tpu.core.config import Qwen2Config, ViTConfig, VLAConfig


def _unstack(arr: np.ndarray):
    return [np.asarray(a) for a in np.asarray(arr)]


def qwen2_params_to_hf(params: Dict[str, Any], cfg: Qwen2Config,
                       prefix: str = "model.") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {
        prefix + "embed_tokens.weight": np.asarray(params["embed"]["embedding"]),
        prefix + "norm.weight": np.asarray(params["norm"]["scale"]),
    }
    layer = params["layers"]["layer"]

    def put(i, name, kernel=None, bias=None, scale=None):
        if kernel is not None:
            out[f"{prefix}layers.{i}.{name}.weight"] = np.asarray(kernel).T
        if bias is not None:
            out[f"{prefix}layers.{i}.{name}.bias"] = np.asarray(bias)
        if scale is not None:
            out[f"{prefix}layers.{i}.{name}.weight"] = np.asarray(scale)

    for i in range(cfg.num_layers):
        attn = layer["self_attn"]
        for proj in ("q_proj", "k_proj", "v_proj"):
            put(i, f"self_attn.{proj}", attn[proj]["kernel"][i],
                attn[proj].get("bias", [None] * cfg.num_layers)[i]
                if "bias" in attn[proj] else None)
        put(i, "self_attn.o_proj", attn["o_proj"]["kernel"][i])
        for proj in ("gate_proj", "up_proj", "down_proj"):
            put(i, f"mlp.{proj}", layer["mlp"][proj]["kernel"][i])
        put(i, "input_layernorm", scale=layer["input_layernorm"]["scale"][i])
        put(i, "post_attention_layernorm",
            scale=layer["post_attention_layernorm"]["scale"][i])
    return out


def vit_params_to_timm(params: Dict[str, Any], cfg: ViTConfig,
                       prefix: str = "") -> Dict[str, np.ndarray]:
    p = prefix
    out: Dict[str, np.ndarray] = {
        p + "patch_embed.proj.weight": np.transpose(
            np.asarray(params["patch_embed"]["kernel"]), (3, 2, 0, 1)
        ),
        p + "patch_embed.proj.bias": np.asarray(params["patch_embed"]["bias"]),
        p + "pos_embed": np.asarray(params["pos_embed"]),
    }
    if cfg.use_cls_token:
        out[p + "cls_token"] = np.asarray(params["cls_token"])
    if cfg.num_register_tokens:
        out[p + "reg_token"] = np.asarray(params["reg_token"])
    if cfg.pre_norm:
        out[p + "norm_pre.weight"] = np.asarray(params["norm_pre"]["scale"])
        out[p + "norm_pre.bias"] = np.asarray(params["norm_pre"]["bias"])
    block = params["blocks"]["block"]
    L = cfg.resolved_feature_layer + 1
    for i in range(L):
        b = f"{p}blocks.{i}."
        qkv_w = np.concatenate([
            np.asarray(block["attn"][n]["kernel"][i]).T
            for n in ("q_proj", "k_proj", "v_proj")
        ], axis=0)
        qkv_b = np.concatenate([
            np.asarray(block["attn"][n]["bias"][i])
            for n in ("q_proj", "k_proj", "v_proj")
        ], axis=0)
        out[b + "attn.qkv.weight"] = qkv_w
        out[b + "attn.qkv.bias"] = qkv_b
        out[b + "attn.proj.weight"] = np.asarray(
            block["attn"]["out_proj"]["kernel"][i]).T
        out[b + "attn.proj.bias"] = np.asarray(
            block["attn"]["out_proj"]["bias"][i])
        for ln in ("norm1", "norm2"):
            out[b + ln + ".weight"] = np.asarray(block[ln]["scale"][i])
            out[b + ln + ".bias"] = np.asarray(block[ln]["bias"][i])
        for fc in ("fc1", "fc2"):
            out[b + f"mlp.{fc}.weight"] = np.asarray(
                block["mlp"][fc]["kernel"][i]).T
            out[b + f"mlp.{fc}.bias"] = np.asarray(block["mlp"][fc]["bias"][i])
        if cfg.layer_scale_init is not None:
            out[b + "ls1.gamma"] = np.asarray(block["ls1"]["gamma"][i])
            out[b + "ls2.gamma"] = np.asarray(block["ls2"]["gamma"][i])
    return out


def vla_params_to_hf(params: Dict[str, Any], cfg: VLAConfig
                     ) -> Dict[str, np.ndarray]:
    """Backbone subtree -> flat HF-layout dict (LoRA must be merged)."""
    out = qwen2_params_to_hf(params["language_model"], cfg.llm,
                             prefix="language_model.model.")
    out.update(vit_params_to_timm(
        params["vision_backbone"]["featurizer"], cfg.vision.primary,
        prefix="vision_backbone.featurizer.",
    ))
    if cfg.vision.fused is not None:
        out.update(vit_params_to_timm(
            params["vision_backbone"]["fused_featurizer"], cfg.vision.fused,
            prefix="vision_backbone.fused_featurizer.",
        ))
        names = ("fc1", "fc2", "fc3")
    else:
        names = ("fc1", "fc2")
    for n in names:
        out[f"projector.{n}.weight"] = np.asarray(
            params["projector"][n]["kernel"]).T
        out[f"projector.{n}.bias"] = np.asarray(params["projector"][n]["bias"])
    out["action_queries.weight"] = np.asarray(params["action_queries"])
    return out


def head_params_to_torch(params: Dict[str, Any], use_pro_version: bool,
                         prefix: str = "model.") -> Dict[str, np.ndarray]:
    """action_head subtree -> reference L1RegressionActionHead state dict."""
    p = prefix
    out = {
        p + "layer_norm1.weight": np.asarray(params["input_norm"]["scale"]),
        p + "layer_norm1.bias": np.asarray(params["input_norm"]["bias"]),
        p + "fc1.weight": np.asarray(params["fc_in"]["kernel"]).T,
        p + "fc1.bias": np.asarray(params["fc_in"]["bias"]),
        p + "layer_norm2.weight": np.asarray(params["out_norm"]["scale"]),
        p + "layer_norm2.bias": np.asarray(params["out_norm"]["bias"]),
        p + "fc2.weight": np.asarray(params["fc_out"]["kernel"]).T,
        p + "fc2.bias": np.asarray(params["fc_out"]["bias"]),
    }
    block = params["blocks"]["block"]
    scan_names = (("q_proj", "k_self", "v_self", "o_proj") if use_pro_version
                  else ("q_proj", "o_proj"))
    hoisted_names = (("k_adapter", "v_adapter", "k_task", "v_task")
                     if use_pro_version else ("k_proj", "v_proj"))
    L = len(np.asarray(block["gating_factor"]))
    for i in range(L):
        b = f"{p}mlp_resnet_blocks.{i}."
        for n in scan_names:
            out[b + n + ".weight"] = np.asarray(block[n]["kernel"][i]).T
            out[b + n + ".bias"] = np.asarray(block[n]["bias"][i])
        for n in hoisted_names:  # head-level stacks (action_head.py layout)
            out[b + n + ".weight"] = np.asarray(params[n]["kernel"][i]).T
            out[b + n + ".bias"] = np.asarray(params[n]["bias"][i])
        out[b + "gating_factor"] = np.asarray(block["gating_factor"][i])
        out[b + "ffn.0.weight"] = np.asarray(block["ffn_norm"]["scale"][i])
        out[b + "ffn.0.bias"] = np.asarray(block["ffn_norm"]["bias"][i])
        out[b + "ffn.1.weight"] = np.asarray(block["ffn_fc"]["kernel"][i]).T
        out[b + "ffn.1.bias"] = np.asarray(block["ffn_fc"]["bias"][i])
    return out


def export_checkpoint_dir(params: Dict[str, Any], cfg: VLAConfig, out_dir,
                          norm_stats: Dict | None = None) -> Path:
    """Write a reference-layout checkpoint dir (safetensors + head .pt +
    dataset_statistics.json). torch is required for the .pt files."""
    import torch
    from safetensors.numpy import save_file

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    backbone = vla_params_to_hf(params, cfg)
    save_file({k: np.ascontiguousarray(v) for k, v in backbone.items()},
              out_dir / "model.safetensors")
    head_sd = head_params_to_torch(params["action_head"],
                                   cfg.head.use_pro_version)
    torch.save({k: torch.tensor(v) for k, v in head_sd.items()},
               out_dir / "action_head--0_checkpoint.pt")
    if "proprio_projector" in params:
        pp = params["proprio_projector"]
        torch.save(
            {f"{n}.weight": torch.tensor(np.asarray(pp[n]["kernel"]).T)
             for n in pp} |
            {f"{n}.bias": torch.tensor(np.asarray(pp[n]["bias"]))
             for n in pp},
            out_dir / "proprio_projector--0_checkpoint.pt",
        )
    if norm_stats is not None:
        (out_dir / "dataset_statistics.json").write_text(
            json.dumps(norm_stats, indent=2)
        )
    write_config_json(cfg, out_dir, norm_stats=norm_stats)
    return out_dir


def write_config_json(cfg: VLAConfig, out_dir, norm_stats=None) -> Path:
    """Reference-compatible config.json + a lossless `vla_adapter_tpu` block
    so non-registry geometries round-trip through load.vla_config_from_checkpoint."""
    from vla_adapter_tpu.core.config import PhiConfig, vla_config_to_dict

    l = cfg.llm
    if isinstance(l, PhiConfig):
        text_config = {
            "model_type": "phi",
            "vocab_size": l.vocab_size,
            "hidden_size": l.hidden_size,
            "num_hidden_layers": l.num_layers,
            "num_attention_heads": l.num_heads,
            "intermediate_size": l.intermediate_size,
            "layer_norm_eps": l.layer_norm_eps,
            "partial_rotary_factor": l.partial_rotary_factor,
            "rope_theta": l.rope_theta,
            "tie_word_embeddings": False,
        }
    else:
        text_config = {
            "model_type": "qwen2",
            "vocab_size": l.vocab_size,
            "hidden_size": l.hidden_size,
            "num_hidden_layers": l.num_layers,
            "num_attention_heads": l.num_heads,
            "num_key_value_heads": l.num_kv_heads,
            "intermediate_size": l.intermediate_size,
            "rms_norm_eps": l.rms_norm_eps,
            "rope_theta": l.rope_theta,
            "head_dim": l.head_dim,
            "tie_word_embeddings": l.tie_word_embeddings,
        }
    doc = {
        "model_type": "openvla",
        "n_action_bins": cfg.n_action_bins,
        "text_config": text_config,
        "vla_adapter_tpu": vla_config_to_dict(cfg),
    }
    if norm_stats is not None:
        doc["norm_stats"] = norm_stats
    out = Path(out_dir) / "config.json"
    out.write_text(json.dumps(doc, indent=2))
    return out
