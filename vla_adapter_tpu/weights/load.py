"""High-level checkpoint loading: reference artifacts -> a ready model.

The reference's released checkpoint layout (finetune.py:494-601 +
eval loaders openvla_utils.py:201-539):
  <ckpt_dir>/
    config.json                      (OpenVLAConfig incl. norm_stats)
    model*.safetensors | pytorch_model*.bin   (HF export, LoRA merged)
    action_head--<step>_checkpoint.pt
    proprio_projector--<step>_checkpoint.pt
    dataset_statistics.json          (required for unnormalization)
    vocab.json / merges.txt / tokenizer_config.json

:func:`load_vla` ingests all of it into a Predictor. torch is only needed
for .pt/.bin files (host-side, CPU); safetensors are read without torch.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

from vla_adapter_tpu.core.config import VLAConfig
from vla_adapter_tpu.weights.convert import (
    action_head_params_from_torch,
    mlp_projector_params_from_torch,
    state_dict_to_numpy,
    strip_prefix,
    vla_params_from_hf,
)


def load_torch_file(path) -> Dict[str, np.ndarray]:
    """torch.load (CPU) -> numpy dict, DDP 'module.' prefix stripped."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return strip_prefix(state_dict_to_numpy(sd), "module.")


def load_safetensors_dir(ckpt_dir) -> Dict[str, np.ndarray]:
    """All *.safetensors shards in a dir -> one numpy dict (no torch)."""
    from safetensors import safe_open

    out: Dict[str, np.ndarray] = {}
    for shard in sorted(Path(ckpt_dir).glob("*.safetensors")):
        with safe_open(shard, framework="numpy") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
    return out


def _find_one(ckpt_dir, pattern: str) -> Optional[Path]:
    """Glob with exactly-one assertion (reference openvla_utils.py:201-269)."""
    matches = sorted(Path(ckpt_dir).glob(pattern))
    if not matches:
        return None
    assert len(matches) == 1, f"multiple matches for {pattern}: {matches}"
    return matches[0]


def load_hf_backbone_state_dict(ckpt_dir) -> Dict[str, np.ndarray]:
    ckpt_dir = Path(ckpt_dir)
    if list(ckpt_dir.glob("*.safetensors")):
        sd = load_safetensors_dir(ckpt_dir)
    else:
        sd = {}
        bins = sorted(ckpt_dir.glob("pytorch_model*.bin")) or sorted(
            ckpt_dir.glob("*.pt")
        )
        assert bins, f"no model weights found in {ckpt_dir}"
        for b in bins:
            sd.update(load_torch_file(b))
    return {k: np.asarray(v) for k, v in sd.items()}


def vla_config_from_checkpoint(ckpt_dir) -> VLAConfig:
    """Build a VLAConfig from the checkpoint's HF config.json."""
    from vla_adapter_tpu.core.config import Qwen2Config
    from vla_adapter_tpu.models.registry import get_vision_backbone

    cfg_json = json.loads((Path(ckpt_dir) / "config.json").read_text())
    if "vla_adapter_tpu" in cfg_json:
        # our own exports carry a lossless encoding (weights/export.py) —
        # covers geometries the vision-backbone registry doesn't name
        from vla_adapter_tpu.core.config import vla_config_from_dict

        return vla_config_from_dict(cfg_json["vla_adapter_tpu"])
    tc = cfg_json["text_config"]
    llm = Qwen2Config(
        vocab_size=tc["vocab_size"],
        hidden_size=tc["hidden_size"],
        num_layers=tc["num_hidden_layers"],
        num_heads=tc["num_attention_heads"],
        num_kv_heads=tc["num_key_value_heads"],
        intermediate_size=tc["intermediate_size"],
        rms_norm_eps=tc["rms_norm_eps"],
        rope_theta=tc["rope_theta"],
        head_dim=tc.get("head_dim",
                        tc["hidden_size"] // tc["num_attention_heads"]),
        tie_word_embeddings=tc.get("tie_word_embeddings", True),
    )
    vision = get_vision_backbone(cfg_json["vision_backbone_id"])
    return VLAConfig(vision=vision, llm=llm,
                     n_action_bins=cfg_json.get("n_action_bins", 256))


def load_vla_params(ckpt_dir, cfg: VLAConfig) -> Dict[str, Any]:
    """Full param tree (backbone + heads) from a reference checkpoint dir."""
    ckpt_dir = Path(ckpt_dir)
    sd = load_hf_backbone_state_dict(ckpt_dir)
    params = vla_params_from_hf(sd, cfg)

    head_file = _find_one(ckpt_dir, "action_head--*checkpoint.pt")
    assert head_file is not None, f"no action head checkpoint in {ckpt_dir}"
    params["action_head"] = action_head_params_from_torch(
        load_torch_file(head_file), cfg.head.num_blocks,
        cfg.head.use_pro_version,
    )
    pp_file = _find_one(ckpt_dir, "proprio_projector--*checkpoint.pt")
    if pp_file is not None:
        params["proprio_projector"] = mlp_projector_params_from_torch(
            load_torch_file(pp_file)
        )
    return params


def load_norm_stats(ckpt_dir) -> Dict:
    """dataset_statistics.json, falling back to config.json norm_stats
    (reference openvla_utils.py:371-396)."""
    ckpt_dir = Path(ckpt_dir)
    ds = ckpt_dir / "dataset_statistics.json"
    if ds.exists():
        return json.loads(ds.read_text())
    cfg = json.loads((ckpt_dir / "config.json").read_text())
    assert "norm_stats" in cfg, "no normalization statistics found"
    return cfg["norm_stats"]


def resolve_checkpoint(path_or_hub_id: str, allow_download: bool = False,
                       cache_dir: Optional[str] = None) -> Path:
    """Local dir passthrough, or an HF-hub snapshot fetch (the reference's
    model_is_on_hf_hub + hf_hub_download path, openvla_utils.py:272-368 and
    models/load.py:52,131), gated offline-safe.

    Downloads only when `allow_download=True` or VLA_ALLOW_DOWNLOAD=1 — this
    environment has no egress (see PARITY.md), and an accidental hub hit
    should fail loudly with instructions rather than hang."""
    import os

    p = Path(path_or_hub_id)
    if p.is_dir():
        return p
    allow = allow_download or os.environ.get("VLA_ALLOW_DOWNLOAD") == "1"
    if not allow:
        raise FileNotFoundError(
            f"{path_or_hub_id!r} is not a local checkpoint dir. If it is an "
            f"HF hub id, pass allow_download=True (or set "
            f"VLA_ALLOW_DOWNLOAD=1) in an environment with network egress."
        )
    from huggingface_hub import snapshot_download

    return Path(snapshot_download(repo_id=path_or_hub_id, cache_dir=cache_dir))


def load_vla(ckpt_dir, cfg: Optional[VLAConfig] = None, rt=None,
             center_crop: bool = True, allow_download: bool = False):
    """Checkpoint dir -> infer.Predictor (the reference's get_vla +
    get_action_head + get_proprio_projector + norm-stats load in one)."""
    import jax.numpy as jnp

    from vla_adapter_tpu.data.tokenization import load_qwen_tokenizer
    from vla_adapter_tpu.infer.predict import Predictor
    from vla_adapter_tpu.models.layers import Runtime

    ckpt_dir = resolve_checkpoint(str(ckpt_dir), allow_download=allow_download)
    cfg = cfg or vla_config_from_checkpoint(ckpt_dir)
    rt = rt or Runtime(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    params = load_vla_params(ckpt_dir, cfg)
    tok = load_qwen_tokenizer(str(ckpt_dir))
    return Predictor(
        cfg=cfg,
        params=params,
        tokenize=lambda t: tok(t, add_special_tokens=True).input_ids,
        norm_stats=load_norm_stats(ckpt_dir),
        rt=rt,
        center_crop=center_crop,
    )
