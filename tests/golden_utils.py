"""Shared torch goldens implementing timm 0.9.x ViT semantics."""

import math

import torch
import torch.nn.functional as F

from vla_adapter_tpu.core.config import ViTConfig


def make_timm_state_dict(cfg: ViTConfig, seed: int):
    """Random weights in timm naming/layout."""
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def rand(*shape, scale=0.02):
        return torch.randn(*shape, generator=g) * scale

    E, M = cfg.hidden_size, cfg.mlp_dim
    sd["patch_embed.proj.weight"] = rand(E, 3, cfg.patch_size, cfg.patch_size, scale=0.1)
    sd["patch_embed.proj.bias"] = rand(E)
    n_pos = cfg.num_patches if cfg.pos_embed_patches_only else (
        cfg.num_patches + cfg.num_prefix_tokens
    )
    sd["pos_embed"] = rand(1, n_pos, E)
    if cfg.use_cls_token:
        sd["cls_token"] = rand(1, 1, E)
    if cfg.num_register_tokens:
        sd["reg_token"] = rand(1, cfg.num_register_tokens, E)
    for i in range(cfg.num_layers):
        p = f"blocks.{i}."
        sd[p + "norm1.weight"] = 1 + rand(E)
        sd[p + "norm1.bias"] = rand(E)
        sd[p + "attn.qkv.weight"] = rand(3 * E, E, scale=0.1)
        sd[p + "attn.qkv.bias"] = rand(3 * E)
        sd[p + "attn.proj.weight"] = rand(E, E, scale=0.1)
        sd[p + "attn.proj.bias"] = rand(E)
        sd[p + "norm2.weight"] = 1 + rand(E)
        sd[p + "norm2.bias"] = rand(E)
        sd[p + "mlp.fc1.weight"] = rand(M, E, scale=0.1)
        sd[p + "mlp.fc1.bias"] = rand(M)
        sd[p + "mlp.fc2.weight"] = rand(E, M, scale=0.1)
        sd[p + "mlp.fc2.bias"] = rand(E)
        if cfg.layer_scale_init is not None:
            sd[p + "ls1.gamma"] = torch.full((E,), cfg.layer_scale_init) + rand(E, scale=1e-6)
            sd[p + "ls2.gamma"] = torch.full((E,), cfg.layer_scale_init) + rand(E, scale=1e-6)
    if cfg.pre_norm:
        sd["norm_pre.weight"] = 1 + rand(E)
        sd["norm_pre.bias"] = rand(E)
    sd["norm.weight"] = torch.ones(E)
    sd["norm.bias"] = torch.zeros(E)
    return sd


def timm_forward(sd, cfg: ViTConfig, images_nchw: torch.Tensor) -> torch.Tensor:
    """timm 0.9.x-semantics forward to the feature tap."""
    B = images_nchw.shape[0]
    E, H = cfg.hidden_size, cfg.num_heads
    x = F.conv2d(
        images_nchw, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"],
        stride=cfg.patch_size,
    )
    x = x.flatten(2).transpose(1, 2)  # (B, N, E)

    prefix = []
    if cfg.use_cls_token:
        prefix.append(sd["cls_token"].expand(B, -1, -1))
    if cfg.num_register_tokens:
        prefix.append(sd["reg_token"].expand(B, -1, -1))
    if cfg.pos_embed_patches_only:
        x = x + sd["pos_embed"]
        if prefix:
            x = torch.cat(prefix + [x], dim=1)
    else:
        if prefix:
            x = torch.cat(prefix + [x], dim=1)
        x = x + sd["pos_embed"]

    if cfg.pre_norm:
        x = F.layer_norm(x, (E,), sd["norm_pre.weight"], sd["norm_pre.bias"],
                         cfg.layernorm_eps)

    approx = "tanh" if cfg.mlp_activation == "gelu_tanh" else "none"
    for i in range(cfg.resolved_feature_layer + 1):
        p = f"blocks.{i}."
        h = F.layer_norm(x, (E,), sd[p + "norm1.weight"], sd[p + "norm1.bias"], cfg.layernorm_eps)
        qkv = F.linear(h, sd[p + "attn.qkv.weight"], sd[p + "attn.qkv.bias"])
        q, k, v = qkv.chunk(3, dim=-1)
        d = E // H

        def heads(t):
            return t.view(B, -1, H, d).transpose(1, 2)

        q, k, v = heads(q), heads(k), heads(v)
        attn = torch.softmax(q @ k.transpose(-2, -1) / math.sqrt(d), dim=-1)
        h = (attn @ v).transpose(1, 2).reshape(B, -1, E)
        h = F.linear(h, sd[p + "attn.proj.weight"], sd[p + "attn.proj.bias"])
        if cfg.layer_scale_init is not None:
            h = h * sd[p + "ls1.gamma"]
        x = x + h
        h = F.layer_norm(x, (E,), sd[p + "norm2.weight"], sd[p + "norm2.bias"], cfg.layernorm_eps)
        h = F.linear(h, sd[p + "mlp.fc1.weight"], sd[p + "mlp.fc1.bias"])
        if cfg.mlp_activation == "quick_gelu":
            h = h * torch.sigmoid(1.702 * h)  # timm QuickGELU (CLIP .openai)
        else:
            h = F.gelu(h, approximate=approx)
        h = F.linear(h, sd[p + "mlp.fc2.weight"], sd[p + "mlp.fc2.bias"])
        if cfg.layer_scale_init is not None:
            h = h * sd[p + "ls2.gamma"]
        x = x + h

    return x[:, cfg.num_prefix_tokens:]


