"""Configuration tree for the TPU-native VLA framework.

One explicit, immutable dataclass tree replaces the reference's three
overlapping config systems (draccus CLI dataclasses, HF PretrainedConfig,
and import-time argv sniffing — SURVEY.md section 5.6). All configs are
frozen and hashable so they can be closed over by ``jax.jit`` or passed as
static arguments.

Canonical model geometry (reference: pretrained_models/configs/config.json):
  vision  : fused DINOv2 ViT-L/14-reg4 (1024) + SigLIP so400m/14 (1152) @224px
  project : 2176 -> 8704 -> 896 -> 896 fused GELU MLP
  language: Qwen2.5-0.5B — 24 layers, hidden 896, 14 heads / 2 KV heads,
            head_dim 64, ffn 4864, RoPE theta 1e6, tied embeddings,
            vocab 151936, RMSNorm eps 1e-6
  head    : 24-block bridge-attention MLPResNet, hidden 896, L1 regression
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

from vla_adapter_tpu.core.constants import PlatformConstants, get_platform


# ---------------------------------------------------------------------------
# Vision towers
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ViTConfig:
    """A generic pre-norm ViT, parameterized to cover the timm variants the
    reference instantiates (reference: modeling_prismatic.py:120-144).

    ``feature_layer`` selects which block's output is tapped as the feature
    map; the reference uses ``len(blocks) - 2`` ("second-to-last"), with no
    final norm applied and prefix (cls/register) tokens stripped.
    """

    name: str
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_dim: int = 4096
    use_cls_token: bool = True
    num_register_tokens: int = 0
    # timm `no_embed_class`: positional embeddings are added to patch tokens
    # only; cls/register tokens get none.
    pos_embed_patches_only: bool = False
    # timm `pre_norm` (CLIP towers): a LayerNorm (`norm_pre`) applied to the
    # full token sequence after the positional embedding, before block 0.
    pre_norm: bool = False
    layer_scale_init: Optional[float] = None  # None -> no LayerScale
    # "gelu" (erf) or "gelu_tanh"
    mlp_activation: str = "gelu"
    layernorm_eps: float = 1e-6
    qkv_bias: bool = True
    # Index of the block whose output is the feature tap (None -> last block,
    # after final norm).
    feature_layer: Optional[int] = None
    # When set, every block applies FiLM modulation x*(1+gamma)+beta between
    # its attention and MLP sublayers, with gamma/beta projected from a
    # language embedding of this dimension (reference film_vit_wrapper.py).
    film_llm_dim: Optional[int] = None

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def num_prefix_tokens(self) -> int:
        return (1 if self.use_cls_token else 0) + self.num_register_tokens

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def resolved_feature_layer(self) -> int:
        return self.num_layers - 2 if self.feature_layer is None else self.feature_layer


# timm `vit_large_patch14_reg4_dinov2.lvd142m` @224px
DINOV2_VIT_L_224 = ViTConfig(
    name="dinov2-vit-l-14-reg4-224",
    hidden_size=1024,
    num_layers=24,
    num_heads=16,
    mlp_dim=4096,
    use_cls_token=True,
    num_register_tokens=4,
    pos_embed_patches_only=True,
    layer_scale_init=1e-5,
    mlp_activation="gelu",
)

# timm `vit_so400m_patch14_siglip_224`
SIGLIP_SO400M_224 = ViTConfig(
    name="siglip-so400m-14-224",
    hidden_size=1152,
    num_layers=27,
    num_heads=16,
    mlp_dim=4304,
    use_cls_token=False,
    num_register_tokens=0,
    pos_embed_patches_only=False,
    layer_scale_init=None,
    mlp_activation="gelu_tanh",
)


@dataclass(frozen=True)
class FusedVisionConfig:
    """Dual-tower fused backbone (reference: modeling_prismatic.py:71-237).

    Channel layout per image is [3 primary | 3 fused]; features are
    concatenated on the hidden dim (1024 + 1152 = 2176) per image and on the
    sequence dim across images.
    """

    primary: ViTConfig = DINOV2_VIT_L_224
    fused: Optional[ViTConfig] = SIGLIP_SO400M_224
    num_images: int = 2  # third-person + wrist
    use_film: bool = False

    @property
    def embed_dim(self) -> int:
        return self.primary.hidden_size + (self.fused.hidden_size if self.fused else 0)

    @property
    def num_patches_per_image(self) -> int:
        return self.primary.num_patches

    @property
    def num_patches(self) -> int:
        return self.num_patches_per_image * self.num_images

    @property
    def channels_per_image(self) -> int:
        return 6 if self.fused is not None else 3


# ---------------------------------------------------------------------------
# Language model
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Qwen2Config:
    """Qwen2-family decoder config (reference config.json `text_config`)."""

    vocab_size: int = 151936
    hidden_size: int = 896
    num_layers: int = 24
    num_heads: int = 14
    num_kv_heads: int = 2
    intermediate_size: int = 4864
    head_dim: int = 64
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1e6
    tie_word_embeddings: bool = True
    attention_bias: bool = True  # Qwen2: bias on q/k/v, none on o
    max_position_embeddings: int = 32768

    @property
    def kv_groups(self) -> int:
        return self.num_heads // self.num_kv_heads


QWEN25_0_5B = Qwen2Config()


@dataclass(frozen=True)
class PhiConfig:
    """Phi-2 decoder config (reference: backbones/llm/phi.py `phi-2-3b` ->
    microsoft/phi-2). Architecturally distinct from the Qwen2/LLaMA family:
    LayerNorm (with bias) instead of RMSNorm, *parallel* attention+MLP
    sharing one pre-LN, partial rotary embeddings (first
    ``rotary_dim = head_dim * partial_rotary_factor`` dims only), MHA (no
    GQA), untied lm_head with bias."""

    vocab_size: int = 51200
    hidden_size: int = 2560
    num_layers: int = 32
    num_heads: int = 32
    intermediate_size: int = 10240
    head_dim: int = 80
    partial_rotary_factor: float = 0.4
    rope_theta: float = 1e4
    layer_norm_eps: float = 1e-5
    max_position_embeddings: int = 2048

    @property
    def num_kv_heads(self) -> int:  # MHA — interface parity with Qwen2Config
        return self.num_heads

    @property
    def rotary_dim(self) -> int:
        return int(self.head_dim * self.partial_rotary_factor)


# ---------------------------------------------------------------------------
# Adapter head
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ActionHeadConfig:
    """Bridge-attention MLPResNet head (reference: action_heads.py:21-410)."""

    num_blocks: int = 24
    hidden_dim: int = 896
    num_attn_heads: int = 8
    use_pro_version: bool = True
    # Std of the fresh Gaussian noise injected into the zero chunk latents at
    # every training step (reference: action_heads.py:14-17,69-72).
    train_noise_std: float = 0.02
    rope_base: float = 10000.0  # Pro blocks only


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class VLAConfig:
    """Top-level model config for OpenVLA-style action prediction."""

    platform: str = "libero"
    # Overrides the registry lookup (tests / custom robots).
    custom_constants: Optional[PlatformConstants] = None
    vision: FusedVisionConfig = FusedVisionConfig()
    llm: Qwen2Config = QWEN25_0_5B
    head: ActionHeadConfig = ActionHeadConfig()
    use_proprio: bool = True
    # Whether the LLM attention over the full multimodal sequence is
    # bidirectional (the OFT-fork behavior the released checkpoints were
    # trained with) or causal (base-VLM mode).
    bidirectional_attention: bool = True
    n_action_bins: int = 256
    # Fixed text-token budget predict/train sequences are padded to; includes
    # prompt + action-query block (+ stop at inference). ~25 prompt tokens +
    # 64 queries + 1 stop in practice; 96/128 leave headroom.
    max_text_tokens: int = 128

    @property
    def constants(self) -> PlatformConstants:
        if self.custom_constants is not None:
            return self.custom_constants
        return get_platform(self.platform)

    @property
    def num_patches(self) -> int:
        return self.vision.num_patches

    @property
    def num_action_query_tokens(self) -> int:
        return self.constants.num_action_query_tokens


def vla_config_to_dict(cfg: VLAConfig) -> dict:
    """Lossless JSON-able encoding (checkpoint config.json round-trip)."""
    d = dataclasses.asdict(cfg)
    if d.get("custom_constants"):
        d["custom_constants"]["normalization_type"] = (
            cfg.custom_constants.normalization_type.value
        )
    return d


def vla_config_from_dict(d: dict) -> VLAConfig:
    """Inverse of :func:`vla_config_to_dict`."""
    from vla_adapter_tpu.core.constants import NormalizationType

    d = dict(d)
    cc = d.get("custom_constants")
    if cc:
        cc = dict(cc)
        cc["normalization_type"] = NormalizationType(cc["normalization_type"])
        d["custom_constants"] = PlatformConstants(**cc)
    v = dict(d["vision"])
    v["primary"] = ViTConfig(**v["primary"])
    if v.get("fused"):
        v["fused"] = ViTConfig(**v["fused"])
    d["vision"] = FusedVisionConfig(**v)
    # discriminate the LLM family by its signature field
    llm_cls = PhiConfig if "partial_rotary_factor" in d["llm"] else Qwen2Config
    d["llm"] = llm_cls(**{
        k: tuple(x) if isinstance(x, list) else x for k, x in d["llm"].items()
    })
    d["head"] = ActionHeadConfig(**d["head"])
    return VLAConfig(**d)


# ---------------------------------------------------------------------------
# LoRA / training
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LoRAConfig:
    """LoRA finetuning config (reference: finetune.py:832-844 — r=64,
    alpha=2r, dropout 0, target 'all-linear', Gaussian init)."""

    enabled: bool = True
    rank: int = 64
    alpha: float = 128.0
    dropout: float = 0.0
    # Apply to every Dense in the VLM (vision towers + projector + LLM);
    # the head/proprio projector are trained fully, not via LoRA.
    target: str = "all-linear"

    @property
    def scale(self) -> float:
        return self.alpha / self.rank


@dataclass(frozen=True)
class OptimizerConfig:
    """AdamW + 10% linear warmup + MultiStep decay (reference:
    finetune.py:903-921,1060-1065)."""

    learning_rate: float = 5e-4
    weight_decay: float = 0.0
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    warmup_fraction: float = 0.1
    # Step at which LR decays by `decay_factor` (MultiStepLR milestone).
    num_steps_before_decay: int = 100_000
    decay_factor: float = 0.1
    grad_clip_norm: Optional[float] = None
    max_steps: int = 200_005
    # Storage dtype for the Adam moments ("bfloat16" halves the mu/nu HBM
    # traffic of the 24-block action head — train/optim.py
    # scale_by_adam_stored; update math stays f32). None = optax.adamw
    # unchanged. Numerics gated by the bf16-moments loss-curve test.
    moments_dtype: Optional[str] = None


@dataclass(frozen=True)
class TrainConfig:
    model: VLAConfig = VLAConfig()
    lora: LoRAConfig = LoRAConfig()
    optim: OptimizerConfig = OptimizerConfig()
    # 'l1' = continuous regression via the bridge-attention head (the
    # VLA-Adapter recipe); 'token' = discrete next-token CE (legacy OpenVLA).
    objective: str = "l1"
    batch_size: int = 16          # global batch
    grad_accumulation_steps: int = 1
    seed: int = 42
    # Mesh axis sizes; -1 means "all remaining devices".
    data_axis: int = -1
    fsdp_axis: int = 1
    tensor_axis: int = 1
    remat_llm: bool = True        # jax.checkpoint each decoder layer
    # "nothing" (recompute everything in backward, min memory), "dots" /
    # "dots_no_batch" (save matmul outputs), or "mlp_saved" (save only the
    # checkpoint_name-tagged wide MLP projections). Measured on v5e @ bs8:
    # "dots*" OOM — our Dense folds the batch into M, so *every* dot
    # qualifies and it degenerates to save-everything; "mlp_saved" blows up
    # XLA compile time past practicality (>18 min vs ~3); "nothing" is the
    # measured default (r3 sweep, tools/probes/sweep_remat.py).
    remat_policy: str = "nothing"
    # Per-component policy overrides, ((component, policy), ...), e.g.
    # (("vit", "nothing"),) keeps full recompute on the ViT towers while
    # remat_policy="attn_only" saves the LLM's wide-MLP activations. On the
    # 16 GB v5e every such split either OOMs or is slower than the default
    # (measured, tools/probes/sweep_remat.py rows 18-28 / BREAKDOWN.md);
    # on larger-HBM parts (v5p) the split policy is the intended use.
    remat_policy_overrides: Tuple[Tuple[str, str], ...] = ()
    # Which stacks rematerialize when remat_llm=True. r3 sweep @ bs8/accum2:
    # ("vit","llm") 0.364 s/step beats full remat 0.369 (the head's
    # activations are small enough to save); ("llm","head") alone OOMs.
    remat_components: Tuple[str, ...] = ("vit", "llm")
    # Store frozen (non-trained) params in bf16 — halves the frozen base's
    # HBM with no optimizer impact (compute is bf16 anyway).
    frozen_bf16: bool = True
    # Run the FROZEN base's matmuls in w8a8 int8 during training (forward
    # AND dx-backward via an STE custom-VJP; models/layers.w8a8_matmul_ste).
    # The base is frozen under LoRA, so dW is dead code and the int8 MXU's
    # 2x path applies to ~all base FLOPs; the trainable head/proprio/LoRA
    # stay float. Numerics gate: the DummyDataset loss curve under the
    # quantized base tracks float within 15% (tests/test_train_step.py
    # test_base_int8_loss_curve_matches_float, worst-case tiny geometry).
    # Measured on v5e: 0.3246 vs 0.3670 s/step @ bs8 accum2 (+13%
    # throughput; BREAKDOWN.md round-4 train table). Default False at the
    # raw-config level (full-train stages MUST keep the float base — dW
    # needs real weights); the LoRA experiment recipes enable it
    # (core/experiments.py to_train_config).
    base_int8: bool = False
    # Storage dtype of the grad-accumulation scan carry ("bfloat16" halves
    # the carry's read+write per microbatch — train/step.py; grads are
    # restored to f32 before the optimizer). With accum=2 this is a single
    # bf16 rounding of g1 before the g1+g2 add. None = f32 carry.
    accum_dtype: Optional[str] = None
    save_freq: int = 10_000
    save_latest_checkpoint_only: bool = True
    run_root_dir: str = "runs"
    run_id: Optional[str] = None
    val_freq: int = 10_000
    log_freq: int = 10

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)
