"""vla_adapter_tpu — a TPU-native Vision-Language-Action framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of VLA-Adapter
(liruiluo/VLA-Adapter): a 0.5B-scale VLA robot policy that maps
(third-person RGB, wrist RGB, language instruction, proprio state) to a
chunk of continuous actions in a single bidirectional forward pass.

Layers (see SURVEY.md section 7):
  core/      config system, platform constants, mesh & dtype policy
  ops/       Pallas TPU kernels + XLA fallbacks (attention, RoPE, masks)
  models/    ViT towers, Qwen2 decoder, projectors, bridge-attention head, VLA
  weights/   torch/HF/timm checkpoint ingestion (rename maps)
  data/      host-side pipeline: prompts, action tokenizer, RLDS, normalization
  parallel/  device mesh, sharding rules (dp/fsdp/tp axes)
  train/     pjit train step, LoRA, optimizer/schedule, checkpoints, metrics
  infer/     jitted predict_action, serving
  eval/      LIBERO/CALVIN harnesses, open-loop controller
"""

__version__ = "0.1.0"
