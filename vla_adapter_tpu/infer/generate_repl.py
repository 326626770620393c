"""Interactive VLM generation REPL (reference scripts/generate.py).

Loads a checkpoint (or random-init for plumbing checks) and generates
completions for typed prompts with the causal PrismaticVLM path.

    python -m vla_adapter_tpu.infer.generate_repl --ckpt_dir <dir> \
        [--image path.jpg] [--max_new_tokens 64]
"""

from __future__ import annotations

import dataclasses
import numpy as np

import jax.numpy as jnp

from vla_adapter_tpu.core.cli import parse_config
from vla_adapter_tpu.utils.overwatch import initialize_overwatch

log = initialize_overwatch(__name__)


@dataclasses.dataclass(frozen=True)
class GenerateConfig:
    ckpt_dir: str = ""
    image: str = ""
    max_new_tokens: int = 64
    temperature: float = 0.0
    prompt_family: str = "qwen"


def main(argv=None) -> None:
    import jax

    from vla_adapter_tpu.data.prompting import PROMPT_BUILDERS
    from vla_adapter_tpu.data.tokenization import load_qwen_tokenizer
    from vla_adapter_tpu.models.generate import greedy_generate_cached
    from vla_adapter_tpu.models.layers import Runtime
    from vla_adapter_tpu.models.qwen2 import Qwen2Model
    from vla_adapter_tpu.weights.load import (
        load_hf_backbone_state_dict,
        vla_config_from_checkpoint,
    )
    from vla_adapter_tpu.weights.convert import qwen2_params_from_hf

    cfg = parse_config(GenerateConfig, argv)
    assert cfg.ckpt_dir, "--ckpt_dir is required"
    model_cfg = vla_config_from_checkpoint(cfg.ckpt_dir)
    tok = load_qwen_tokenizer(cfg.ckpt_dir)
    rt = Runtime(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    llm = Qwen2Model(model_cfg.llm, rt)
    sd = load_hf_backbone_state_dict(cfg.ckpt_dir)
    params = qwen2_params_from_hf(sd, model_cfg.llm,
                                  prefix="language_model.model.")
    log.info("loaded %s — language-only REPL (Ctrl-D to exit)", cfg.ckpt_dir)

    while True:
        try:
            text = input(">>> ")
        except EOFError:
            break
        builder = PROMPT_BUILDERS[cfg.prompt_family]("openvla")
        builder.add_turn("human", text)
        ids = tok(builder.get_prompt(), add_special_tokens=True).input_ids
        p = len(ids)
        buf = np.zeros((1, p + cfg.max_new_tokens), np.int32)
        buf[0, :p] = ids
        out = greedy_generate_cached(
            llm, params, jnp.asarray(buf), prompt_len=p,
            max_new_tokens=cfg.max_new_tokens,
            eos_token_id=tok.eos_token_id,
            temperature=cfg.temperature,
            rng=jax.random.key(0) if cfg.temperature > 0 else None,
        )
        completion = np.asarray(out)[0, p:]
        completion = completion[completion != 0]
        print(tok.decode(completion.tolist()))


if __name__ == "__main__":
    main()
