"""Prompt builders.

Chat-format builders for each LLM family (reference:
prismatic/models/backbones/llm/prompting/). Only the Qwen builder is on the
VLA-Adapter hot path (RLDSBatchTransform, datasets.py:54-89); the pure
builder covers the legacy OpenVLA "In:/Out:" format.
"""

from __future__ import annotations

from typing import Optional

QWEN_SYSTEM_PROMPT = (
    "You are Qwen, created by Alibaba Cloud. You are a helpful assistant."
)


class PromptBuilder:
    """Alternating human/gpt turn accumulator."""

    def __init__(self, model_family: str, system_prompt: Optional[str] = None):
        self.model_family = model_family
        self.system_prompt = system_prompt
        self.prompt = ""
        self.turn_count = 0

    def add_turn(self, role: str, message: str) -> str:
        raise NotImplementedError

    def get_prompt(self) -> str:
        raise NotImplementedError


class QwenPromptBuilder(PromptBuilder):
    """ChatML-style (reference qwen_prompter.py): system + user turns are
    wrapped in <|im_start|>role\\n...<|im_end|>\\n; an empty assistant reply
    becomes a single space; a trailing assistant turn swaps its final
    newline for <|endoftext|>."""

    IM_START = "<|im_start|>"
    IM_END = "<|im_end|>"
    EOS = "<|endoftext|>"

    def __init__(self, model_family: str = "openvla",
                 system_prompt: Optional[str] = None):
        super().__init__(model_family, system_prompt or QWEN_SYSTEM_PROMPT)
        self.system_prompt = self.system_prompt.strip()

    def add_turn(self, role: str, message: str) -> str:
        expected = "human" if self.turn_count % 2 == 0 else "gpt"
        assert role == expected, (role, expected)
        message = message.replace("<image>", "").strip()

        if self.turn_count == 0 and self.system_prompt:
            self.prompt += (
                f"{self.IM_START}system\n{self.system_prompt}{self.IM_END}\n"
            )

        if role == "human":
            wrapped = (
                f"{self.IM_START}user\n{message}{self.IM_END}\n"
                f"{self.IM_START}assistant\n"
            )
        else:
            wrapped = f"{message if message else ' '}{self.IM_END}\n"
        self.prompt += wrapped
        self.turn_count += 1
        return wrapped

    def get_prompt(self) -> str:
        if self.turn_count % 2 == 0:
            # ended on a gpt turn: newline -> EOS
            assert self.prompt.endswith("\n"), self.prompt
            return self.prompt[:-1] + self.EOS
        return self.prompt


class PurePromptBuilder(PromptBuilder):
    """Legacy OpenVLA format (reference base_prompter.py:28-74):
    'In: {q}\\nOut: ' with '</s>' closing each gpt turn."""

    BOS, EOS = "<s>", "</s>"

    def add_turn(self, role: str, message: str) -> str:
        expected = "human" if self.turn_count % 2 == 0 else "gpt"
        assert role == expected, (role, expected)
        message = message.replace("<image>", "").strip()
        if role == "human":
            wrapped = f"In: {message}\nOut: "
        else:
            wrapped = f"{message}{self.EOS}"
        self.prompt += wrapped
        self.turn_count += 1
        return wrapped

    def get_prompt(self) -> str:
        return self.prompt.rstrip()


LLAVA_SYSTEM_PROMPT = (
    "You are a helpful language and vision assistant. "
    "You are able to understand the visual content that the user provides, "
    "and assist the user with a variety of tasks using natural language."
)
VICUNA_SYSTEM_PROMPT = (
    "A chat between a curious user and an artificial intelligence assistant. "
    "The assistant gives helpful, detailed, and polite answers to the user's "
    "questions."
)


class _InstPromptBuilder(PromptBuilder):
    """Shared [INST]-family mechanics: human '[INST] q [/INST] ', gpt
    'a</s>' (empty -> single space), <s> stripped for the tokenizer,
    trailing whitespace stripped."""

    def _wrap_first_human(self, message: str) -> str:
        return f"[INST] {message} [/INST] "

    def _wrap_human(self, message: str) -> str:
        return f"[INST] {message} [/INST] "

    def _wrap_gpt(self, message: str) -> str:
        return f"{message if message else ' '}</s>"

    def add_turn(self, role: str, message: str) -> str:
        expected = "human" if self.turn_count % 2 == 0 else "gpt"
        assert role == expected, (role, expected)
        message = message.replace("<image>", "").strip()
        if self.turn_count == 0:
            wrapped = self._wrap_first_human(message)
        elif role == "human":
            wrapped = self._wrap_human(message)
        else:
            wrapped = self._wrap_gpt(message)
        self.prompt += wrapped
        self.turn_count += 1
        return wrapped

    def get_prompt(self) -> str:
        # (no BOS stripping: unlike the reference builder, the prompt is
        # accumulated WITHOUT a '<s>' prefix in the first place — the
        # tokenizer adds special tokens; golden tests pin parity with the
        # reference prompters' stripped output)
        return self.prompt.rstrip()


class Llama2ChatPromptBuilder(_InstPromptBuilder):
    """LLaMA-2-chat (reference llama2_chat_prompter.py — including its
    asymmetric '<<SYS>\\n...\\n<</SYS>>\\n\\n' system wrapper, preserved
    verbatim for checkpoint-prompt parity)."""

    def __init__(self, model_family: str = "openvla",
                 system_prompt: Optional[str] = None):
        super().__init__(model_family, system_prompt)
        sys = LLAVA_SYSTEM_PROMPT if system_prompt is None else system_prompt
        self.system_prompt = f"<<SYS>\n{sys.strip()}\n<</SYS>>\n\n"

    def _wrap_first_human(self, message: str) -> str:
        return self._wrap_human(self.system_prompt + message)


class VicunaPromptBuilder(_InstPromptBuilder):
    """Vicuna v1.5 (reference vicuna_v15_prompter.py): system prefix +
    'USER: q ASSISTANT: ' turns."""

    def __init__(self, model_family: str = "openvla",
                 system_prompt: Optional[str] = None):
        super().__init__(model_family, system_prompt)
        self.system_prompt = (
            VICUNA_SYSTEM_PROMPT if system_prompt is None else system_prompt
        ).strip() + " "

    def _wrap_human(self, message: str) -> str:
        return f"USER: {message} ASSISTANT: "

    def _wrap_first_human(self, message: str) -> str:
        return self.system_prompt + self._wrap_human(message)


class MistralInstructPromptBuilder(_InstPromptBuilder):
    """Mistral-Instruct (reference mistral_instruct_prompter.py): no system
    prompt, plain [INST] wrapping."""


class PhiPromptBuilder(PromptBuilder):
    """Phi-2 Input/Output format (reference phi_prompter.py): explicit
    <|endoftext|> BOS on the first turn, 'Input:/Output:' wrapping, EOS
    after each gpt turn."""

    BOS = EOS = "<|endoftext|>"

    def add_turn(self, role: str, message: str) -> str:
        expected = "human" if self.turn_count % 2 == 0 else "gpt"
        assert role == expected, (role, expected)
        message = message.replace("<image>", "").strip()
        if self.turn_count == 0:
            wrapped = f"{self.BOS}Input: {message}\nOutput: "
        elif role == "human":
            wrapped = f"Input: {message}\nOutput: "
        else:
            wrapped = f"{message if message else ' '}\n{self.EOS}"
        self.prompt += wrapped
        self.turn_count += 1
        return wrapped

    def get_prompt(self) -> str:
        return self.prompt.rstrip()


PROMPT_BUILDERS = {
    "qwen": QwenPromptBuilder,
    "pure": PurePromptBuilder,
    "llama2-chat": Llama2ChatPromptBuilder,
    "vicuna": VicunaPromptBuilder,
    "mistral-instruct": MistralInstructPromptBuilder,
    "phi": PhiPromptBuilder,
}
