"""CLI config dataclasses parse cleanly for every entry point."""

import pytest

from vla_adapter_tpu.core.cli import parse_config


def test_all_cli_configs_parse():
    from vla_adapter_tpu.data.download import DownloadConfig
    from vla_adapter_tpu.eval.calvin_eval import CalvinCLIConfig
    from vla_adapter_tpu.eval.libero_eval import LiberoCLIConfig
    from vla_adapter_tpu.eval.parity_check import ParityConfig
    from vla_adapter_tpu.eval.regenerate_libero import RegenerateConfig
    from vla_adapter_tpu.eval.verify_smoke import VerifyConfig
    from vla_adapter_tpu.infer.generate_repl import GenerateConfig
    from vla_adapter_tpu.serve.deploy import DeployConfig
    from vla_adapter_tpu.train.finetune import FinetuneCLIConfig
    from vla_adapter_tpu.train.pretrain import PretrainConfig
    from vla_adapter_tpu.weights.merge import MergeConfig

    cases = [
        (FinetuneCLIConfig, ["--data.mixture", "calvin", "--train.batch_size", "4"]),
        (PretrainConfig, ["--stage", "finetune", "--batch_size", "2"]),
        (DeployConfig, ["--ckpt_dir", "/x", "--port", "9000"]),
        (LiberoCLIConfig, ["--ckpt_dir", "/x",
                           "--eval.task_suite_name", "libero_goal",
                           "--eval.num_trials_per_task", "5"]),
        (CalvinCLIConfig, ["--ckpt_dir", "/x", "--eval.num_sequences", "10"]),
        (VerifyConfig, ["--ckpt_dir", "/x", "--iters", "2"]),
        (ParityConfig, ["--mode", "record", "--ckpt_dir", "/x", "--obs", "/y"]),
        (MergeConfig, ["--ckpt_dir", "/x", "--out_dir", "/y",
                       "--lora_scale", "4.0"]),
        (GenerateConfig, ["--ckpt_dir", "/x", "--temperature", "0.7"]),
        (RegenerateConfig, ["--task_suite", "libero_object"]),
        (DownloadConfig, ["--mixture", "rtx", "--dry_run", "true"]),
    ]
    for cls, argv in cases:
        cfg = parse_config(cls, argv)
        assert cfg is not None
    # nested override sanity
    cfg = parse_config(LiberoCLIConfig, ["--eval.num_trials_per_task", "7"])
    assert cfg.eval.num_trials_per_task == 7
    # tuple-of-pairs fields use ':' within a pair, ',' between pairs
    cfg = parse_config(
        FinetuneCLIConfig,
        ["--train.remat_policy_overrides", "vit:nothing,head:nothing"])
    assert cfg.train.remat_policy_overrides == (
        ("vit", "nothing"), ("head", "nothing"))
    # the HBM-traffic train levers parse as nested Optional[str] flags
    cfg = parse_config(
        FinetuneCLIConfig,
        ["--train.optim.moments_dtype", "bfloat16",
         "--train.accum_dtype", "bfloat16"])
    assert cfg.train.optim.moments_dtype == "bfloat16"
    assert cfg.train.accum_dtype == "bfloat16"
    with pytest.raises(KeyError):
        parse_config(DeployConfig, ["--prot", "1"])
    # malformed pair elements fail AT PARSE TIME with a pointer to the
    # flag, not minutes later as an unpack error inside jit tracing
    for bad in ("vit", "vit:nothing:extra", "vit:nothing,head"):
        with pytest.raises(SystemExit, match="':'-separated"):
            parse_config(FinetuneCLIConfig,
                         ["--train.remat_policy_overrides", bad])


def test_experiment_recipe_seeds_cli_config():
    """--experiment seeds train+data from the registry (reference
    --vla.type, prismatic/conf/vla.py) and explicit flags still win."""
    from vla_adapter_tpu.core.experiments import VLA_EXPERIMENTS
    from vla_adapter_tpu.train.finetune import (
        FinetuneCLIConfig,
        config_from_experiment,
    )

    base = config_from_experiment("vla-adapter+libero-spatial")
    assert base.data.mixture == "libero_spatial_no_noops"
    assert base.train.batch_size == 64
    assert base.train.optim.max_steps == 100_000
    assert base.train.run_id == "vla-adapter+libero-spatial"
    assert base.train.lora.enabled
    # LoRA recipes adopt the int8 frozen base (BREAKDOWN round-4 table);
    # full-train recipes must NOT (their base weights receive gradients)
    assert base.train.base_int8
    full = config_from_experiment(
        "prism-qwen25-dinosiglip-224px+0_5b+mx-oxe-magic-soup")
    assert not full.train.lora.enabled and not full.train.base_int8
    # explicit flags override the recipe (the main() two-pass parse)
    cfg = parse_config(
        FinetuneCLIConfig,
        ["--experiment", "vla-adapter+libero-spatial",
         "--train.batch_size", "8", "--train.base_int8", "false"],
        base=base)
    assert cfg.train.batch_size == 8 and not cfg.train.base_int8
    assert cfg.data.mixture == "libero_spatial_no_noops"
    # every registered recipe materializes a coherent config
    for vla_id in VLA_EXPERIMENTS:
        c = config_from_experiment(vla_id)
        assert c.train.model.llm.hidden_size > 0
    with pytest.raises(KeyError, match="unknown experiment"):
        config_from_experiment("nope")
