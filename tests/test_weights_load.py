"""Checkpoint-directory loading (weights/load.py) on a synthetic export."""

import json

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

from tests.test_vla_model import CFG, torch_world  # noqa: F401
from tests.test_action_head import ref_modules  # noqa: F401
from vla_adapter_tpu.weights.load import (
    _find_one,
    load_hf_backbone_state_dict,
    load_norm_stats,
    load_torch_file,
    load_vla_params,
)


def test_load_vla_params_from_dir(tmp_path, torch_world):  # noqa: F811
    tw = torch_world
    # write the backbone as safetensors shards + heads as torch .pt files,
    # exactly the released layout
    from safetensors.torch import save_file

    sd = {k: (v if isinstance(v, torch.Tensor) else torch.tensor(v))
          for k, v in tw["sd"].items()
          if not k.endswith("lm_head.weight")}  # tied — safetensors rejects shares
    sd = {k: v.contiguous() for k, v in sd.items()}
    save_file(sd, tmp_path / "model.safetensors")
    torch.save({"module." + k: v for k, v in tw["head"].state_dict().items()},
               tmp_path / "action_head--1000_checkpoint.pt")
    torch.save(tw["pproj"].state_dict(),
               tmp_path / "proprio_projector--1000_checkpoint.pt")
    (tmp_path / "dataset_statistics.json").write_text(
        json.dumps({"libero_spatial_no_noops": {"action": {"q01": [0] * 7}}})
    )

    import dataclasses

    cfg = dataclasses.replace(
        CFG, head=dataclasses.replace(CFG.head, num_blocks=4)
    )
    # head converter expects the reference "model." prefix; our fixture
    # saved a bare MLPResNet, so check prefix handling via load_torch_file
    sd_head = load_torch_file(tmp_path / "action_head--1000_checkpoint.pt")
    assert not any(k.startswith("module.") for k in sd_head)

    from vla_adapter_tpu.weights.convert import (
        action_head_params_from_torch,
        vla_params_from_hf,
    )

    backbone_sd = load_hf_backbone_state_dict(tmp_path)
    tree = vla_params_from_hf(backbone_sd, cfg)
    tree["action_head"] = action_head_params_from_torch(
        sd_head, 4, True, prefix=""
    )
    # structure sanity: same leaves as a fresh init of the backbone subtree
    assert "language_model" in tree and "vision_backbone" in tree
    assert tree["action_queries"].shape == (16, 64)

    stats = load_norm_stats(tmp_path)
    assert "libero_spatial_no_noops" in stats
    assert _find_one(tmp_path, "action_head--*checkpoint.pt") is not None
    with pytest.raises(AssertionError):
        torch.save({}, tmp_path / "action_head--2000_checkpoint.pt")
        _find_one(tmp_path, "action_head--*checkpoint.pt")


def test_resolve_checkpoint_offline_safe(tmp_path):
    """Hub ids fail loudly offline; local dirs pass through; the download
    path is opt-in (reference openvla_utils.py:272-368 equivalent)."""
    import pytest

    from vla_adapter_tpu.weights.load import resolve_checkpoint

    assert resolve_checkpoint(str(tmp_path)) == tmp_path
    with pytest.raises(FileNotFoundError, match="allow_download"):
        resolve_checkpoint("VLA-Adapter/LIBERO-Object-Pro")
