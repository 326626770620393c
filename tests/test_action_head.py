"""Action-head parity vs the reference implementation.

The golden is the *actual reference module* imported at test time from
/root/reference (read-only) — no reference code lives in this repo; if the
reference checkout is absent these tests skip. Random torch weights flow
through weights/convert.py into our flax head, and outputs are compared in
fp32 on CPU.
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from vla_adapter_tpu.core.config import ActionHeadConfig
from vla_adapter_tpu.models.action_head import L1RegressionActionHead
from vla_adapter_tpu.models.layers import FP32_RUNTIME
from vla_adapter_tpu.models.projector import ProprioProjector
from vla_adapter_tpu.weights.convert import (
    action_head_params_from_torch,
    mlp_projector_params_from_torch,
    state_dict_to_numpy,
)

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref_modules():
    """Load the reference modules directly from file (their package
    __init__ pulls in deps absent here), with a stub constants module."""
    import importlib.util
    import pathlib
    import types

    if not pathlib.Path(REFERENCE).is_dir():
        pytest.skip("reference checkout not available")

    const = types.ModuleType("prismatic.vla.constants")
    const.ACTION_DIM = 7
    const.ACTION_TOKEN_BEGIN_IDX = 151386
    const.IGNORE_INDEX = -100
    const.NUM_ACTIONS_CHUNK = 8
    const.PROPRIO_DIM = 8
    const.STOP_INDEX = 2
    const.NUM_TOKENS = 64
    saved = {k: sys.modules.get(k) for k in
             ("prismatic", "prismatic.vla", "prismatic.vla.constants")}
    sys.modules["prismatic"] = types.ModuleType("prismatic")
    sys.modules["prismatic.vla"] = types.ModuleType("prismatic.vla")
    sys.modules["prismatic.vla.constants"] = const

    def load(name, rel):
        spec = importlib.util.spec_from_file_location(name, REFERENCE + rel)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    try:
        ah = load("ref_action_heads", "/prismatic/models/action_heads.py")
        pj = load("ref_projectors", "/prismatic/models/projectors.py")
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return ah, pj


# Small geometry; platform constants (chunk=8, dim=7) come from the
# reference's argv sniffing which defaults to LIBERO — matching ours.
LLM_DIM = 64
NUM_TASK = 24
NUM_BLOCKS = 24  # reference hard-codes 24 blocks == num VLM layers
CHUNK = 8
ADIM = 7


@pytest.mark.parametrize("pro", [False, True], ids=["orig", "pro"])
def test_action_head_bf16_consistent_with_fp32(pro):
    """Our bf16 deployment dtype tracks our fp32 math (plumbing check).

    4 blocks: bf16 rounding compounds per block; this checks dtype wiring,
    not accumulation depth.
    """
    import jax

    from vla_adapter_tpu.models.layers import Runtime

    cfg = ActionHeadConfig(num_blocks=4, hidden_dim=LLM_DIM,
                           use_pro_version=pro)
    rng = np.random.default_rng(0)
    hidden = rng.normal(size=(2, 5, NUM_TASK + 64, LLM_DIM)).astype(np.float32)
    pfeat = rng.normal(size=(2, 1, LLM_DIM)).astype(np.float32)

    head32 = L1RegressionActionHead(
        cfg, action_dim=ADIM, num_actions_chunk=CHUNK,
        num_task_tokens=NUM_TASK, rt=FP32_RUNTIME,
    )
    params = head32.init(jax.random.key(0), jnp.asarray(hidden),
                         jnp.asarray(pfeat), train=False)

    out32 = np.asarray(
        head32.apply(params, jnp.asarray(hidden), jnp.asarray(pfeat), train=False),
        np.float32,
    )
    head16 = L1RegressionActionHead(
        cfg, action_dim=ADIM, num_actions_chunk=CHUNK,
        num_task_tokens=NUM_TASK, rt=Runtime(dtype=jnp.bfloat16, attn_impl="xla"),
    )
    out16 = np.asarray(
        head16.apply(params, jnp.asarray(hidden), jnp.asarray(pfeat), train=False),
        np.float32,
    )
    assert out32.shape == (2, CHUNK, ADIM)
    np.testing.assert_allclose(out16, out32, atol=0.08, rtol=0.1)


@pytest.mark.parametrize("pro", [False, True], ids=["orig", "pro"])
def test_action_head_matches_reference_fp32(ref_modules, pro):
    """Strict fp32-vs-fp32 parity (tight tolerance)."""
    ah_mod, pj_mod = ref_modules
    torch.manual_seed(1)
    t_head = ah_mod.L1RegressionActionHead(
        input_dim=LLM_DIM, hidden_dim=LLM_DIM, action_dim=ADIM,
        num_task_tokens=NUM_TASK, use_pro_version=pro,
    ).eval()
    t_proj = pj_mod.ProprioProjector(llm_dim=LLM_DIM, proprio_dim=8).eval()

    rng = np.random.default_rng(1)
    hidden = rng.normal(size=(1, NUM_BLOCKS + 1, NUM_TASK + 64, LLM_DIM)).astype(
        np.float32
    )
    proprio = rng.normal(size=(1, 8)).astype(np.float32)

    # The reference head casts proprio to bf16 internally
    # (action_heads.py:53); run the torch modules in fp32 but keep that cast.
    with torch.no_grad():
        pf = t_proj(torch.tensor(proprio).to(torch.bfloat16).float()).unsqueeze(1)
        task = torch.tensor(hidden[:, :, :NUM_TASK])
        act = torch.tensor(hidden[:, :, NUM_TASK:])
        x = torch.zeros(1, ADIM * CHUNK, LLM_DIM).reshape(1, CHUNK, -1)
        golden = t_head.model(x, h_a=act, p=pf, h_t=task).numpy()

    head_sd = state_dict_to_numpy(t_head.state_dict())
    proj_sd = state_dict_to_numpy(t_proj.state_dict())
    head_params = action_head_params_from_torch(head_sd, NUM_BLOCKS, pro)
    proj_params = mlp_projector_params_from_torch(proj_sd)

    cfg = ActionHeadConfig(num_blocks=NUM_BLOCKS, hidden_dim=LLM_DIM,
                           use_pro_version=pro)
    proj = ProprioProjector(LLM_DIM, rt=FP32_RUNTIME)
    pfeat = proj.apply(
        {"params": proj_params},
        jnp.asarray(proprio, jnp.bfloat16).astype(jnp.float32),
    )[:, None, :]
    head = L1RegressionActionHead(
        cfg, action_dim=ADIM, num_actions_chunk=CHUNK,
        num_task_tokens=NUM_TASK, rt=FP32_RUNTIME,
    )
    got = head.apply(
        {"params": head_params}, jnp.asarray(hidden), pfeat, train=False
    )
    np.testing.assert_allclose(np.asarray(got), golden, atol=5e-5, rtol=1e-3)
