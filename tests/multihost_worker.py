"""Worker for the 2-process jax.distributed test (tests/test_multihost.py).

Each process owns 2 CPU devices (4 global). Covers what the reference gets
from torchrun + NCCL/DDP + rank0 FULL_STATE_DICT gather (finetune.py:724,
fsdp.py:95-133): multi-process init, a global (data=2, fsdp=2) mesh, a
sharded train step whose gradients psum across processes, and an orbax
save/restore of the cross-process-sharded state.

Usage: python tests/multihost_worker.py <pid> <nprocs> <port> <tmpdir>
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main() -> None:
    pid, nprocs, port, tmpdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
    )

    from vla_adapter_tpu.parallel.sharding import initialize_distributed

    initialize_distributed(f"localhost:{port}", nprocs, pid)
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.local_device_count() == 2
    assert jax.device_count() == 2 * nprocs

    import numpy as np

    import jax.numpy as jnp

    from vla_adapter_tpu.core.config import (
        ActionHeadConfig,
        FusedVisionConfig,
        OptimizerConfig,
        Qwen2Config,
        TrainConfig,
        ViTConfig,
        VLAConfig,
    )
    from vla_adapter_tpu.core.constants import NormalizationType, PlatformConstants
    from vla_adapter_tpu.data.dummy import make_dummy_batch
    from vla_adapter_tpu.models.layers import Runtime
    from vla_adapter_tpu.models.vla import VLAModel
    from vla_adapter_tpu.parallel.sharding import (
        create_mesh,
        per_process_seed,
        shard_batch,
        shard_batch_from_local,
        shard_params,
    )
    from vla_adapter_tpu.train.checkpoints import load_checkpoint, save_checkpoint
    from vla_adapter_tpu.train.optim import make_optimizer
    from vla_adapter_tpu.train.step import TrainState, init_train_state, make_train_step

    cfg = VLAConfig(
        platform="libero",
        custom_constants=PlatformConstants(
            name="mh", num_actions_chunk=8, action_dim=7, proprio_dim=8,
            normalization_type=NormalizationType.BOUNDS_Q99,
            num_action_query_tokens=16,
        ),
        vision=FusedVisionConfig(
            primary=ViTConfig(name="p", image_size=28, patch_size=14,
                              hidden_size=32, num_layers=2, num_heads=4,
                              mlp_dim=64, use_cls_token=True,
                              num_register_tokens=2,
                              pos_embed_patches_only=True,
                              layer_scale_init=1e-5),
            fused=None,
            num_images=2,
        ),
        llm=Qwen2Config(vocab_size=512, hidden_size=64, num_layers=2,
                        num_heads=4, num_kv_heads=2, intermediate_size=128,
                        head_dim=16),
        head=ActionHeadConfig(num_blocks=2, hidden_dim=64, use_pro_version=True),
        max_text_tokens=32,
    )
    rt = Runtime(dtype=jnp.float32, param_dtype=jnp.float32, attn_impl="xla",
                 lora_rank=4, lora_scale=2.0)
    model = VLAModel(cfg, rt)
    tcfg = TrainConfig(model=cfg, optim=OptimizerConfig(max_steps=10))
    tx = make_optimizer(tcfg.optim, warmup_steps=0)

    mesh = create_mesh(data=2, fsdp=2)

    # PER-PROCESS data: each host builds ONLY its own rows from a
    # process-folded seed (the reference's per-rank RLDS pipelines,
    # finetune.py:952-994) and shard_batch_from_local assembles the global
    # batch from the host-local shards — no host ever holds the full batch.
    local_bs = 2 * 2  # 2 local devices x 2 examples/device

    def local_batch(p: int):
        return make_dummy_batch(
            cfg, local_bs, np.random.default_rng(per_process_seed(0, p)))

    local_np = local_batch(pid)
    # the hosts must be feeding DISTINCT data (per-process seeds diverge)
    assert not np.array_equal(local_np["actions"], local_batch(1 - pid)["actions"])

    # oracle: the concatenated global batch (reconstructible on any process
    # because the per-process seed is deterministic in (seed, pid)), fed
    # through the identical-global-batch path. Process p's devices own rows
    # [p*local_bs, (p+1)*local_bs) under the contiguous mesh layout, so the
    # two feeds must produce the SAME global array — verified below by
    # bit-identical losses and updated parameters.
    parts = [local_batch(p) for p in range(nprocs)]
    global_np = {k: np.concatenate([pt[k] for pt in parts]) for k in parts[0]}

    state = init_train_state(model, tx,
                             jax.tree.map(jnp.asarray, local_np),
                             jax.random.key(0), lora_enabled=True)
    state = TrainState(
        step=state.step,
        trainable=shard_params(state.trainable, mesh),
        frozen=shard_params(state.frozen, mesh),
        opt_state=jax.tree.map(
            lambda x: shard_params(x, mesh) if isinstance(x, dict) else x,
            state.opt_state,
            is_leaf=lambda x: isinstance(x, dict),
        ),
    )
    sbatch = shard_batch_from_local(local_np, mesh)
    sbatch_oracle = shard_batch(jax.tree.map(jnp.asarray, global_np), mesh)

    step = jax.jit(make_train_step(model, tx, tcfg))
    # the per-process feed and the full-global-batch feed must be the SAME
    # computation: bit-identical loss AND updated trainables (catches
    # misplaced or duplicated rows — a wrong assembly changes the mean
    # gradient even though the loss is permutation-invariant)
    state_o, metrics_o = step(state, sbatch_oracle, jax.random.key(1))
    state, metrics = step(state, sbatch, jax.random.key(1))
    loss1 = float(jax.device_get(metrics["loss"]))
    assert np.isfinite(loss1), loss1
    assert loss1 == float(jax.device_get(metrics_o["loss"]))
    for a, b in zip(jax.tree.leaves(state.trainable),
                    jax.tree.leaves(state_o.trainable)):
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(a.addressable_shards[0].data)),
            np.asarray(jax.device_get(b.addressable_shards[0].data)),
        )
    del state_o

    # orbax save of the cross-process-sharded state, restore, same loss
    ckpt = save_checkpoint(tmpdir, state, latest_only=True)
    restored = load_checkpoint(ckpt, state)
    for a, b in zip(jax.tree.leaves(state.trainable),
                    jax.tree.leaves(restored.trainable)):
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(a.addressable_shards[0].data)),
            np.asarray(jax.device_get(b.addressable_shards[0].data)),
        )

    state2, metrics2 = step(restored, sbatch, jax.random.key(2))
    loss2 = float(jax.device_get(metrics2["loss"]))
    assert np.isfinite(loss2), loss2

    # cross-process agreement on the (replicated) losses
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(
        jnp.asarray([loss1, loss2], jnp.float32)
    )
    assert np.allclose(gathered, gathered[0]), gathered

    print(json.dumps({
        "pid": pid,
        "mesh": dict(zip(mesh.axis_names, mesh.devices.shape)),
        "loss1": loss1,
        "loss2": loss2,
        "ok": True,
    }), flush=True)


if __name__ == "__main__":
    main()
