"""Device mesh + sharding rules (the NCCL/DDP/FSDP replacement).

The reference parallelizes with torch DDP (finetune recipe) and FSDP
HYBRID_SHARD (pretraining) over NCCL (reference: finetune.py:215-227,
fsdp.py:84-89). The TPU-native equivalent is a single device mesh with
GSPMD sharding annotations; XLA inserts the collectives over ICI/DCN:

  axes: ("data", "fsdp", "tensor")
  * DDP            == mesh (N, 1, 1); params replicated, batch on "data"
  * FSDP/ZeRO      == mesh (1, N, 1); params sharded on "fsdp", batch on
                      ("data","fsdp") — every device still sees distinct
                      examples; XLA all-gathers params per layer and
                      reduce-scatters grads (ZeRO-3 semantics)
  * HYBRID_SHARD   == mesh (R, S, 1); shard within "fsdp" groups,
                      replicate across "data" (the reference's
                      shard-within-node/replicate-across-nodes)
  * TP             == "tensor" axis: column-parallel q/k/v + MLP-up
                      kernels, row-parallel o/down kernels (Megatron-style
                      splits expressed purely as GSPMD shardings — XLA
                      derives the all-reduces). Not *needed* at 0.5B
                      (SURVEY.md section 2.7) but fully functional; the
                      multichip dryrun and tests/test_train_step.py run
                      data x fsdp x tensor meshes.

Multi-host: call :func:`initialize_distributed` first (jax.distributed),
then the same code runs unmodified — device order in the mesh keeps ICI
neighbors adjacent via mesh_utils.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
TENSOR_AXIS = "tensor"
BATCH_SPEC = P((DATA_AXIS, FSDP_AXIS))


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init (replaces torchrun + NCCL process groups).

    Must run before the first backend touch: calling jax.devices() /
    jax.process_count() first would lock in a single-process backend, so we
    check the distributed client state directly instead of process_count().
    """
    if coordinator_address is None:
        return  # single-process; never touch the backend from here
    from jax._src import distributed as _dist

    if _dist.global_state.client is not None:
        return  # already initialized (idempotent, like torch init_process_group)
    jax.distributed.initialize(coordinator_address, num_processes, process_id)


def create_mesh(
    data: int = -1, fsdp: int = 1, tensor: int = 1, devices=None
) -> Mesh:
    """Build a ("data", "fsdp", "tensor") mesh. data=-1 -> all remaining."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % (fsdp * tensor) == 0, (n, fsdp, tensor)
        data = n // (fsdp * tensor)
    need = data * fsdp * tensor
    assert need <= n, (data, fsdp, tensor, n)
    devices = devices[:need]  # explicit sizes may use a device subset
    dev_array = mesh_utils.create_device_mesh((data, fsdp, tensor), devices=devices)
    return Mesh(dev_array, (DATA_AXIS, FSDP_AXIS, TENSOR_AXIS))


# Parameters whose *last* dim should carry the tensor axis (column-parallel)
# and whose output dim is contracted (row-parallel) — reserved for TP.
# kernel_q is the int8 storage twin of kernel (train_base_int8 / serving
# trees, models/layers.Dense): same (in, out) geometry, same splits.
_TP_COL = re.compile(r"(q_proj|k_proj|v_proj|gate_proj|up_proj|fc1|fc_in)/kernel(_q)?$")
_TP_ROW = re.compile(r"(o_proj|down_proj|out_proj|fc2|fc_out)/kernel(_q)?$")
# A column-split kernel(_q)'s per-out-channel int8 scale splits with it;
# row-parallel scales stay whole (their out axis is not contracted).
_TP_COL_SCALE = re.compile(
    r"(q_proj|k_proj|v_proj|gate_proj|up_proj|fc1|fc_in)/kernel_scale$")


def param_pspec(
    path: str,
    shape: tuple,
    fsdp_size: int,
    tensor_size: int = 1,
    min_fsdp_size: int = 2 ** 18,
) -> P:
    """PartitionSpec for one parameter.

    FSDP: shard the largest divisible dim (preferring the trailing dim) of
    any parameter bigger than `min_fsdp_size` elements. Scanned-layer stacks
    (leading L axis) never shard the L axis. TP (when tensor_size > 1):
    column/row-parallel on the matching projection kernels.
    """
    ndim = len(shape)
    spec = [None] * ndim
    if tensor_size > 1:
        if ndim >= 2 and _TP_COL.search(path) and shape[-1] % tensor_size == 0:
            spec[-1] = TENSOR_AXIS
        elif ndim >= 2 and _TP_ROW.search(path) and shape[-2] % tensor_size == 0:
            spec[-2] = TENSOR_AXIS
        elif (_TP_COL_SCALE.search(path)
              and shape[-1] % tensor_size == 0):
            # (out,) / (L, out) int8 scales follow their column-split kernel
            spec[-1] = TENSOR_AXIS
    if fsdp_size > 1 and int(np.prod(shape)) >= min_fsdp_size:
        # candidate dims: all but a scanned leading layer axis; prefer last.
        start = 1 if ndim >= 3 else 0  # (L, in, out) stacks keep L whole
        for d in range(ndim - 1, start - 1, -1):
            if spec[d] is None and shape[d] % fsdp_size == 0:
                spec[d] = FSDP_AXIS
                break
    return P(*spec)


def params_shardings(params, mesh: Mesh):
    """Tree of NamedShardings matching param_pspec."""
    fsdp_size = mesh.shape[FSDP_AXIS]
    tensor_size = mesh.shape[TENSOR_AXIS]

    def one(path, leaf):
        p = jax.tree_util.keystr(path, simple=True, separator="/")
        return NamedSharding(
            mesh, param_pspec(p, np.shape(leaf), fsdp_size, tensor_size)
        )

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params, mesh: Mesh):
    """Place a param tree onto the mesh per the FSDP/TP rules."""
    return jax.device_put(params, params_shardings(params, mesh))


def per_process_seed(seed: int, process_index: Optional[int] = None) -> int:
    """Distinct-but-deterministic data seed for this host.

    The reference runs one RLDS pipeline per rank, seeded per rank via a
    SeedSequence spawn (finetune.py:952-994, util/torch_utils.py:31-77) so
    ranks never duplicate shuffles/augmentations. Same contract here:
    fold the process index through a SeedSequence — adjacent (seed,
    process) pairs map to statistically independent streams, unlike
    seed+process arithmetic."""
    pi = jax.process_index() if process_index is None else process_index
    return int(np.random.SeedSequence([seed, pi]).generate_state(1)[0])


def process_local_batch_size(global_batch_size: int) -> int:
    """This host's share of the global batch (reference semantics: each DDP
    rank feeds batch_size examples and the global batch is the sum;
    finetune.py:952-994). We keep the config value GLOBAL — independent of
    topology — and divide here."""
    n = jax.process_count()
    assert global_batch_size % n == 0, (global_batch_size, n)
    return global_batch_size // n


def shard_batch_from_local(batch, mesh: Mesh, batch_axis: int = 0):
    """Assemble GLOBAL device batches from each process's host-LOCAL shard.

    Multi-host: every process passes only its own rows (distinct data, from
    a per_process_seed pipeline) and jax.make_array_from_process_local_data
    places them on that process's devices — no host ever materializes the
    full global batch (the reference's per-rank pipelines have the same
    property; an identical-global-batch contract would multiply host CPU
    by process_count). Single-process: plain device_put with the same
    sharding, so callers use one code path everywhere.

    batch_axis follows shard_batch: 0 for (B, ...), 1 for gradient-
    accumulation (A, B/A, ...) layouts."""
    nproc = jax.process_count()

    def one(x):
        x = np.asarray(x)
        spec = [None] * x.ndim
        spec[batch_axis] = BATCH_SPEC[0]
        sharding = NamedSharding(mesh, P(*spec))
        if nproc == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(one, batch)


def host_local_rows(x, batch_axis: int = 0) -> np.ndarray:
    """This process's rows of a batch-axis-sharded global device array, as
    numpy, in local order — the read-side inverse of
    :func:`shard_batch_from_local` for small per-example outputs (the
    train step's per-sample metrics). Single-process (or replicated):
    returns the whole array."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(jax.device_get(x))
    chunks = {}
    for s in x.addressable_shards:
        idx = s.index[batch_axis]
        # dedupe replicas: multiple local devices may hold the same slice
        chunks[idx.start or 0] = np.asarray(s.data)
    return np.concatenate([chunks[k] for k in sorted(chunks)],
                          axis=batch_axis)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim split over (data, fsdp) — every device computes distinct
    examples (DDP- or ZeRO-style depending on the param sharding)."""
    return NamedSharding(mesh, BATCH_SPEC)


def shard_batch(batch, mesh: Mesh, batch_axis: int = 0):
    """Shard the EXAMPLE axis over (data, fsdp).

    batch_axis: 0 for plain batches (B, ...); 1 for gradient-accumulation
    batches (A, B/A, ...) — axis 0 there is the microbatch-STEP axis that
    lax.scan iterates on the device, and sharding it would either fail the
    divisibility check (A < devices) or silently replicate every example
    on every device (no data parallelism, full-microbatch memory)."""
    def one(x):
        spec = [None] * np.ndim(x)
        spec[batch_axis] = BATCH_SPEC[0]
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(one, batch)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
