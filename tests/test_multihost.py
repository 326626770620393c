"""2-process jax.distributed test (the torchrun/NCCL-equivalent gate).

Launches tests/multihost_worker.py twice (coordinator on localhost, gloo
CPU collectives, 2 local devices each -> a 4-device global (data=2, fsdp=2)
mesh), covering:
  * parallel/sharding.initialize_distributed multi-process init,
  * a sharded train step whose grad reduction crosses process boundaries,
  * orbax save/restore of cross-process-sharded arrays
    (train/checkpoints.py multi-host path).

Reference equivalents replaced: finetune.py:724 PartialState topology,
fsdp.py:95-133 rank0 FULL_STATE_DICT gather + dist.barrier.
"""

import json
import pathlib
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_and_checkpoint(tmp_path):
    worker = pathlib.Path(__file__).parent / "multihost_worker.py"
    repo = worker.parent.parent
    port = _free_port()
    nprocs = 2

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(nprocs), str(port),
             str(tmp_path / "ckpt")],
            cwd=repo,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(nprocs)
    ]
    outs = []
    for p in procs:
        # generous: worker startup (TF import + gloo rendezvous) plus the
        # train-step compile can stack with an oversubscribed machine (the
        # suite runs alongside TPU benches in CI-like sessions)
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    results = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        results.append(json.loads(line))
    assert all(r["ok"] for r in results)
    assert results[0]["mesh"] == {"data": 2, "fsdp": 2, "tensor": 1}
    # both processes computed the same global losses
    assert results[0]["loss1"] == pytest.approx(results[1]["loss1"])
    assert results[0]["loss2"] == pytest.approx(results[1]["loss2"])
