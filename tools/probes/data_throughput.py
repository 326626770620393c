"""Host RLDS data-pipeline throughput at flagship geometry.

Production training is device-bound only while the host pipeline outruns the
train step (bench.py: ~22 samples/s at bs8/accum2 on one v5e). This probe
measures end-to-end host samples/s — synthetic 224px JPEG trajectories ->
make_interleaved_dataset (decode, lanczos3 resize, optional aug) ->
VLABatchTransform (prompt build, tokenize, action discretize) -> collated
train batches — i.e. every host stage of train/loop.py's feed path.

The reference never benchmarks its loader; its contract is "tf.data keeps
up via thread pools" (SURVEY 2.9). Same contract here, measured.

Run: python tools/probes/data_throughput.py [--aug] [--batches N]
"""

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[2]))

import argparse
import time

import numpy as np


def synthetic_flagship_trajs(num_trajs=8, traj_len=40, seed=0):
    import tensorflow as tf

    rng = np.random.default_rng(seed)
    trajs = []
    for t in range(num_trajs):
        length = traj_len
        img = rng.integers(0, 255, size=(length, 224, 224, 3), dtype=np.uint8)
        encoded = [tf.io.encode_jpeg(img[i]).numpy() for i in range(length)]
        trajs.append({
            "observation": {
                "image": np.array(encoded, dtype=object),
                "wrist_image": np.array(encoded, dtype=object),
                "state": rng.normal(size=(length, 8)).astype(np.float32),
            },
            "action": np.concatenate([
                rng.normal(size=(length, 6)),
                rng.integers(0, 2, size=(length, 1)),
            ], axis=1).astype(np.float32),
            "language_instruction": np.array(
                [b"put the bowl on the plate"] * length, dtype=object),
        })

    def gen():
        yield from trajs

    spec = {
        "observation": {
            "image": tf.TensorSpec([None], tf.string),
            "wrist_image": tf.TensorSpec([None], tf.string),
            "state": tf.TensorSpec([None, 8], tf.float32),
        },
        "action": tf.TensorSpec([None, 7], tf.float32),
        "language_instruction": tf.TensorSpec([None], tf.string),
    }
    return tf.data.Dataset.from_generator(gen, output_signature=spec)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--aug", action="store_true",
                   help="train-time image augmentation on")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--batches", type=int, default=40)
    p.add_argument("--workers", type=int, default=0,
                   help="frame-transform threads (0 = tf.data AUTOTUNE)")
    args = p.parse_args()

    from vla_adapter_tpu.core.config import VLAConfig
    from vla_adapter_tpu.data.action_tokenizer import ActionTokenizer
    from vla_adapter_tpu.data.image_processing import image_processor_for
    from vla_adapter_tpu.data.rlds_dataset import RLDSDataset
    from vla_adapter_tpu.data.rlds.oxe.materialize import make_oxe_dataset_kwargs
    from vla_adapter_tpu.data.tokenization import MockTokenizer
    from vla_adapter_tpu.data.transform import VLABatchTransform

    cfg = VLAConfig()
    kw = make_oxe_dataset_kwargs(
        "libero_spatial_no_noops", "/nonexistent",
        load_camera_views=("primary", "wrist"))
    kw["traj_dataset"] = synthetic_flagship_trajs()

    tok = MockTokenizer()
    transform = VLABatchTransform(
        cfg, lambda t: tok(t).input_ids, ActionTokenizer(len(tok)),
        image_processor=image_processor_for(cfg.vision))
    ds = RLDSDataset(cfg, transform, [kw], batch_size=args.batch_size,
                     train=True, image_aug=args.aug,
                     shuffle_buffer_size=256)
    it = iter(ds)
    next(it)  # warm: TF graph build + first shuffle fill
    t0 = time.time()
    for _ in range(args.batches):
        next(it)
    dt = time.time() - t0
    n = args.batches * args.batch_size
    print(f"host pipeline (aug={args.aug}): {n / dt:.1f} samples/s "
          f"({dt / args.batches * 1e3:.1f} ms/batch of {args.batch_size}; "
          f"device step consumes ~22 samples/s at bs8/accum2)", flush=True)


if __name__ == "__main__":
    main()
