"""RLDS -> model-batch glue (reference vla/datasets/datasets.py RLDSDataset).

Builds the VLA-recipe RLDS pipeline (window 1, future actions = chunk-1,
skip_unlabeled, optional image augmentation — reference datasets.py:147-238)
and yields model-format batches: TF does the heavy lifting on host CPU;
the per-frame prompt/tokenize/normalize transform runs python-side, exactly
the reference's architecture (tf.data + torch-side RLDSBatchTransform).
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional

import numpy as np

from vla_adapter_tpu.core.config import VLAConfig
from vla_adapter_tpu.data.collator import collate
from vla_adapter_tpu.data.transform import VLABatchTransform

IMAGE_AUGMENT_KWARGS = dict(
    random_resized_crop=dict(scale=[0.9, 0.9], ratio=[1.0, 1.0]),
    random_brightness=[0.2],
    random_contrast=[0.8, 1.2],
    random_saturation=[0.8, 1.2],
    random_hue=[0.05],
    augment_order=[
        "random_resized_crop", "random_brightness", "random_contrast",
        "random_saturation", "random_hue",
    ],
)


def vla_traj_transform_kwargs(cfg: VLAConfig) -> dict:
    consts = cfg.constants
    return dict(
        window_size=1,
        future_action_window_size=consts.num_actions_chunk - 1,
        skip_unlabeled=True,
        goal_relabeling_strategy="uniform",
    )


def vla_frame_transform_kwargs(cfg: VLAConfig, image_aug: bool) -> dict:
    size = (cfg.vision.primary.image_size, cfg.vision.primary.image_size)
    return dict(
        resize_size=size,
        image_augment_kwargs=IMAGE_AUGMENT_KWARGS if image_aug else None,
    )


class RLDSDataset:
    """Iterable of model-format batches from one or more RLDS datasets."""

    def __init__(
        self,
        cfg: VLAConfig,
        transform: VLABatchTransform,
        dataset_kwargs_list: List[dict],
        sample_weights: Optional[List[float]] = None,
        batch_size: int = 8,
        train: bool = True,
        image_aug: bool = True,
        shuffle_buffer_size: int = 100_000,
        accum_steps: Optional[int] = None,
        seed: int = 0,
    ):
        from vla_adapter_tpu.data.rlds.dataset import (
            make_interleaved_dataset,
            make_single_dataset,
        )

        self.cfg = cfg
        self.transform = transform
        self.batch_size = batch_size
        self.accum_steps = accum_steps

        traj_kwargs = vla_traj_transform_kwargs(cfg)
        frame_kwargs = vla_frame_transform_kwargs(cfg, image_aug and train)
        if len(dataset_kwargs_list) == 1:
            # repeat+shuffle happen INSIDE make_single_dataset, before the
            # frame transforms — the buffer holds encoded frames, not GBs
            # of decoded pixels
            self.dataset, stats = make_single_dataset(
                dataset_kwargs_list[0], train=train,
                traj_transform_kwargs=traj_kwargs,
                frame_transform_kwargs=frame_kwargs,
                shuffle_buffer_size=(min(shuffle_buffer_size, 10_000)
                                     if train else 0),
                seed=seed,
            )
            self.dataset_statistics = {dataset_kwargs_list[0]["name"]: stats}
        else:
            self.dataset, self.dataset_statistics = make_interleaved_dataset(
                dataset_kwargs_list, sample_weights, train=train,
                shuffle_buffer_size=shuffle_buffer_size,
                traj_transform_kwargs=traj_kwargs,
                frame_transform_kwargs=frame_kwargs,
                seed=seed,
            )

    def frames(self) -> Iterator[Dict]:
        yield from self.dataset.as_numpy_iterator()

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        examples = []
        for frame in self.dataset.as_numpy_iterator():
            examples.append(self.transform(frame))
            if len(examples) == self.batch_size:
                yield collate(examples, accum_steps=self.accum_steps)
                examples = []


class EpisodicRLDSDataset(RLDSDataset):
    """Yields whole trajectories instead of frames (reference
    datasets.py:239-261); used for evaluation-side replay.

    The underlying pipeline is the FLAT chunked-frame dataset (every frame
    already carries its action chunk and decoded window) — episodes are
    reassembled at iteration time on the timestep-reset boundary, which
    flatten_trajectories preserves (frames stay in within-episode order;
    build with train=False so no repeat/shuffle reorders them)."""

    def __iter__(self) -> Iterator[List[Dict]]:
        episode: List[Dict] = []
        for frame in self.dataset.as_numpy_iterator():
            t = int(np.asarray(frame["observation"]["timestep"]).reshape(-1)[0])
            if episode and t == 0:
                yield episode
                episode = []
            episode.append(self.transform(frame))
        if episode:
            yield episode
