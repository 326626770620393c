"""RLDS data engine (host-side tf.data; the TPU never sees this code).

Re-implements the reference pipeline (rlds/dataset.py; the dlimp DLataset
layer it leans on is folded into plain tf.data here):

  make_dataset_from_rlds  — load/standardize one TFDS/RLDS dataset into the
      standard trajectory schema, compute/cache statistics, normalize
      actions + proprio (reference :39-250)
  apply_trajectory_transforms — language filter, pad-mask dict, goal
      relabel, task augmentation, chunk_act_obs, subsample (:251-350)
  apply_frame_transforms  — decode + resize + train-time augmentation
      (:352-424)
  make_single_dataset     — one dataset -> flat frame dataset (:424-454)
  make_interleaved_dataset — weighted mixture over N datasets with
      size-balancing, thread allocation, big shuffle buffer (:454-585)

All trajectory-level tensors share leading dim = traj length. Tests build
synthetic trajectory datasets via `make_dataset_from_rlds(...,
traj_dataset=...)`, skipping TFDS I/O.
"""

from __future__ import annotations

import json
from functools import partial
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
import tensorflow as tf

from vla_adapter_tpu.core.constants import NormalizationType
from vla_adapter_tpu.data.rlds import obs_transforms, traj_transforms
from vla_adapter_tpu.data.rlds.utils import goal_relabeling, task_augmentation

tf.config.set_visible_devices([], "GPU")  # host CPU only


# --------------------------------------------------------------------------
# Normalization (tf twin of data/normalization.py; same semantics)
# --------------------------------------------------------------------------


def _normalize_traj(traj: Dict, metadata: Dict,
                    norm_type: NormalizationType) -> Dict:
    for key, path in (("action", "action"), ("proprio", "proprio")):
        if key == "proprio" and "proprio" not in traj["observation"]:
            continue
        stats = metadata[key]
        mask = tf.constant(
            stats.get("mask", [True] * len(stats["min"])), tf.bool
        )
        x = traj["action"] if path == "action" else traj["observation"]["proprio"]
        if norm_type == NormalizationType.NORMAL:
            mean = tf.constant(stats["mean"], tf.float32)
            std = tf.constant(stats["std"], tf.float32)
            out = tf.where(mask, (x - mean) / (std + 1e-8), x)
        elif norm_type in (NormalizationType.BOUNDS, NormalizationType.BOUNDS_Q99):
            if norm_type == NormalizationType.BOUNDS:
                lo = tf.constant(stats["min"], tf.float32)
                hi = tf.constant(stats["max"], tf.float32)
            else:
                lo = tf.constant(stats["q01"], tf.float32)
                hi = tf.constant(stats["q99"], tf.float32)
            out = tf.where(
                mask,
                tf.clip_by_value(2.0 * (x - lo) / (hi - lo + 1e-8) - 1.0, -1, 1),
                x,
            )
            # degenerate dims (min == max) -> 0, mask-independent
            # (reference data_utils.py:86-89)
            degenerate = tf.constant(
                np.asarray(stats["min"]) == np.asarray(stats["max"])
            )
            out = tf.where(degenerate, tf.zeros_like(out), out)
        else:
            raise ValueError(norm_type)
        if path == "action":
            traj["action"] = out
        else:
            traj["observation"]["proprio"] = out
    return traj


def compute_dataset_statistics(traj_ds: tf.data.Dataset,
                               save_path: Optional[str] = None) -> Dict:
    """Full-pass min/max/mean/std/q01/q99 over actions (+proprio), with an
    optional JSON cache (reference get_dataset_statistics,
    data_utils.py:176-263)."""
    if save_path is not None and tf.io.gfile.exists(save_path):
        with tf.io.gfile.GFile(save_path, "r") as f:
            return json.load(f)

    from vla_adapter_tpu.data.normalization import compute_statistics

    # strip to action(+proprio) BEFORE the full pass: iterating the raw
    # restructured dataset would deserialize every encoded camera image of
    # every trajectory just to read two small float arrays
    has_proprio = "proprio" in traj_ds.element_spec["observation"]

    def slim(traj):
        out = {"action": traj["action"], "observation": {}}
        if has_proprio:
            out["observation"]["proprio"] = traj["observation"]["proprio"]
        return out

    actions, proprios, n_traj = [], [], 0
    for traj in traj_ds.map(slim, tf.data.AUTOTUNE).as_numpy_iterator():
        actions.append(np.asarray(traj["action"], np.float32))
        if has_proprio:
            proprios.append(np.asarray(traj["observation"]["proprio"], np.float32))
        n_traj += 1
    acts = np.concatenate(actions, 0)
    stats = {
        "action": compute_statistics(acts),
        "num_transitions": int(acts.shape[0]),
        "num_trajectories": n_traj,
    }
    if proprios:
        stats["proprio"] = compute_statistics(np.concatenate(proprios, 0))
    if save_path is not None:
        with tf.io.gfile.GFile(save_path, "w") as f:
            json.dump(stats, f)
    return stats


# --------------------------------------------------------------------------
# Dataset construction
# --------------------------------------------------------------------------


def load_tfds_trajectories(name: str, data_dir: str, train: bool,
                           shuffle: bool,
                           num_parallel_reads=tf.data.AUTOTUNE,
                           split: Optional[str] = None):
    """TFDS loader (file-level shuffle only, like the reference).

    split overrides the train/val selection; "all" unions every split the
    builder has (the reference computes dataset STATISTICS over split
    'all' so train and val normalize identically)."""
    import tensorflow_datasets as tfds

    builder = tfds.builder(name, data_dir=data_dir)
    if split == "all":
        split = "+".join(sorted(builder.info.splits.keys()))
    elif split is None:
        split = "train" if train else "val"
        if split not in builder.info.splits:
            split = "train[:95%]" if train else "train[95%:]"
    return builder.as_dataset(
        split=split,
        shuffle_files=shuffle,
        read_config=tfds.ReadConfig(num_parallel_calls_for_interleave_files=num_parallel_reads),
    ).map(_steps_to_trajectory, tf.data.AUTOTUNE)


def _steps_to_trajectory(episode):
    """RLDS episode {steps: Dataset} -> dense trajectory dict."""
    steps = episode["steps"].batch(1_000_000).get_single_element()
    return steps


def make_dataset_from_rlds(
    name: str,
    data_dir: Optional[str] = None,
    *,
    train: bool = True,
    standardize_fn: Optional[Callable[[dict], dict]] = None,
    shuffle: bool = True,
    image_obs_keys: Dict[str, Optional[str]] = {},
    depth_obs_keys: Dict[str, Optional[str]] = {},
    state_obs_keys: Sequence[Optional[str]] = (),
    language_key: Optional[str] = None,
    action_proprio_normalization_type: NormalizationType = NormalizationType.BOUNDS_Q99,
    dataset_statistics: Optional[Union[dict, str]] = None,
    absolute_action_mask: Optional[Sequence[bool]] = None,
    action_normalization_mask: Optional[Sequence[bool]] = None,
    num_parallel_calls=tf.data.AUTOTUNE,
    num_parallel_reads=tf.data.AUTOTUNE,
    traj_dataset: Optional[tf.data.Dataset] = None,
    statistics_save_path: Optional[str] = None,
) -> Tuple[tf.data.Dataset, Dict]:
    """One RLDS dataset -> (standard-schema trajectory dataset, statistics).

    `traj_dataset` bypasses TFDS with an in-memory trajectory dataset
    (tests / custom sources).
    """

    def restructure(traj):
        if standardize_fn is not None:
            traj = standardize_fn(traj)
        for k in ("observation", "action"):
            if k not in traj:
                raise ValueError(f"trajectory missing key {k!r}")
        traj_len = tf.shape(traj["action"])[0]
        old_obs = traj["observation"]
        new_obs = {}
        for new, old in image_obs_keys.items():
            if old is None:
                new_obs[f"image_{new}"] = tf.repeat("", traj_len)
            else:
                new_obs[f"image_{new}"] = old_obs[old]
        for new, old in depth_obs_keys.items():
            if old is None:
                new_obs[f"depth_{new}"] = tf.repeat("", traj_len)
            else:
                new_obs[f"depth_{new}"] = old_obs[old]
        if state_obs_keys:
            new_obs["proprio"] = tf.concat(
                [
                    tf.zeros((traj_len, 1), tf.float32) if key is None
                    else tf.cast(old_obs[key], tf.float32)
                    for key in state_obs_keys
                ],
                axis=1,
            )
        new_obs["timestep"] = tf.range(traj_len)

        task = {}
        if language_key is not None:
            task["language_instruction"] = tf.cast(traj.pop(language_key), tf.string)

        out = {
            "observation": new_obs,
            "task": task,
            "action": tf.cast(traj["action"], tf.float32),
            "dataset_name": tf.repeat(name, traj_len),
        }
        if absolute_action_mask is not None:
            out["absolute_action_mask"] = tf.tile(
                tf.constant(absolute_action_mask, tf.bool)[None],
                [traj_len, 1],
            )
        return out

    if traj_dataset is None:
        from_tfds = True
        traj_dataset = load_tfds_trajectories(name, data_dir, train, shuffle,
                                              num_parallel_reads)
    else:
        from_tfds = False
    ds = traj_dataset.map(restructure, num_parallel_calls)

    if dataset_statistics is None:
        if statistics_save_path is None and data_dir is not None:
            # sha256-keyed default cache (reference data_utils.py:231-247):
            # key on everything that changes the computed statistics —
            # the standardize fn identity and the schema key maps. NOT the
            # split: stats are computed over split "all" (below) so train
            # and val share one normalization.
            from vla_adapter_tpu.data.normalization import statistics_cache_key

            spec = repr((
                data_dir,
                getattr(standardize_fn, "__name__", repr(standardize_fn)),
                sorted(image_obs_keys.items()), list(state_obs_keys),
            ))
            cache_dir = Path.home() / ".cache" / "vla_adapter_tpu"
            cache_dir.mkdir(parents=True, exist_ok=True)
            statistics_save_path = str(
                cache_dir
                / f"dataset_statistics_{statistics_cache_key(name, spec)}.json"
            )
        # statistics over the FULL dataset (reference get_dataset_statistics
        # uses split='all'): computing them on the selected split would
        # normalize train and val with different q01/q99
        stats_src = ds
        if from_tfds:
            stats_src = load_tfds_trajectories(
                name, data_dir, train, shuffle=False, split="all"
            ).map(restructure, num_parallel_calls)
        dataset_statistics = compute_dataset_statistics(
            stats_src, save_path=statistics_save_path
        )
    elif isinstance(dataset_statistics, str):
        with tf.io.gfile.GFile(dataset_statistics, "r") as f:
            dataset_statistics = json.load(f)

    if action_normalization_mask is not None:
        dataset_statistics["action"]["mask"] = list(action_normalization_mask)

    ds = ds.map(
        partial(_normalize_traj, metadata=dataset_statistics,
                norm_type=action_proprio_normalization_type),
        num_parallel_calls,
    )
    return ds, dataset_statistics


def apply_trajectory_transforms(
    dataset: tf.data.Dataset,
    *,
    train: bool,
    goal_relabeling_strategy: Optional[str] = None,
    goal_relabeling_kwargs: dict = {},
    window_size: int = 1,
    future_action_window_size: int = 0,
    subsample_length: Optional[int] = None,
    skip_unlabeled: bool = False,
    max_action: Optional[float] = None,
    max_proprio: Optional[float] = None,
    task_augment_strategy: Optional[str] = None,
    task_augment_kwargs: dict = {},
    num_parallel_calls=tf.data.AUTOTUNE,
) -> tf.data.Dataset:
    if skip_unlabeled:
        dataset = dataset.filter(
            lambda x: tf.math.reduce_any(x["task"]["language_instruction"] != "")
        )
    if max_action is not None:
        dataset = dataset.filter(
            lambda x: tf.math.reduce_all(tf.abs(x["action"]) <= max_action)
        )
    if max_proprio is not None:
        dataset = dataset.filter(
            lambda x: tf.math.reduce_all(
                tf.abs(x["observation"].get("proprio", 0.0)) <= max_proprio
            )
        )
    dataset = dataset.map(traj_transforms.add_pad_mask_dict, num_parallel_calls)
    if goal_relabeling_strategy is not None:
        dataset = dataset.map(
            partial(getattr(goal_relabeling, goal_relabeling_strategy),
                    **goal_relabeling_kwargs),
            num_parallel_calls,
        )
    if train and task_augment_strategy is not None:
        dataset = dataset.map(
            partial(getattr(task_augmentation, task_augment_strategy),
                    **task_augment_kwargs),
            num_parallel_calls,
        )
    dataset = dataset.map(
        partial(traj_transforms.chunk_act_obs, window_size=window_size,
                future_action_window_size=future_action_window_size),
        num_parallel_calls,
    )
    if train and subsample_length is not None:
        dataset = dataset.map(
            partial(traj_transforms.subsample,
                    subsample_length=subsample_length),
            num_parallel_calls,
        )
    return dataset


def flatten_trajectories(dataset: tf.data.Dataset,
                         num_parallel_calls=tf.data.AUTOTUNE) -> tf.data.Dataset:
    """Trajectories -> frames (dlimp's .flatten())."""
    return dataset.interleave(
        lambda traj: tf.data.Dataset.from_tensor_slices(traj),
        cycle_length=1, block_length=None,
        num_parallel_calls=num_parallel_calls,
    )


def apply_frame_transforms(
    dataset: tf.data.Dataset,
    *,
    train: bool,
    resize_size: Tuple[int, int] = (224, 224),
    image_augment_kwargs: Optional[dict] = None,
    seed: int = 0,
    num_parallel_calls=tf.data.AUTOTUNE,
) -> tf.data.Dataset:
    """Frame-level decode/resize/augment; images keep the window axis."""

    def decode_fn(obs):
        return obs_transforms.decode_and_resize(obs, resize_size)

    dataset = dataset.map(
        lambda fr: _map_obs_window(fr, decode_fn, resize_size),
        num_parallel_calls,
    )
    if train and image_augment_kwargs:
        def aug_fn(fr):
            lang_seed = (
                tf.cast(
                    tf.strings.to_hash_bucket_fast(
                        fr["task"]["language_instruction"], 2 ** 20
                    ),
                    tf.int32,
                )
                if "language_instruction" in fr["task"]
                else tf.constant(seed, tf.int32)
            )
            # stateful per-visit randomness: a seed built ONLY from
            # (timestep, instruction) is identical every epoch and across
            # same-instruction episodes, collapsing augmentation into a
            # fixed preprocessing. The uniform draw varies per visit
            # (reproducible per run via tf.random.set_seed).
            visit = tf.random.uniform([], maxval=2 ** 30, dtype=tf.int32)
            seed_t = tf.stack([
                tf.cast(fr["observation"]["timestep"][0], tf.int32) + visit,
                lang_seed,
            ])
            return _map_obs_window(
                fr,
                lambda o: obs_transforms.augment(o, seed_t, image_augment_kwargs),
                resize_size,
            )

        dataset = dataset.map(aug_fn, num_parallel_calls)
    return dataset


def _map_obs_window(frame, fn, resize_size):
    """Apply an obs-dict fn across the window axis (index 1 of each obs)."""
    obs = frame["observation"]
    window = tf.nest.flatten(obs)[0].shape[0]  # static window size
    # a None here would silently process only slice 0 of a larger window
    assert window is not None, (
        "observation window size must be statically known — chunk with "
        "apply_trajectory_transforms (chunk_act_obs) before frame transforms")
    slices = []
    for w in range(window):
        one = tf.nest.map_structure(lambda x: x[w], obs)
        slices.append(fn(one))
    frame["observation"] = tf.nest.map_structure(
        lambda *xs: tf.stack(xs, 0), *slices
    )
    return frame


def make_single_dataset(
    dataset_kwargs: dict,
    *,
    train: bool,
    traj_transform_kwargs: dict = {},
    frame_transform_kwargs: dict = {},
    shuffle_buffer_size: int = 0,
    seed: int = 0,
) -> Tuple[tf.data.Dataset, Dict]:
    """One dataset -> flat frame dataset (reference :424-453).

    shuffle_buffer_size > 0 (train): repeat + shuffle are applied HERE,
    between flatten and the frame transforms, so the shuffle buffer holds
    small encoded-image frames — shuffling after decode would buffer GBs
    of dense pixel arrays (the interleaved path already orders it this way)."""
    ds, stats = make_dataset_from_rlds(train=train, **dataset_kwargs)
    ds = apply_trajectory_transforms(ds, train=train, **traj_transform_kwargs)
    ds = flatten_trajectories(ds)
    if not train:
        ds = ds.cache()  # validation epochs re-read from memory (reference :449)
    if train and shuffle_buffer_size > 1:
        ds = ds.repeat().shuffle(shuffle_buffer_size, seed=seed)
    ds = apply_frame_transforms(ds, train=train, **frame_transform_kwargs)
    return ds, stats


def allocate_threads(n: Optional[int], weights: np.ndarray) -> np.ndarray:
    """Allocate a thread budget proportionally to mixture weights with a
    floor of 1 (reference data_utils.py:287-316)."""
    if n is None:
        return np.array([tf.data.AUTOTUNE] * len(weights))
    assert n >= len(weights), "not enough threads"
    weights = np.asarray(weights, np.float64)
    weights = weights / weights.sum()
    alloc = np.zeros_like(weights, dtype=int)
    while True:
        mask = (alloc == 0) & (weights * n < 1)
        if not mask.any():
            break
        alloc[mask] = 1
        n -= mask.sum()
        weights[mask] = 0
        if weights.sum() > 0:
            weights = weights / weights.sum()
    fractional = weights * n
    alloc += np.floor(fractional).astype(int)
    remainder = n - int(np.floor(fractional).sum())
    order = np.argsort(fractional - np.floor(fractional))[::-1]
    for i in range(remainder):
        alloc[order[i]] += 1
    return alloc


def make_interleaved_dataset(
    dataset_kwargs_list: List[dict],
    sample_weights: Optional[Sequence[float]] = None,
    *,
    train: bool,
    shuffle_buffer_size: int = 100_000,
    traj_transform_kwargs: dict = {},
    frame_transform_kwargs: dict = {},
    balance_weights: bool = False,
    traj_transform_threads: Optional[int] = None,
    traj_read_threads: Optional[int] = None,
    seed: int = 0,
) -> Tuple[tf.data.Dataset, Dict[str, Dict]]:
    """Weighted mixture over N datasets (reference :454-585).

    Returns (frame dataset, {name: statistics}).
    """
    if sample_weights is None:
        sample_weights = [1.0] * len(dataset_kwargs_list)
    assert len(sample_weights) == len(dataset_kwargs_list)

    # first pass: statistics (needed for balancing)
    all_stats = {}
    for kw in dataset_kwargs_list:
        _, stats = make_dataset_from_rlds(train=train, **kw)
        all_stats[kw["name"]] = stats

    weights = np.asarray(sample_weights, np.float64)
    if balance_weights:
        weights = weights * np.array(
            [all_stats[kw["name"]]["num_transitions"]
             for kw in dataset_kwargs_list]
        )
    weights /= weights.sum()

    threads = allocate_threads(traj_transform_threads, weights)
    read_threads = allocate_threads(traj_read_threads, weights)

    datasets = []
    for kw, n_threads, n_reads in zip(dataset_kwargs_list, threads,
                                      read_threads):
        ds, _ = make_dataset_from_rlds(
            train=train, dataset_statistics=all_stats[kw["name"]],
            num_parallel_reads=(int(n_reads)
                                if n_reads != tf.data.AUTOTUNE
                                else tf.data.AUTOTUNE),
            **{k: v for k, v in kw.items() if k != "dataset_statistics"},
        )
        ds = apply_trajectory_transforms(
            ds.repeat() if train else ds, train=train,
            num_parallel_calls=int(n_threads) if n_threads != tf.data.AUTOTUNE
            else tf.data.AUTOTUNE,
            **traj_transform_kwargs,
        )
        datasets.append(flatten_trajectories(ds))

    dataset = tf.data.Dataset.sample_from_datasets(
        datasets, weights=list(weights), seed=seed,
        stop_on_empty_dataset=train,
    )
    if train and shuffle_buffer_size > 1:
        dataset = dataset.shuffle(shuffle_buffer_size, seed=seed)
    dataset = apply_frame_transforms(dataset, train=train,
                                     **frame_transform_kwargs)
    options = tf.data.Options()
    options.autotune.ram_budget = 1
    dataset = dataset.with_options(options)
    return dataset, all_stats
