"""RLDS data-engine tests on synthetic in-memory trajectory datasets.

Covers: restructure + normalization, chunk_act_obs semantics (history
floor, future clamp, tail truncation — golden-checked against the
reference formula), interleaved mixtures, frame transforms, the OXE
factory contracts, and the full pipeline feeding a train step.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from vla_adapter_tpu.core.constants import NormalizationType
from vla_adapter_tpu.data.rlds.dataset import (
    allocate_threads,
    apply_frame_transforms,
    apply_trajectory_transforms,
    flatten_trajectories,
    make_dataset_from_rlds,
    make_interleaved_dataset,
)
from vla_adapter_tpu.data.rlds.oxe.materialize import (
    get_oxe_dataset_kwargs_and_weights,
    make_oxe_dataset_kwargs,
)


def _synthetic_traj_dataset(num_trajs=3, traj_len=12, seed=0,
                            with_lang=True):
    """Raw (pre-standardize) LIBERO-like trajectories."""
    rng = np.random.default_rng(seed)
    trajs = []
    for t in range(num_trajs):
        L = traj_len + t  # variable lengths
        img = rng.integers(0, 255, size=(L, 32, 32, 3), dtype=np.uint8)
        encoded = [tf.io.encode_jpeg(img[i]).numpy() for i in range(L)]
        trajs.append({
            "observation": {
                "image": np.array(encoded, dtype=object),
                "wrist_image": np.array(encoded, dtype=object),
                "state": rng.normal(size=(L, 8)).astype(np.float32),
            },
            "action": np.concatenate([
                rng.normal(size=(L, 6)),
                rng.integers(0, 2, size=(L, 1)),
            ], axis=1).astype(np.float32),
            "language_instruction": np.array(
                [b"pick up the cup" if with_lang else b""] * L, dtype=object
            ),
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


def _libero_kwargs(**over):
    kw = make_oxe_dataset_kwargs(
        "libero_spatial_no_noops", "/nonexistent",
        load_camera_views=("primary", "wrist"),
    )
    kw["traj_dataset"] = _synthetic_traj_dataset()
    kw.update(over)
    return kw


def test_restructure_and_normalize():
    ds, stats = make_dataset_from_rlds(train=True, **_libero_kwargs())
    traj = next(iter(ds.as_numpy_iterator()))
    assert set(traj["observation"].keys()) >= {
        "image_primary", "image_wrist", "proprio", "timestep"
    }
    assert traj["observation"]["proprio"].shape[-1] == 8  # 6 EEF + 2 gripper
    assert traj["task"]["language_instruction"][0] == b"pick up the cup"
    # actions normalized: first 6 dims in [-1,1]; gripper dim NOT normalized
    assert np.abs(traj["action"][:, :6]).max() <= 1.0 + 1e-6
    assert set(np.unique(traj["action"][:, 6])) <= {0.0, 1.0}
    assert stats["action"]["mask"] == [True] * 6 + [False]
    assert traj["absolute_action_mask"].shape[-1] == 7


def test_chunk_act_obs_reference_semantics():
    """Golden-check the chunk indices against the reference formula:
    window=1, future=7; frame i gets actions [i..i+7] clamped to L-1, and
    the trajectory is truncated to L-7 frames."""
    ds, _ = make_dataset_from_rlds(train=True, **_libero_kwargs())
    raw = next(iter(ds.as_numpy_iterator()))
    L = raw["action"].shape[0]

    chunked = apply_trajectory_transforms(
        ds, train=True, window_size=1, future_action_window_size=7,
        skip_unlabeled=True,
    )
    traj = next(iter(chunked.as_numpy_iterator()))
    eff = L - 7
    assert traj["action"].shape == (eff, 8, 7)
    assert traj["observation"]["image_primary"].shape[0] == eff
    assert traj["observation"]["image_primary"].shape[1] == 1  # window axis
    # chunk content: frame i action j == raw action min(i+j, L-1)
    for i in (0, eff - 1):
        for j in (0, 3, 7):
            np.testing.assert_array_equal(
                traj["action"][i, j], raw["action"][min(i + j, L - 1)]
            )
    assert traj["observation"]["pad_mask"].shape == (eff, 1)
    assert traj["observation"]["pad_mask"].all()  # window=1: no history pad


def test_skip_unlabeled_filters():
    kw = _libero_kwargs(traj_dataset=_synthetic_traj_dataset(with_lang=False))
    ds, _ = make_dataset_from_rlds(train=True, **kw)
    out = apply_trajectory_transforms(ds, train=True, skip_unlabeled=True)
    assert len(list(out.as_numpy_iterator())) == 0


def test_frame_transforms_decode_and_augment():
    ds, _ = make_dataset_from_rlds(train=True, **_libero_kwargs())
    ds = apply_trajectory_transforms(
        ds, train=True, window_size=1, future_action_window_size=7
    )
    frames = apply_frame_transforms(
        flatten_trajectories(ds), train=True, resize_size=(64, 64),
        image_augment_kwargs={
            "random_resized_crop": {"scale": [0.9, 0.9], "ratio": [1.0, 1.0]},
            "random_brightness": [0.2],
            "random_contrast": [0.8, 1.2],
            "random_saturation": [0.8, 1.2],
            "random_hue": [0.05],
            "augment_order": [
                "random_resized_crop", "random_brightness", "random_contrast",
                "random_saturation", "random_hue",
            ],
        },
    )
    frame = next(iter(frames.as_numpy_iterator()))
    assert frame["observation"]["image_primary"].shape == (1, 64, 64, 3)
    assert frame["observation"]["image_primary"].dtype == np.uint8
    assert frame["action"].shape == (8, 7)


def test_interleaved_mixture_balancing():
    kwargs_list = [
        _libero_kwargs(),
        dict(_libero_kwargs(traj_dataset=_synthetic_traj_dataset(seed=1)),
             name="libero_object_no_noops"),
    ]
    ds, stats = make_interleaved_dataset(
        kwargs_list, [1.0, 1.0], train=True, shuffle_buffer_size=2,
        traj_transform_kwargs=dict(window_size=1, future_action_window_size=7,
                                   skip_unlabeled=True),
        frame_transform_kwargs=dict(resize_size=(32, 32)),
    )
    names = [f["dataset_name"].decode()
             for f in ds.take(40).as_numpy_iterator()]
    assert set(names) == {"libero_spatial_no_noops", "libero_object_no_noops"}
    assert set(stats.keys()) == {"libero_spatial_no_noops",
                                 "libero_object_no_noops"}


def test_allocate_threads():
    out = allocate_threads(10, np.array([0.5, 0.3, 0.2]))
    assert out.sum() == 10 and (out >= 1).all()
    out = allocate_threads(3, np.array([0.9, 0.05, 0.05]))
    assert out.sum() == 3 and (out >= 1).all()


def test_oxe_factory_contracts():
    kws, weights = get_oxe_dataset_kwargs_and_weights(
        "/data", "libero_4_task_suites_no_noops",
        load_camera_views=("primary", "wrist"),
    )
    assert len(kws) == 4 and weights == [1.0] * 4
    for kw in kws:
        assert kw["absolute_action_mask"] == [False] * 6 + [True]
        assert kw["action_normalization_mask"] == [True] * 6 + [False]
        assert kw["language_key"] == "language_instruction"
        assert callable(kw["standardize_fn"])
    with pytest.raises(ValueError):
        make_oxe_dataset_kwargs("kuka", "/data",
                                load_camera_views=("left_wrist",))


def test_oxe_registry_full_catalog():
    """Every registered dataset has a standardization transform, every
    mixture member is registered, and the catalog covers the reference's
    inventory scale (77 datasets / 23+ mixtures)."""
    from vla_adapter_tpu.data.rlds.oxe.configs import OXE_DATASET_CONFIGS
    from vla_adapter_tpu.data.rlds.oxe.mixtures import OXE_NAMED_MIXTURES
    from vla_adapter_tpu.data.rlds.oxe.transforms import (
        OXE_STANDARDIZATION_TRANSFORMS,
    )

    assert len(OXE_DATASET_CONFIGS) >= 77
    assert len(OXE_NAMED_MIXTURES) >= 23
    missing = set(OXE_DATASET_CONFIGS) - set(OXE_STANDARDIZATION_TRANSFORMS)
    assert not missing, missing
    for name, entries in OXE_NAMED_MIXTURES.items():
        for ds, w in entries:
            assert ds in OXE_DATASET_CONFIGS, (name, ds)
            assert w > 0
    for name, cfg in OXE_DATASET_CONFIGS.items():
        assert "image_obs_keys" in cfg and "action_encoding" in cfg, name


def test_full_pipeline_to_train_batches():
    """RLDS frames -> VLABatchTransform -> collate -> model batch shapes."""
    import dataclasses

    from tests.test_train_step import TINY_CFG
    from vla_adapter_tpu.data.action_tokenizer import ActionTokenizer
    from vla_adapter_tpu.data.image_processing import image_processor_for
    from vla_adapter_tpu.data.rlds_dataset import RLDSDataset
    from vla_adapter_tpu.data.tokenization import MockTokenizer
    from vla_adapter_tpu.data.transform import VLABatchTransform

    cfg = dataclasses.replace(TINY_CFG, max_text_tokens=96)
    tok = MockTokenizer()
    transform = VLABatchTransform(
        cfg, lambda t: tok(t).input_ids, ActionTokenizer(len(tok)),
        image_processor=image_processor_for(cfg.vision),
    )
    ds = RLDSDataset(
        cfg, transform, [_libero_kwargs()], batch_size=2, train=True,
        image_aug=False, shuffle_buffer_size=2,
    )
    it = iter(ds)
    batch = next(it)
    consts = cfg.constants
    assert batch["input_ids"].shape == (2, 96)
    assert batch["pixel_values"].shape == (2, 2, 28, 28, 3)
    assert batch["actions"].shape == (2, consts.num_actions_chunk, 7)
    assert batch["proprio"].shape == (2, 8)
    assert (batch["actions"][:, :, :6] <= 1).all()


def test_episodic_dataset_reassembles_trajectories():
    """EpisodicRLDSDataset yields whole episodes (lists of per-frame
    transformed examples), split on the timestep-reset boundary."""
    import dataclasses

    from tests.test_train_step import TINY_CFG
    from vla_adapter_tpu.data.action_tokenizer import ActionTokenizer
    from vla_adapter_tpu.data.image_processing import image_processor_for
    from vla_adapter_tpu.data.rlds_dataset import EpisodicRLDSDataset
    from vla_adapter_tpu.data.tokenization import MockTokenizer
    from vla_adapter_tpu.data.transform import VLABatchTransform

    cfg = dataclasses.replace(TINY_CFG, max_text_tokens=96)
    tok = MockTokenizer()
    transform = VLABatchTransform(
        cfg, lambda t: tok(t).input_ids, ActionTokenizer(len(tok)),
        image_processor=image_processor_for(cfg.vision),
    )
    ds = EpisodicRLDSDataset(
        cfg, transform,
        [_libero_kwargs(traj_dataset=_synthetic_traj_dataset(
            num_trajs=3, traj_len=10))],
        train=False, image_aug=False,
    )
    episodes = list(iter(ds))
    assert len(episodes) == 3
    # fixture episodes are 10/11/12 frames; chunk_act_obs keeps
    # traj_len - future_action_window_size (= chunk-1 = 7) frames — the
    # reference drops tail frames whose chunks would be mostly padding
    assert sorted(len(e) for e in episodes) == [3, 4, 5]
    ex = episodes[0][0]
    consts = cfg.constants
    assert ex["actions"].shape == (consts.num_actions_chunk, 7)
    assert ex["pixel_values"].shape == (2, 28, 28, 3)
