"""Named dataset mixtures (reference rlds/oxe/mixtures.py — 21 mixtures).

Each mixture is [(dataset_name, sampling_weight), ...]. Ships the mixtures
the VLA-Adapter recipes use (single-suite LIBERO/CALVIN + the combined
LIBERO suite) plus a magic-soup-style multi-robot mixture over the
registry subset.
"""

OXE_NAMED_MIXTURES = {
    "libero_spatial_no_noops": [("libero_spatial_no_noops", 1.0)],
    "libero_object_no_noops": [("libero_object_no_noops", 1.0)],
    "libero_goal_no_noops": [("libero_goal_no_noops", 1.0)],
    "libero_10_no_noops": [("libero_10_no_noops", 1.0)],
    "libero_4_task_suites_no_noops": [
        ("libero_spatial_no_noops", 1.0),
        ("libero_object_no_noops", 1.0),
        ("libero_goal_no_noops", 1.0),
        ("libero_10_no_noops", 1.0),
    ],
    "calvin": [("calvin", 1.0)],
    "calvin_abc": [("calvin_abc", 1.0)],
    "bridge": [("bridge_orig", 1.0)],
    "rtx": [
        ("fractal20220817_data", 0.54087122203),
        ("kuka", 0.8341046294),
        ("bridge_orig", 1.0),
        ("taco_play", 2.0),
        ("jaco_play", 1.0),
        ("berkeley_autolab_ur5", 2.0),
        ("roboturk", 2.0),
        ("viola", 2.0),
        ("toto", 1.0),
    ],
    "oxe_magic_soup_subset": [
        ("fractal20220817_data", 0.54087122203),
        ("kuka", 0.8341046294),
        ("bridge_orig", 1.0),
        ("taco_play", 2.0),
        ("jaco_play", 1.0),
        ("berkeley_autolab_ur5", 2.0),
        ("roboturk", 2.0),
        ("viola", 2.0),
        ("toto", 1.0),
        ("stanford_hydra_dataset_converted_externally_to_rlds", 2.0),
        ("austin_buds_dataset_converted_externally_to_rlds", 1.0),
    ],
}
