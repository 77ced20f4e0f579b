"""Config invariants, incl. the resolution-aware fusion-layer default.

The reference hard-codes ``--layer 3`` at its 256-grid (32x32 fusion maps,
SURVEY.md §4.1). ``default_fusion_layer`` preserves that *physical* resolution
on smaller grids instead of the layer index — the root-cause fix for the
occluded-regime result where 8x8 fusion at 64-grid lost to no collaboration
(docs/benchmarking.md).
"""

from disconet_tpu.config import Config, default_fusion_layer, tiny_config


def test_default_fusion_layer_reference_grid_keeps_layer3():
    assert default_fusion_layer(256) == 3  # 32x32 fusion map, reference index


def test_default_fusion_layer_small_grids_keep_16px_fusion_map():
    for grid in (32, 64, 128, 256, 512):
        layer = default_fusion_layer(grid)
        assert layer <= 3  # never exceed the reference index
        assert grid // 2 ** layer >= 16  # fusion map floor
    assert default_fusion_layer(64) == 2
    assert default_fusion_layer(128) == 3
    assert default_fusion_layer(16) == 0  # degenerate floor: fuse at stride 1


def test_fusion_stride_and_channels_track_fusion_layer():
    cfg = tiny_config(64, fusion_layer=2)
    assert cfg.fusion_stride == 4
    assert cfg.fusion_channels == cfg.backbone_channels[2]
    ref = Config()
    assert ref.fusion_layer == 3 and ref.fusion_stride == 8


def test_det_cli_layer_default_resolves_by_grid():
    # load by absolute path under a unique module name: a cwd-relative
    # sys.path entry broke invocation from outside the repo root, and the
    # bare name 'train_codet' would collide with tools/seg's CLI of the
    # same filename in sys.modules (ADVICE r3)
    import importlib.util
    import os
    import sys

    path = os.path.join(os.path.dirname(__file__), "..", "tools", "det",
                        "train_codet.py")
    spec = importlib.util.spec_from_file_location("det_train_codet_cli", path)
    train_mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = train_mod
    spec.loader.exec_module(train_mod)
    args = train_mod.parse_args(["--data", "/nonexistent", "--grid", "64"])
    assert args.layer == 2
    args = train_mod.parse_args(["--data", "/nonexistent"])  # 256 grid
    assert args.layer == 3
    args = train_mod.parse_args(["--data", "/nonexistent", "--grid", "64",
                                 "--layer", "3"])  # explicit wins
    assert args.layer == 3
