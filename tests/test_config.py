"""Config engine tests: the CLI contract the reference exercises
(README.md:66-91, assets/slurm/1_train.sh:29-74)."""

import pytest

from deflow_tpu.config import Config, ConfigError, compose, parse_value


def test_defaults_compose_deflow():
    cfg = compose("config", [])
    assert cfg.model.name == "deflow"
    assert cfg.model.target.decoder_option == "gru"
    assert cfg.model.target.num_iters == 4
    assert cfg.model.target.grid_feature_size == [512, 512]
    assert cfg.voxel_size == [0.2, 0.2, 6]
    assert cfg.point_cloud_range == [-51.2, -51.2, -3, 51.2, 51.2, 3]


def test_leaderboard_train_command():
    # python train.py model=deflow lr=2e-4 epochs=15 batch_size=16 loss_fn=deflowLoss
    cfg = compose("config", ["model=deflow", "lr=2e-4", "epochs=15",
                             "batch_size=16", "loss_fn=deflowLoss"])
    assert cfg.lr == pytest.approx(2e-4)
    assert isinstance(cfg.lr, float)
    assert cfg.epochs == 15
    assert cfg.batch_size == 16
    assert cfg.loss_fn == "deflowLoss"


def test_group_swap_fastflow3d():
    cfg = compose("config", ["model=fastflow3d", "lr=4e-5", "epochs=20"])
    assert cfg.model.name == "fastflow3d"
    assert cfg.model.target.decoder_option == "linear"


def test_nested_override():
    # "model.target.num_iters=2" (1_train.sh:42)
    cfg = compose("config", ["model=deflow", "model.target.num_iters=2"])
    assert cfg.model.target.num_iters == 2


def test_list_override_and_interpolation():
    # "voxel_size=[0.1, 0.1, 6]" (1_train.sh:74) propagates into model.target
    cfg = compose("config", ["voxel_size=[0.1, 0.1, 6]"])
    assert cfg.voxel_size == [0.1, 0.1, 6]
    assert cfg.model.target.voxel_size == [0.1, 0.1, 6]


def test_dataset_path_interpolation():
    cfg = compose("config", ["dataset_path=/tmp/av2/sensor"])
    assert cfg.train_data == "/tmp/av2/sensor/train"
    assert cfg.val_data == "/tmp/av2/sensor/val"


def test_unknown_key_rejected_plus_key_added():
    with pytest.raises(ConfigError):
        compose("config", ["not_a_real_key=1"])
    cfg = compose("config", ["+not_a_real_key=1"])
    assert cfg.not_a_real_key == 1


def test_parse_value_typing():
    assert parse_value("2e-4") == pytest.approx(2e-4)
    assert parse_value("15") == 15
    assert parse_value("true") is True
    assert parse_value("null") is None
    assert parse_value("[0.1, 0.2, 6]") == [0.1, 0.2, 6]
    assert parse_value("deflowLoss") == "deflowLoss"


def test_eval_command_keys():
    # python eval.py checkpoint=... av2_mode=test leaderboard_version=1 (README.md:90)
    cfg = compose("config", ["checkpoint=/tmp/deflow_best.ckpt",
                             "av2_mode=test", "leaderboard_version=1"])
    assert cfg.checkpoint == "/tmp/deflow_best.ckpt"
    assert cfg.av2_mode == "test"
    assert cfg.leaderboard_version == 1


def test_config_node_api():
    c = Config({"a": {"b": 1}})
    assert c.a.b == 1
    assert c.select("a.b") == 1
    assert c.select("a.zz", default=7) == 7
    c.update_path("a.b", 2)
    assert c.a.b == 2
    assert c.to_dict() == {"a": {"b": 2}}
