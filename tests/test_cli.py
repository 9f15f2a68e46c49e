"""CLI unit tests: config building from flags and TOML (no device work)."""

import argparse

from ultrasound_modeling_tpu import cli


def _args(**kw):
    defaults = dict(model="transunet", num_classes=3, batch_size=None,
                    seed=0, log_dir="logs", ckpt=None, synthetic=True,
                    train_data=None, val_data=None, n_devices=None,
                    bf16=False, config=None, resume=False, profile=None)
    defaults.update(kw)
    return argparse.Namespace(**defaults)


def test_build_config_flags():
    cfg = cli.build_config(_args(model="resnest_unet", batch_size=4,
                                 num_classes=2, bf16=True))
    assert cfg.model.name == "resnest_unet"
    assert cfg.model.num_classes == 2
    assert cfg.model.compute_dtype == "bfloat16"
    assert cfg.train.batch_size == 4


def test_build_config_toml(tmp_path):
    p = tmp_path / "c.toml"
    p.write_text("[train]\nbatch_size = 3\n[model]\nname = 'vit'\n")
    cfg = cli.build_config(_args(config=str(p), model="ignored"))
    assert cfg.model.name == "vit"
    assert cfg.train.batch_size == 3


def test_parser_subcommands():
    # argparse wiring: every subcommand parses its minimal flags
    parser_probe = [
        ["train", "--model", "vit", "--synthetic"],
        ["eval", "--model", "swin"],
        ["infer", "--out", "/tmp/x"],
        ["etl", "--raw", "/r", "--out", "/o", "--objective", "iph"],
        ["bench"],
    ]
    import ultrasound_modeling_tpu.cli as c
    # build the parser without executing commands
    import unittest.mock as mock
    for argv in parser_probe:
        with mock.patch.object(c, "cmd_train"), \
                mock.patch.object(c, "cmd_eval"), \
                mock.patch.object(c, "cmd_infer"), \
                mock.patch.object(c, "cmd_etl"), \
                mock.patch.object(c, "cmd_bench"):
            try:
                c.main(argv)
            except SystemExit as e:  # argparse error -> nonzero
                assert e.code in (0, None), argv
