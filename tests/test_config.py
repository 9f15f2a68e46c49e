"""Config tree: per-family defaults, TOML loading, env path overrides."""

import os

from ultrasound_modeling_tpu import config as cfg_mod


def test_default_config_families():
    c = cfg_mod.default_config("transunet")
    assert c.model.img_size == (256, 80) and c.model.in_channels == 10
    c = cfg_mod.default_config("resnest_unet")
    assert c.model.img_size == (256, 64) and c.model.in_channels == 6
    assert c.train.loss == "class_balanced" and c.train.eval_every_epochs == 3
    c = cfg_mod.default_config("mobileunet")
    assert c.model.in_channels == 15 and c.train.loss == "pixelcnn"
    c = cfg_mod.default_config("vit")
    assert c.train.l2_regularization == 1e-5


def test_from_toml(tmp_path):
    p = tmp_path / "cfg.toml"
    p.write_text("""
[model]
name = "resnest_unet"
num_classes = 2
img_size = [256, 64]

[train]
batch_size = 8
learning_rate = 1e-3
""")
    c = cfg_mod.from_toml(str(p))
    assert c.model.name == "resnest_unet"
    assert c.model.num_classes == 2
    assert c.model.img_size == (256, 64)
    assert c.train.batch_size == 8
    # untouched sections keep defaults
    assert c.mesh.model == 1


def test_paths_env_override(monkeypatch):
    monkeypatch.setenv("RAW_DATA_PATH", "/somewhere/raw")
    p = cfg_mod.Paths()
    assert p.raw_data == "/somewhere/raw"
    assert p.dataset_dir("bleed").endswith("bleed")


def test_bad_patient_lists_present():
    d = cfg_mod.DataConfig()
    assert 928 in d.bad_patients  # reference: DataFilePlayGround.py:278-279
    assert 8 in d.iph_patients


def test_from_toml_seeds_family_defaults(tmp_path):
    """A TOML naming a model family must start from that family's defaults
    (geometry/loss/optimizer), not the bare dataclass defaults — otherwise
    `--config` checkpoints mismatch `--model` ones."""
    p = tmp_path / "fam.toml"
    p.write_text("[model]\nname = 'mobileunet'\n")
    cfg = cfg_mod.from_toml(str(p))
    assert cfg.model.in_channels == 15
    assert cfg.model.img_size == (256, 64)
    assert cfg.train.loss == "pixelcnn"
    # explicit TOML keys still override the family defaults
    p2 = tmp_path / "fam2.toml"
    p2.write_text("[model]\nname = 'mobileunet'\nin_channels = 10\n")
    assert cfg_mod.from_toml(str(p2)).model.in_channels == 10


def test_registry_train_impl_resolution(monkeypatch):
    """Regression (round 5): the registry must resolve attn_train_impl with
    the TRAIN rule — routing it through the inference resolver silently
    mapped the vit 'auto' default onto the measured-slower 'pallas' train
    kernel on TPU (caught as a 34% step regression in the bench_all
    refresh), and rejects 'flash' outright."""
    import dataclasses as dc
    from types import SimpleNamespace

    from ultrasound_modeling_tpu.config import default_config
    from ultrasound_modeling_tpu.models import common
    from ultrasound_modeling_tpu.models.registry import build_model

    cfg = default_config("vit").model
    # explicit 'flash' passes through (any platform) — BOTH branches that
    # take attn_train_impl (vit here, transunet below)
    m = build_model(dc.replace(cfg, attn_train_impl="flash"))
    assert m.attn_train_impl == "flash"
    tcfg = default_config("transunet").model
    m = build_model(dc.replace(tcfg, attn_train_impl="flash"))
    assert m.attn_train_impl == "flash"

    # 'auto' on a (faked) TPU resolves to flash for TRAIN, pallas for infer
    monkeypatch.setattr(
        common, "jax",
        SimpleNamespace(devices=lambda: [SimpleNamespace(platform="tpu")]))
    m = build_model(dc.replace(cfg, attn_train_impl="auto"))
    assert m.attn_train_impl == "flash", m.attn_train_impl
    assert m.attn_impl == "pallas"
    m = build_model(dc.replace(tcfg, attn_train_impl="auto"))
    assert m.attn_train_impl == "flash", m.attn_train_impl

    # and on CPU both fall back to the composed path
    monkeypatch.setattr(
        common, "jax",
        SimpleNamespace(devices=lambda: [SimpleNamespace(platform="cpu")]))
    m = build_model(dc.replace(cfg, attn_train_impl="auto"))
    assert m.attn_train_impl == "xla"
