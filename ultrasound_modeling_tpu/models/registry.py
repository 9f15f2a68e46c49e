"""Model zoo keyed by config name.

The five reference families (SURVEY.md §2.1 rows 8-15):
  transunet     — ResNeSt-hybrid TransUNet (reference: VisionTransformer.py)
  resnest_unet  — standalone ResNeSt U-Net (reference: TBI_ResNest.py)
  vit           — pure ViT segmenter (reference: TBI_Transformer.py)
  swin          — Swin backbone + segmentation head (reference: SwinTransformer.py)
  mobileunet    — MobileNetV2 U-Net (reference: TBIPixelCNN.py)
"""

from __future__ import annotations

from ultrasound_modeling_tpu.config import ModelConfig


def _resolve_impl(impl: str) -> str:
    """Resolve 'auto' per platform (see models.common.resolve_attn_impl).
    The models now resolve 'auto' themselves at their gates; this stays so
    registry-built models carry the resolved literal (cheaper than
    re-resolving at every trace) and for older callers."""
    from ultrasound_modeling_tpu.models.common import resolve_attn_impl
    return resolve_attn_impl(impl)


def _resolve_train_impl(impl: str) -> str:
    """TRAIN-path resolution — a DIFFERENT rule from the inference one
    ('auto' -> flash on TPU, not pallas).  Routing attn_train_impl through
    _resolve_impl here silently mapped the vit 'auto' default onto the
    measured-slower round-4 'pallas' kernel (caught by the round-5
    bench_all refresh: 68.8 ms/step vs flash's 51.2)."""
    from ultrasound_modeling_tpu.models.common import resolve_attn_train_impl
    return resolve_attn_train_impl(impl)


def build_model(cfg: ModelConfig, pp_mesh=None, pp_micro: int = 0):
    name = cfg.name
    if name == "transunet":
        from ultrasound_modeling_tpu.models.transunet import TransUNet
        return TransUNet(
            num_classes=cfg.num_classes, hidden_size=cfg.hidden_size,
            num_heads=cfg.num_heads, num_layers=cfg.num_layers,
            mlp_dim=cfg.mlp_dim, grid=tuple(cfg.grid), radix=cfg.radix,
            kpaths=cfg.kpaths, ksize=cfg.ksize,
            dropout_rate=cfg.dropout_rate, remat=cfg.remat,
            remat_conv=cfg.remat_conv,
            attn_impl=_resolve_impl(cfg.attn_impl),
            attn_train_impl=_resolve_train_impl(
                getattr(cfg, "attn_train_impl", "xla")),
            pp_mesh=pp_mesh, pp_micro=pp_micro)
    if pp_mesh is not None:
        raise ValueError(f"pipeline parallelism requires the scanned "
                         f"transformer stack (model 'transunet'), got {name!r}")
    if name == "resnest_unet":
        from ultrasound_modeling_tpu.models.resnest import ResNeStUNet
        return ResNeStUNet(num_classes=cfg.num_classes, ksize=cfg.ksize,
                           radix=cfg.radix, kpaths=cfg.kpaths,
                           remat=cfg.remat_conv)
    if name == "vit":
        from ultrasound_modeling_tpu.models.vit import ViTSegmenter
        return ViTSegmenter(
            num_classes=cfg.num_classes, hidden_size=cfg.vit_hidden,
            num_heads=cfg.vit_heads, num_layers=cfg.vit_layers,
            grid=tuple(cfg.vit_grid), img_size=tuple(cfg.img_size),
            mlp_dim=cfg.mlp_dim, dropout_rate=cfg.dropout_rate,
            learned_pos=cfg.vit_learned_pos,
            conv_stem=getattr(cfg, "vit_conv_stem", False),
            attn_impl=_resolve_impl(cfg.attn_impl),
            attn_train_impl=_resolve_train_impl(
                getattr(cfg, "attn_train_impl", "xla")))
    if name == "swin":
        from ultrasound_modeling_tpu.models.swin import SwinSegmenter
        return SwinSegmenter(
            num_classes=cfg.num_classes, img_size=tuple(cfg.img_size),
            embed_dim=cfg.swin_embed_dim, depths=tuple(cfg.swin_depths),
            num_heads=tuple(cfg.swin_heads), window=tuple(cfg.window),
            drop_path_rate=cfg.drop_path_rate,
            attn_impl=_resolve_impl(cfg.swin_attn_impl))
    if name == "mobileunet":
        from ultrasound_modeling_tpu.models.mobileunet import MobileUNet
        return MobileUNet(num_classes=cfg.num_classes)
    raise KeyError(f"unknown model {name!r}")


MODEL_NAMES = ("transunet", "resnest_unet", "vit", "swin", "mobileunet")
