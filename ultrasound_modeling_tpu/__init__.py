"""ultrasound_modeling_tpu — a TPU-native (JAX/XLA/Pallas) framework for
TBI ultrasound brain segmentation.

A ground-up rebuild of the capabilities of ``silverlight6/Ultrasound_Modeling``
(a TF2/Keras research stack), re-designed for TPU hardware:

* all compute-path code is JAX (``jit``-compiled, XLA-fused, MXU-friendly),
* the hot inner ops (window attention, kernel-sharing atrous conv,
  split-attention) ship with Pallas TPU kernels plus XLA-composed fallbacks,
* data augmentation runs on device, vmapped over the batch (the reference ran
  O(H*W) Python pixel loops per sample — its #1 CPU hot spot),
* scaling is expressed over a ``jax.sharding.Mesh`` with XLA collectives
  (the reference used ``tf.distribute.MirroredStrategy``/NCCL).

Layout:
  config     — typed configuration tree (paths, model, data, train, mesh)
  data       — labels / augment / pipeline / synthetic / etl
  ops        — convs, attention, window attention, KSAC, split attention
  models     — ResNeSt-UNet, TransUNet, ViT, Swin, MobileUNet (+ registry)
  parallel   — mesh construction, sharding rules, collectives
  train      — losses, metrics, optimizer schedules, train/eval steps, loop
  infer      — batch inference (brain-mask cascade) and polar-cone rendering
  utils      — checkpointing, metric logging
"""

__version__ = "0.1.0"
