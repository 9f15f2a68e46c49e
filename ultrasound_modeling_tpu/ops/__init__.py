from ultrasound_modeling_tpu.ops import attention, ksac, window_attn  # noqa: F401
