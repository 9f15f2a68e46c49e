from ultrasound_modeling_tpu.data import labels, augment, pipeline, synthetic  # noqa: F401
