from ultrasound_modeling_tpu.parallel import mesh  # noqa: F401
