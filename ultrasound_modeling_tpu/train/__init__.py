from ultrasound_modeling_tpu.train import losses, metrics, optim  # noqa: F401
