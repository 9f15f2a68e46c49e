from ultrasound_modeling_tpu.models import registry  # noqa: F401
from ultrasound_modeling_tpu.models.registry import build_model  # noqa: F401
