from asr_model_tpu.models.registry import get_norm, get_activation
