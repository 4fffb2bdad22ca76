from recbox_tpu.models.registry import get_model, list_models, register_model, MODEL_REGISTRY

__all__ = ["get_model", "list_models", "register_model", "MODEL_REGISTRY"]
