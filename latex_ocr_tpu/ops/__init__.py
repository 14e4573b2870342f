from .attention import fused_attention_context

__all__ = ["fused_attention_context"]
