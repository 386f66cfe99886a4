from .attention import dot_product_attention, AttentionBackend

__all__ = ["dot_product_attention", "AttentionBackend"]
