from uwudiff_tpu.ops.attention import (
    attention_bias_from_mask,
    dot_product_attention,
)

__all__ = ["dot_product_attention", "attention_bias_from_mask"]
