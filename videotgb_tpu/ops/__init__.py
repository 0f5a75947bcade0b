from videotgb_tpu.ops.rope import (
    llama_rope,
    roformer_rope,
    roformer_sincos_table,
)
from videotgb_tpu.ops.span import (
    largest_rectangle_span,
    largest_rectangle_span_np,
    rescale_index,
)
from videotgb_tpu.ops.select import (
    gumbel_span_sample,
    select_frames_from_spans,
    select_frames_reference_np,
)
from videotgb_tpu.ops.attention import (
    dot_product_attention,
    flash_attention,
)

__all__ = [
    "llama_rope",
    "roformer_rope",
    "roformer_sincos_table",
    "largest_rectangle_span",
    "largest_rectangle_span_np",
    "rescale_index",
    "gumbel_span_sample",
    "select_frames_from_spans",
    "select_frames_reference_np",
    "dot_product_attention",
    "flash_attention",
]
