from seedx_tpu.ops.norms import rms_norm  # noqa: F401
from seedx_tpu.ops.rope import apply_rope, rope_cos_sin  # noqa: F401
from seedx_tpu.ops.attention import dot_product_attention  # noqa: F401
