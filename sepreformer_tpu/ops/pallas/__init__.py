from sepreformer_tpu.ops.pallas.attention import (  # noqa: F401
    flash_relpos_attention,
    relpos_attention_reference,
)
