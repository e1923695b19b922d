from sepreformer_tpu.ops.framing import (  # noqa: F401
    frame_signal,
    encoder_conv,
    decoder_overlap_add,
)
from sepreformer_tpu.ops.resample import (  # noqa: F401
    adaptive_avg_pool_time,
    nearest_upsample_time,
)
from sepreformer_tpu.ops.stft import stft_magnitude, make_stft_kernel  # noqa: F401
