from sepreformer_tpu.utils.summary import model_summary  # noqa: F401
from sepreformer_tpu.utils.tracing import profile_trace, trace_calls  # noqa: F401
