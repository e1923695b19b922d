from sepreformer_tpu.models.sepreformer import SepReformer  # noqa: F401
