from sepreformer_tpu.data.audio import read_wav, write_wav  # noqa: F401
from sepreformer_tpu.data.scp import parse_scps  # noqa: F401
from sepreformer_tpu.data.dataset import (  # noqa: F401
    SeparationDataset,
    build_dataloaders,
)
