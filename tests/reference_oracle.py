"""Load the reference PyTorch model as a numerical oracle for parity tests.

The reference tree (read-only at /root/reference) is imported in-process
with its missing optional deps (loguru) stubbed.  Used ONLY as an oracle:
we instantiate its model with random weights, convert them with
sepreformer_tpu.models.convert, and assert allclose on the outputs.
"""

import importlib
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub_loguru():
    if "loguru" in sys.modules:
        return
    mod = types.ModuleType("loguru")

    class _Logger:
        def opt(self, **kw):
            return self

        def log(self, *a, **kw):
            pass

        def __getattr__(self, name):
            return lambda *a, **kw: None

    mod.logger = _Logger()
    sys.modules["loguru"] = mod


def load_reference_model_class(variant: str = "SepReformer_Base_WSJ0"):
    """Import models.<variant>.model.Model from the reference tree.

    Returns None if the import fails (torch or reference unavailable).
    """
    _stub_loguru()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    try:
        mod = importlib.import_module(f"models.{variant}.model")
        return mod.Model
    except Exception:
        return None


def build_reference_model(variant: str = "SepReformer_Base_WSJ0", seed: int = 0):
    """Instantiate the reference model from its own configs.yaml."""
    import torch
    import yaml

    cls = load_reference_model_class(variant)
    if cls is None:
        return None, None
    with open(f"{REFERENCE_ROOT}/models/{variant}/configs.yaml") as f:
        cfg = yaml.full_load(f)["config"]
    torch.manual_seed(seed)
    model = cls(**cfg["model"])
    model.eval()
    return model, cfg
