from gridnext_tpu.models.layers import HexConv  # noqa: F401
from gridnext_tpu.models.mlp import CountMLP  # noqa: F401
from gridnext_tpu.models.densenet import DenseNet  # noqa: F401
from gridnext_tpu.models.gridnet import GridNet, GridNetHex, GridNetHexMM  # noqa: F401
