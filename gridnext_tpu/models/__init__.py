from gridnext_tpu.models.layers import HexConv  # noqa: F401
from gridnext_tpu.models.mlp import CountMLP  # noqa: F401
from gridnext_tpu.models.densenet import DenseNet  # noqa: F401
from gridnext_tpu.models.gridnet import (  # noqa: F401
    ConcatGridNet, GridNet, GridNetHex, GridNetHexMM, GridNetMM)
from gridnext_tpu.models.densenet import densenet121  # noqa: F401
from gridnext_tpu.models.tpu_f import TpuPatchClassifier  # noqa: F401
from gridnext_tpu.models.performer import Performer, PerformerLM, redraw_projections  # noqa: F401
from gridnext_tpu.models.scbert import scBERT, preprocess_scbert  # noqa: F401
from gridnext_tpu.models.graph import HexGCN, graph_node_loss  # noqa: F401
