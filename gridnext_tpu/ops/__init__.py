from gridnext_tpu.ops.hexconv import hex_conv, hex_conv_reference  # noqa: F401
from gridnext_tpu.ops.hexcorrector_pallas import (  # noqa: F401
    fold_corrector_params,
    fused_hex_corrector,
)
from gridnext_tpu.ops.denseblock_pallas import (  # noqa: F401
    build_densenet_fused_infer,
    fused_dense_block,
)
from gridnext_tpu.ops.patch_gather_pallas import (  # noqa: F401
    PackedWSI,
    gather_patches,
    pack_wsi,
)
from gridnext_tpu.ops import favor  # noqa: F401
