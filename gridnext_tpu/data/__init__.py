from gridnext_tpu.data.datasets import (  # noqa: F401
    CountGridDataset,
    CountSpotDataset,
    MMSpotDataset,
    MMStackDataset,
    PatchGridDataset,
    PatchSpotDataset,
    Subset,
    create_visium_dataset,
    load_count_dataset,
    load_count_grid_dataset,
)
from gridnext_tpu.data.dense_ingest import DenseWSIGridDataset  # noqa: F401
from gridnext_tpu.data.simulate import simulate_spaceranger_dir  # noqa: F401
from gridnext_tpu.data.template import (  # noqa: F401
    visium_v1_barcode_grid,
    visium_v1_scalefactors,
    visium_v1_template,
)
