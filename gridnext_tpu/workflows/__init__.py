from gridnext_tpu.workflows.pca import (  # noqa: F401
    filtered_norm_logcounts,
    fit_cohort_scaler,
    fit_pca,
    n_pcs_for_variance,
    pca_transform,
    scale_logcounts,
)
from gridnext_tpu.workflows.hvg import (  # noqa: F401
    highly_variable_genes,
    select_hvgs_from_count_files,
)
from gridnext_tpu.workflows.cv import (  # noqa: F401
    CVResult,
    cross_validate,
    grouped_partitions,
    partition_masks,
)
