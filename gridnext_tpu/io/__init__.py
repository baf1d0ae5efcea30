from gridnext_tpu.io.spaceranger import (  # noqa: F401
    find_feature_matrix_files,
    find_position_file,
    read_feature_matrix,
    read_feature_names,
    read_positions,
    read_positions_file,
)
from gridnext_tpu.io.annotations import (  # noqa: F401
    read_annotated_starray,
    read_annotfile,
)
from gridnext_tpu.io.unify import (  # noqa: F401
    prepare_count_files,
    unified_cache_path,
    unified_count_suffix,
)
