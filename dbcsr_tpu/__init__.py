"""dbcsr_tpu — TPU-native distributed block-sparse matrix & tensor library.

A brand-new JAX/XLA/Pallas implementation of the capabilities of cp2k/dbcsr
(see SURVEY.md for the reference analysis and ARCHITECTURE.md for the
design). Public API mirrors the reference's Fortran/C API surface
(``src/dbcsr_api.F``) in Python-first form.
"""
import os as _os

# DBCSR_PLATFORM=cpu|tpu selects the JAX backend for every entry point
# that imports this package (bench.py, dbcsr_tpu.perf, dbcsr_tpu.autotune,
# inline validate drives, ...). A dedicated variable because this
# environment pins JAX_PLATFORMS=axon at a layer below env overrides
# (the axon sitecustomize re-registers the platform), and because
# honoring JAX_PLATFORMS here would clobber callers that already chose a
# backend via jax.config.update (tests/conftest.py). Only consulted when
# explicitly set; must run before first backend use, hence at import.
if _os.environ.get("DBCSR_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["DBCSR_PLATFORM"])

from .block.bcsr import (
    BCSRBuilder,
    BCSRMatrix,
    SYM_ANTISYMMETRIC,
    SYM_HERMITIAN,
    SYM_NONE,
    SYM_SYMMETRIC,
)
from .block.index import (
    BCSRIndex,
    build_index,
    convert_offsets_to_sizes,
    convert_sizes_to_offsets,
    merge_index,
)
from .core import (
    Config,
    DbcsrError,
    config_override,
    finalize_lib,
    get_config,
    init_lib,
    print_config,
    print_statistics,
    set_config,
    timed,
    timer_report,
)
from .mm.engine import multiply
from .mm.filtered import FilteredExecutor, build_filtered_executor
from .mm.reorder import locality_block_permutation, permute_blocks
from .ops.arithmetic import (
    ELEMENT_FUNCTIONS,
    add,
    add_on_diag,
    crop,
    dot,
    filter_blocks,
    function_of_elements,
    get_block_diag,
    get_diag,
    hadamard_product,
    scale,
    scale_by_vector,
    set_diag,
    set_value,
    trace,
    triu,
    zero,
)
from .ops.norms import (
    block_norms,
    block_norms_sq,
    norm_column,
    norm_frobenius,
    norm_gershgorin,
    norm_maxabs,
)
from .ops.csr import csr_write, from_csr, to_csr, to_csr_filter
from .ops.io import (
    binary_read,
    binary_write,
    checksum,
    get_info,
    get_stored_coordinates,
    print_block_sum,
    print_matrix,
    verify_matrix,
)
from .ops.random import random_block_sizes, random_dist_vector, random_matrix
from .ops.transform import (
    copy,
    desymmetrize,
    distribute,
    make_dense,
    make_undense,
    may_be_dense,
    redistribute,
    replicate_all,
    retile,
    sum_replicated,
    transpose,
)
from . import tas, tensors, testing
from .tas import TASMatrix, tas_multiply
from .tensors import NDMapping, Tensor, TensorBuilder, contract

__version__ = "0.1.0"
