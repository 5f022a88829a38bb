from mimo_tpu.conjugate.families import (
    Family, gaussian_family, diag_gaussian_family,
    linear_family, diag_linear_family,
    product_family, tied_family, ilr_family, hier_gaussian_family,
)
