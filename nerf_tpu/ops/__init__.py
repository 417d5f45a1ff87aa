from .fourier import fourier_encode, fourier_out_dim
from .mlp import linear_init, linear_apply, mlp_init, mlp_apply
from .hashgrid import (
    HashGridSpec,
    hash_grid_init,
    hash_encode,
)
from .volume import sample_stratified, composite
