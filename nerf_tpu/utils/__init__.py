from .metrics import compute_psnr, psnr
from .logging import TensorBoardLogger, get_exp_name
from .checkpoint import save_checkpoint, load_checkpoint
