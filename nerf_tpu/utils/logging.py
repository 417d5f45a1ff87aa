"""TensorBoard logging + experiment naming (reference: src/utils.py:79-111).

The scalar tag surface (Train/Loss, Train/PSNR, Validation/PSNR, Final/PSNR,
...) is kept identical to the reference so dashboards carry over.
"""

from __future__ import annotations


def get_exp_name(cfg: dict) -> str:
    from datetime import datetime
    return cfg.get("exp_name", datetime.now().strftime("%Y%m%d_%H%M%S"))


class TensorBoardLogger:
    """Thin SummaryWriter wrapper; degrades to a no-op if TB is missing."""

    def __init__(self, log_dir: str):
        try:
            from torch.utils.tensorboard import SummaryWriter
            self.writer = SummaryWriter(log_dir)
            self.enabled = True
        except Exception:
            print("!!! TensorBoard unavailable; scalar logging disabled")
            self.writer = None
            self.enabled = False

    def log_scalar(self, tag, value, step):
        if self.enabled:
            self.writer.add_scalar(tag, value, step)

    def log_scalars(self, main_tag, tag_scalar_dict, step):
        if self.enabled:
            self.writer.add_scalars(main_tag, tag_scalar_dict, step)

    def close(self):
        if self.enabled:
            self.writer.close()
