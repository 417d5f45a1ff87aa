"""TensorBoard logging + experiment naming (reference: src/utils.py:79-111).

The scalar tag surface (Train/Loss, Train/PSNR, Validation/PSNR, Final/PSNR,
...) is kept identical to the reference so dashboards carry over.
"""

from __future__ import annotations


def get_exp_name(cfg: dict) -> str:
    from datetime import datetime
    return cfg.get("exp_name", datetime.now().strftime("%Y%m%d_%H%M%S"))


class TensorBoardLogger:
    """Thin SummaryWriter wrapper; degrades to a no-op if TB is missing.

    The degradation is LOUD: TensorBoard PSNR logging is a required
    surface (BASELINE.md), so a missing torch/tensorboard install prints
    the import failure at construction and `banner()` keeps the loss
    visible in every recipe's startup banner instead of a silent no-op.
    """

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        try:
            from torch.utils.tensorboard import SummaryWriter
            self.writer = SummaryWriter(log_dir)
            self.enabled = True
        except Exception as e:
            print("!!! TensorBoard unavailable — scalar logging DISABLED "
                  f"(PSNR curves will not be recorded): {e!r}")
            self.writer = None
            self.enabled = False

    def banner(self) -> str:
        """One startup-banner line: the `tensorboard --logdir` hint, or a
        loud warning when logging is degraded to prints."""
        if self.enabled:
            return f">>> tensorboard --logdir={self.log_dir}"
        return (">>> WARNING: TensorBoard logging DISABLED "
                "(torch/tensorboard import failed) — metrics exist only "
                "in this console output")

    def log_scalar(self, tag, value, step):
        if self.enabled:
            self.writer.add_scalar(tag, value, step)

    def log_scalars(self, main_tag, tag_scalar_dict, step):
        if self.enabled:
            self.writer.add_scalars(main_tag, tag_scalar_dict, step)

    def close(self):
        if self.enabled:
            self.writer.close()
