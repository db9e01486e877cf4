from diner_tpu.eval.metrics import psnr, ssim, mse, l1
from diner_tpu.eval.suite import evaluate_folder, SUFFIXES

__all__ = ["psnr", "ssim", "mse", "l1", "evaluate_folder", "SUFFIXES"]
