from diner_tpu.losses.losses import mse_loss, l1_loss, antibias_loss, vgg_perceptual_loss

__all__ = ["mse_loss", "l1_loss", "antibias_loss", "vgg_perceptual_loss"]
