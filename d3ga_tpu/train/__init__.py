from d3ga_tpu.train.losses import l1_loss, l2_loss, ssim, psnr, bce_loss  # noqa: F401
from d3ga_tpu.train.optim import make_optimizer, multistep_schedule  # noqa: F401
