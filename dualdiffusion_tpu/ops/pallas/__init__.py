from .flash_attention import flash_attention
from .mss2d import mss2d_block_loss, mss2d_loss_fused

__all__ = ["flash_attention", "mss2d_block_loss", "mss2d_loss_fused"]
