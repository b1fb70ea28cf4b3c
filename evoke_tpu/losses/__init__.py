from evoke_tpu.losses.lm import lm_loss
from evoke_tpu.losses.contrastive import (
    global_alignment_loss,
    local_token_alignment_loss,
    multi_positive_image_loss,
)
