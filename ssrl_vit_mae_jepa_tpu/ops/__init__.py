"""Device-side compute ops: patchify, token masking, fused augmentation,
and the Pallas attention kernel. These replace the reference's dependency on
lightly's torch utils (reference ``src/models/mae.py:6-8``) and torchvision's
host-side transforms (reference ``src/data.py:15-34``)."""

from ssrl_vit_mae_jepa_tpu.ops.patches import patchify, unpatchify  # noqa: F401
from ssrl_vit_mae_jepa_tpu.ops.masking import (  # noqa: F401
    random_token_mask,
    get_at_index,
    set_at_index,
    repeat_token,
)
