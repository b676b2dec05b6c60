"""Model family: ViT backbone, MAE, classifier, JEPA."""

from ssrl_vit_mae_jepa_tpu.models.vit import VisionTransformer, vit_from_config  # noqa: F401
from ssrl_vit_mae_jepa_tpu.models.mae import (  # noqa: F401
    MAEDecoder,
    MaskedAutoencoder,
    mae_from_config,
)
from ssrl_vit_mae_jepa_tpu.models.classifier import (  # noqa: F401
    ClassificationHead,
    ViTClassifier,
    classifier_from_config,
)
