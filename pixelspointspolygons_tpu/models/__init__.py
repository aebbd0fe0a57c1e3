from .fusion import EarlyFusionViTCNNEncoder, EarlyFusionViTEncoder
from .layers import adaptive_avg_pool1d
from .pointpillars import (
    PillarCanvas,
    PillarFeatureNet,
    PointPillarsDenseEncoder,
    PointPillarsViTEncoder,
)
from .vit import ViTBackbone, ViTCNNEncoder, ViTEncoder

__all__ = [
    "EarlyFusionViTCNNEncoder",
    "EarlyFusionViTEncoder",
    "adaptive_avg_pool1d",
    "PillarCanvas",
    "PillarFeatureNet",
    "PointPillarsDenseEncoder",
    "PointPillarsViTEncoder",
    "ViTBackbone",
    "ViTCNNEncoder",
    "ViTEncoder",
]
