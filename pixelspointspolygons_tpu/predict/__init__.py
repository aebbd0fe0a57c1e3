from .predictor import Predictor
from .predictor_pix2poly import (
    Pix2PolyPredictor,
    permutations_to_polygons,
    scores_to_permutations,
)

__all__ = [
    "Predictor",
    "Pix2PolyPredictor",
    "permutations_to_polygons",
    "scores_to_permutations",
]
